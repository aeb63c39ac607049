"""The full pipeline as one sharded, jitted step over a device mesh.

Combines every parallelism axis this workload has (SURVEY.md section 2.4):

- ``data``: independent streams (the reference's process-level concurrency);
- ``time``: the frame axis, with one-frame halos for tracking, a
  distributed prefix-product for rotation accumulation, and
  ``smooth_radius`` halos for SG smoothing (context parallelism);
- ``space``: the warp's output row-grid (tensor parallelism).

(The workload has no experts and its "pipeline stages" are the host
decode/device compute/host encode overlap, so EP/PP have no device-mesh
analogue here.)

This module is exercised by ``__graft_entry__.dryrun_multichip`` on a
virtual CPU mesh and is the blueprint for multi-chip deployment.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_annotator_tpu import so3
from video_annotator_tpu.camera import Camera
from video_annotator_tpu.ops.corners import detect_corners
from video_annotator_tpu.ops.lk import pyramidal_lk
from video_annotator_tpu.ops.ransac import estimate_rotation
from video_annotator_tpu.ops.warp_xla import bilinear_sample, compute_warp_map
from video_annotator_tpu.smoothing.savgol import savgol_weights
from video_annotator_tpu.parallel.temporal import _sg_conv


def build_pipeline_step(
    mesh: Mesh,
    in_camera: Camera,
    out_camera: Camera,
    smooth_radius: int = 2,
    max_corners: int = 32,
    num_hypotheses: int = 16,
):
    """Returns a jitted ``step(frames) -> warped`` over the mesh.

    ``frames``: (B, T, H, W) float32, B sharded over ``data``, T over
    ``time``; output rows additionally sharded over ``space``.
    """
    n_time = mesh.shape["time"]
    w_sg = jnp.asarray(savgol_weights(smooth_radius, 2))
    threshold = 8.0 / float(in_camera.fx)

    def _pairwise_delta(prev, curr, key):
        pts, valid = detect_corners(
            prev, max_corners=max_corners, min_distance=8, border=4
        )
        new_pts, status = pyramidal_lk(prev, curr, pts, valid, levels=2, iters=5)
        est = estimate_rotation(
            in_camera.unproject_unit(pts),
            in_camera.unproject_unit(new_pts),
            status,
            key,
            threshold_rad=threshold,
            num_hypotheses=num_hypotheses,
        )
        return est.rotation

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("data", "time", None, None), P(None, None)),
        out_specs=(P("data", "time", None, None), P("data", "time", None, None)),
    )
    def track_and_smooth(frames, key):  # (Bl, Tl, H, W)
        bl, tl = frames.shape[0], frames.shape[1]
        tidx = jax.lax.axis_index("time")
        bidx = jax.lax.axis_index("data")

        # --- tracking halo: last frame of the left neighbor ---------------
        last = frames[:, -1:]
        from_left = jax.lax.ppermute(
            last, "time", [(i, (i + 1) % n_time) for i in range(n_time)]
        )
        # Global first block: track frame 0 against itself (identity delta).
        from_left = jnp.where(tidx == 0, frames[:, :1], from_left)
        prev = jnp.concatenate([from_left, frames[:, :-1]], axis=1)

        # Per-frame RNG derived from GLOBAL (stream, frame) indices, so the
        # RANSAC hypothesis draw — and therefore the whole output — is
        # identical across mesh factorizations (the dryrun asserts sharded
        # == single-device oracle).
        gb = bidx * bl + jnp.arange(bl)
        gt = tidx * tl + jnp.arange(tl)
        keys = jax.vmap(
            lambda b: jax.vmap(
                lambda t: jax.random.fold_in(jax.random.fold_in(key[0], b), t)
            )(gt)
        )(gb)
        deltas = jax.vmap(jax.vmap(_pairwise_delta))(prev, frames, keys)

        # --- distributed prefix product over time -------------------------
        def combine(a, b):
            return so3.matmul(b, a)

        local = jax.lax.associative_scan(combine, deltas, axis=1)
        totals = jax.lax.all_gather(local[:, -1], "time")  # (n, Bl, 3, 3)
        prefix = jnp.broadcast_to(jnp.eye(3, dtype=frames.dtype), (bl, 3, 3))
        for i in range(n_time):
            prefix = jnp.where(i < tidx, so3.matmul(totals[i], prefix), prefix)
        acc = so3.matmul(local, prefix[:, None])  # (Bl, Tl, 3, 3)

        # --- SG smoothing with radius halos -------------------------------
        r = smooth_radius
        accf = acc.reshape(bl, tl, 9)
        right_halo = jax.lax.ppermute(
            accf[:, -r:], "time", [(i, (i + 1) % n_time) for i in range(n_time)]
        )
        left_halo = jax.lax.ppermute(
            accf[:, :r], "time", [(i, (i - 1) % n_time) for i in range(n_time)]
        )
        first_rep = jnp.broadcast_to(accf[:, :1], (bl, r, 9))
        last_rep = jnp.broadcast_to(accf[:, -1:], (bl, r, 9))
        left = jnp.where(tidx == 0, first_rep, right_halo)
        right = jnp.where(tidx == n_time - 1, last_rep, left_halo)
        ext = jnp.concatenate([left, accf, right], axis=1)
        smoothf = jax.vmap(lambda x: _sg_conv(x, w_sg))(ext)
        # SO(3) projection (SVD) happens outside the shard_map: its internal
        # while_loop trips shard_map's varying-axes tracking.
        return acc, smoothf.reshape(bl, tl, 3, 3)

    out_size = (out_camera.height, out_camera.width)

    def _warp_one(frame, rot):
        coords = compute_warp_map(out_camera, in_camera, rot, out_size)
        return bilinear_sample(frame, coords)

    @jax.jit
    def step(frames, key):
        frames = jax.lax.with_sharding_constraint(
            frames, NamedSharding(mesh, P("data", "time", None, None))
        )
        acc, smooth_raw = track_and_smooth(frames, key[None])
        smooth = so3.project(smooth_raw)
        # correction handed to the warp: R_meas . R_smooth^-1
        corrections = so3.matmul(acc, jnp.swapaxes(smooth, -1, -2))
        warped = jax.vmap(jax.vmap(_warp_one))(frames, corrections)
        # tensor-parallel output: rows of the warped grid over ``space``.
        return jax.lax.with_sharding_constraint(
            warped, NamedSharding(mesh, P("data", "time", "space", None))
        )

    return step

"""The vidstab-family stabilizer: 2D similarity trajectory.

Equivalent of the reference's vidstab pipeline (two-pass: ``vidstabdetect``
writes motion data, ``vidstabtransform`` applies smoothed transforms with
``optzoom: 0``, ``zoom: -buffer``, ``interpol: bicubic``, ``smoothing:
radius`` — ``src/render.ts:546-585``). Analysis tracks corners with LK and
fits robust per-frame similarities; encoding smooths the accumulated
(dx, dy, angle, log_scale) trajectory with the same SG kernel the rotation
family uses, and warps with the inverse correction.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from video_annotator_tpu.io.video import open_reader
from video_annotator_tpu.ops.affine import (
    compose_similarity,
    fit_similarity,
    invert_similarity,
    warp_similarity,
)
from video_annotator_tpu.ops.corners import detect_corners
from video_annotator_tpu.ops.lk import pyramidal_lk
from video_annotator_tpu.pipeline.profiler import StageProfiler
from video_annotator_tpu.pipeline.trajectory import Trajectory
from video_annotator_tpu.smoothing.savgol import savgol_weights


def analyse_similarity(
    source: str,
    options,  # RenderOptions
    profiler: Optional[StageProfiler] = None,
) -> Trajectory:
    """Track the accumulated 2D similarity trajectory (vidstabdetect)."""
    from video_annotator_tpu.pipeline.render import (
        KEY_FRAME_MAX_AGE,
        MAX_CORNERS,
        _frame_range,
    )

    prof = profiler or StageProfiler()
    reader = open_reader(source)
    meta = reader.meta
    res_scale = max(meta.width / 1920.0, 0.15)
    min_distance = max(6, int(round(30 * res_scale)))
    min_refresh = max(20, int(round(150 * res_scale)))
    min_inliers = max(10, int(round(40 * res_scale)))

    @jax.jit
    def track_step(prev_gray, gray, pts, valid, prev_params):
        new_pts, status = pyramidal_lk(prev_gray, gray, pts, valid)
        params, inliers = fit_similarity(pts, new_pts, status)
        params = jnp.where(inliers >= min_inliers, params, prev_params)
        return new_pts, status, params, inliers

    @jax.jit
    def detect_step(gray):
        return detect_corners(gray, max_corners=MAX_CORNERS, min_distance=min_distance)

    first, last = _frame_range(meta, options)
    acc = jnp.zeros(4)
    prev_params = jnp.zeros(4)
    out = []
    prev_gray = None
    pts = valid = None
    age = 0
    idx = -1
    for y, _, _ in prof.wrap_iter("decode", iter(reader)):
        idx += 1
        if idx < first:
            continue
        if idx >= last:
            break
        gray = jnp.asarray(y, jnp.float32)
        if prev_gray is None:
            with prof.stage("detect"):
                pts, valid = detect_step(gray)
            out.append(np.zeros(4))
        else:
            with prof.stage("track"):
                pts, valid, params, _ = track_step(
                    prev_gray, gray, pts, valid, prev_params
                )
                prev_params = params
                acc = compose_similarity(params, acc)
                out.append(np.asarray(acc, np.float64))
            age += 1
            if age > KEY_FRAME_MAX_AGE or int(jnp.sum(valid)) < min_refresh:
                with prof.stage("detect"):
                    pts, valid = detect_step(gray)
                age = 0
        prev_gray = gray
    reader.close()
    return Trajectory(
        params=np.asarray(out, np.float64),
        kind="similarity",
        fps=meta.fps,
        width=meta.width,
        height=meta.height,
        source=source,
    )


def similarity_corrections(traj: Trajectory, options) -> np.ndarray:
    """Per-frame sampling transforms (output px -> source px), (T, 4)."""
    t = traj.num_frames
    acc = jnp.asarray(traj.params, jnp.float32)  # (T, 4) accumulated
    if options.stabilise == "none":
        return np.zeros((t, 4), np.float32)
    if options.stabilise == "fixed":
        smooth = jnp.zeros_like(acc)
    else:
        radius = min(options.stabilise_radius, max(t - 1, 1))
        w = jnp.asarray(savgol_weights(radius, 2))
        padded = jnp.concatenate(
            [
                jnp.broadcast_to(acc[:1], (radius, 4)),
                acc,
                jnp.broadcast_to(acc[-1:], (radius, 4)),
            ],
            axis=0,
        )
        smooth = jax.lax.conv_general_dilated(
            padded.T[:, None, :], w[None, None, :], (1,), "VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32,
        )[:, 0, :].T
    # correction = acc o smooth^-1; the sampler needs its inverse:
    # sample(src) = (acc o smooth^-1)^-1 = smooth o acc^-1
    corr = jax.vmap(lambda a, s: compose_similarity(s, invert_similarity(a)))(
        acc, smooth
    )
    sample = jax.vmap(invert_similarity)(corr)
    # vidstabtransform's ``zoom: -stabiliseBuffer`` (src/render.ts:569-570):
    # zoom OUT by buffer percent around the frame centre while stabilising,
    # so corrections reveal borders instead of cropping content. Sampling
    # scale is the display scale's inverse.
    if options.stabilise_buffer:
        z = 1.0 - options.stabilise_buffer / 100.0
        k = 1.0 / max(z, 1e-3)
        cx = (traj.width - 1) / 2.0
        cy = (traj.height - 1) / 2.0
        zoom = jnp.asarray(
            [cx * (1.0 - k), cy * (1.0 - k), 0.0, float(np.log(k))],
            jnp.float32,
        )
        sample = jax.vmap(lambda p: compose_similarity(p, zoom))(sample)
    return np.asarray(sample)


def warp_frame_similarity(y, u, v, sample_params):
    """Warp YUV planes by a similarity sampling transform."""
    half = sample_params * jnp.asarray([0.5, 0.5, 1.0, 1.0])
    wy = warp_similarity(y, sample_params)
    wu = warp_similarity(u - 128.0, half) + 128.0
    wv = warp_similarity(v - 128.0, half) + 128.0
    return wy, wu, wv

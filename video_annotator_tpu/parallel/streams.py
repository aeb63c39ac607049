"""Data parallelism: a batch of independent streams across the mesh.

The reference gets throughput by running N ffmpeg processes over separate
clips (analyse queue 2 / encode queue 4, ``src/render.ts:21-22``; xargs -P
workers in ``concat.sh:197-251``). On TPU the same scaling is one sharded
program: frames batched over a ``data`` axis with per-stream rotations, and
XLA runs every stream's warp in parallel — BASELINE config #5 (8x 4K60
streams on a v5e-8) is this path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_annotator_tpu.camera import Camera
from video_annotator_tpu.ops.warp_xla import compute_warp_map, bilinear_sample


def warp_streams_sharded(
    frames: jax.Array,  # (B, H, W) float32, one frame per stream
    rotations: jax.Array,  # (B, 3, 3)
    out_camera: Camera,
    in_camera: Camera,
    mesh: Mesh,
    data_axis: str = "data",
    space_axis: str | None = "space",
    out_size=None,
) -> jax.Array:
    """Warp a batch of per-stream frames, sharded over streams (and
    optionally output rows). Collectives ride ICI; inputs only need to live
    on the devices that read them."""
    if out_size is None:
        out_size = (out_camera.height, out_camera.width)
    if space_axis is not None and out_size[0] % mesh.shape[space_axis]:
        # Output rows not divisible by the space axis (odd auto-fit
        # heights): pad the row grid up to a multiple, warp sharded, crop.
        # The extra rows unproject below the output image and sample
        # clamped/zero like any out-of-frame pixel — pure crop fodder —
        # so TP stays available for EVERY auto-fit camera instead of
        # silently degrading to stream-only sharding.
        ns = mesh.shape[space_axis]
        pad_h = -(-out_size[0] // ns) * ns
        padded = warp_streams_sharded(
            frames, rotations, out_camera, in_camera, mesh,
            data_axis, space_axis, out_size=(pad_h, out_size[1]),
        )
        return padded[:, : out_size[0]]

    def one(frame, rot):
        coords = compute_warp_map(out_camera, in_camera, rot, out_size)
        return bilinear_sample(frame, coords)

    fn = jax.vmap(one)
    in_spec = P(data_axis, None, None)
    rot_spec = P(data_axis, None, None)
    out_spec = (
        P(data_axis, space_axis, None) if space_axis else P(data_axis, None, None)
    )
    jitted = jax.jit(
        fn,
        in_shardings=(NamedSharding(mesh, in_spec), NamedSharding(mesh, rot_spec)),
        out_shardings=NamedSharding(mesh, out_spec),
    )
    return jitted(frames, rotations)


def warp_streams_pallas_sharded(
    frames: jax.Array,  # (B, H, W) uint8/float, one or more frames per stream
    rotations: jax.Array,  # (B, 3, 3)
    plan,
    out_camera: Camera,
    in_camera: Camera,
    mesh: Mesh,
    data_axis: str = "data",
    interpret: bool | None = None,
) -> jax.Array:
    """Stream-parallel warp running the FUSED PALLAS KERNEL per device.

    The production multi-chip encode path: each device holds whole frames
    of its streams (no spatial partitioning), so the single-chip kernel —
    schedule walk, windows, packed gathers — runs unchanged inside a
    ``shard_map`` shard; scaling over a v5e-8 is embarrassingly parallel
    with zero collectives. ``interpret`` defaults to True on CPU (tests /
    the virtual mesh) and False on TPU.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    from video_annotator_tpu.ops.warp_pallas import (
        _camera_from_key_np,
        _camera_key,
        warp_frames_pallas,
    )

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b = frames.shape[0]
    nd = mesh.shape[data_axis]
    assert b % nd == 0, (b, nd)
    # Snapshot the cameras to numpy-leaf statics: shard_map lifts
    # closed-over jax ARRAYS into tracers, and the kernel builder needs
    # trace-time constants (intrinsics are fixed for a clip anyway).
    out_static = _camera_from_key_np(_camera_key(out_camera))
    in_static = _camera_from_key_np(_camera_key(in_camera))

    def local(fr, ro):
        return warp_frames_pallas(
            fr, ro, plan, out_static, in_static, interpret=interpret,
        )

    # pallas_call declares no varying-mesh-axis info on its outputs;
    # replication checking has nothing to verify for pure DP anyway.
    # (kwarg renamed check_rep -> check_vma across jax versions)
    import inspect

    flag = (
        "check_vma"
        if "check_vma" in inspect.signature(shard_map).parameters
        else "check_rep"
    )
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(data_axis, None, None), P(data_axis, None, None)),
        out_specs=P(data_axis, None, None),
        **{flag: False},
    )
    return jax.jit(fn)(frames, rotations)


def warp_yuv_streams_sharded(
    warp_batch,
    ys: jax.Array,  # (B, H, W) luma, one frame per stream
    us: jax.Array,  # (B, H/2, W/2)
    vs: jax.Array,  # (B, H/2, W/2)
    params: jax.Array,  # (B, ...) per-stream warp parameters
    mesh: Mesh,
    data_axis: str = "data",
):
    """Stream-parallel (DP) warp for ANY per-batch YUV warp function —
    the 2D stabilizer families' multi-chip encode path.

    The rotation family has its own sharded entry
    (:func:`warp_streams_pallas_sharded`); the similarity/vidstab and
    deshake families (``models/similarity.py``, ``models/deshake.py`` —
    the reference's ``--filter vidstab``/``deshake`` pipelines,
    ``src/render.ts:913-989``) warp with a (B, ...) parameter vector
    instead of a rotation matrix, so this generic wrapper runs their
    batched warp unchanged inside a ``shard_map`` DP shard. Per-stream
    math is independent — zero collectives, and the sharded output is
    bit-identical to the unsharded call per stream
    (``tests/test_parallel.py::test_warp_yuv_streams_sharded_*``).

    ``warp_batch(ys, us, vs, params) -> (wy, wu, wv)`` must accept the
    local (B/n, ...) shard arrays — e.g. ``jax.vmap`` of
    ``warp_frame_similarity`` / ``warp_frame_deshake``, or
    ``SimilarityWarper.warp_yuv_batch`` for the fused Pallas kernel.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    nd = mesh.shape[data_axis]
    assert ys.shape[0] % nd == 0, (ys.shape, nd)
    p_spec = P(data_axis, *([None] * (params.ndim - 1)))
    plane = P(data_axis, None, None)

    import inspect

    flag = (
        "check_vma"
        if "check_vma" in inspect.signature(shard_map).parameters
        else "check_rep"
    )
    fn = shard_map(
        warp_batch,
        mesh=mesh,
        in_specs=(plane, plane, plane, p_spec),
        out_specs=(plane, plane, plane),
        **{flag: False},
    )
    return jax.jit(fn)(ys, us, vs, params)


def warp_frame_pallas_spatial(
    frame: jax.Array,  # (H, W) one frame, replicated to every device
    rotation: jax.Array,  # (3, 3)
    plan,
    out_camera: Camera,
    in_camera: Camera,
    mesh: Mesh,
    space_axis: str = "space",
    interpret: bool | None = None,
) -> jax.Array:
    """Spatial (TP) warp: each device computes a horizontal band of the
    output with the FUSED PALLAS KERNEL (SURVEY.md section 2.4's "shard
    the output-pixel grid of the warp kernel across devices").

    Gather-based warps read arbitrary input rows, so the input frame is
    replicated (cheap vs the output win: latency drops by the shard
    count); each shard runs the same executable with a dynamic tile-row
    offset. Zero collectives — the band outputs concatenate along rows.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    from video_annotator_tpu.ops.warp_pallas import (
        TILE_H,
        _camera_from_key,
        _camera_key,
        warp_frame_band_pallas,
    )

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    nshards = mesh.shape[space_axis]
    ny = plan.grid[0]
    ny_band = -(-ny // nshards)  # ceil; overflow tiles clamp in-kernel
    out_static = _camera_from_key(_camera_key(out_camera))
    in_static = _camera_from_key(_camera_key(in_camera))

    def local(fr, ro):
        off = jax.lax.axis_index(space_axis).astype(jnp.int32) * ny_band
        return warp_frame_band_pallas(
            fr, ro, plan, out_static, in_static, nshards, off,
            interpret=interpret,
        )

    import inspect

    flag = (
        "check_vma"
        if "check_vma" in inspect.signature(shard_map).parameters
        else "check_rep"
    )
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(space_axis, None),
        **{flag: False},
    )
    full = jax.jit(fn)(frame, rotation)
    return full[: plan.crop_h]

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
        # heights): shard over streams only rather than erroring.
        space_axis = None

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

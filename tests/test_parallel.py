"""Multi-device sharding paths on the virtual 8-device CPU mesh.

Each sharded collective pattern must be numerically identical (or equal
within float tolerance) to its single-device counterpart — the sharding
is an execution detail, never a semantics change.
"""

import numpy as np

import jax
import jax.numpy as jnp

from video_annotator_tpu import so3
from video_annotator_tpu.camera import (
    CameraPreset,
    get_output_camera,
    get_preset_camera,
)
from video_annotator_tpu.parallel.mesh import make_mesh
from video_annotator_tpu.parallel.streams import warp_streams_sharded
from video_annotator_tpu.parallel.temporal import (
    distributed_accumulate_rotations,
    smooth_rotations_sharded,
)
from video_annotator_tpu.smoothing.savgol import smooth_rotations


def _random_rotations(t, scale=0.05, seed=0):
    rng = np.random.default_rng(seed)
    return so3.exp(jnp.asarray(rng.normal(size=(t, 3)) * scale, jnp.float32))


def test_make_mesh_factors_devices():
    mesh = make_mesh()
    assert int(np.prod(list(mesh.shape.values()))) == len(jax.devices())
    mesh2 = make_mesh(4, axis_names=("time",))
    assert mesh2.shape["time"] == 4


def test_sharded_smoothing_matches_global():
    mesh = make_mesh(4, axis_names=("time",))
    t, radius = 64, 8  # 16 frames/shard >= radius
    rots = _random_rotations(t)
    got = np.asarray(smooth_rotations_sharded(rots, radius, mesh))
    want = np.asarray(smooth_rotations(rots, radius))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sharded_smoothing_single_shard_degenerate():
    mesh = make_mesh(1, axis_names=("time",))
    rots = _random_rotations(32, seed=2)
    got = np.asarray(smooth_rotations_sharded(rots, 6, mesh))
    want = np.asarray(smooth_rotations(rots, 6))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_distributed_prefix_product_matches_sequential():
    mesh = make_mesh(8, axis_names=("time",))
    t = 64
    deltas = _random_rotations(t, seed=3)
    got = np.asarray(distributed_accumulate_rotations(deltas, mesh))
    acc = np.eye(3, dtype=np.float32)
    want = []
    for i in range(t):
        acc = np.asarray(deltas[i]) @ acc
        want.append(acc.copy())
    np.testing.assert_allclose(got, np.stack(want), atol=1e-4)


def test_warp_streams_sharded_matches_single():
    in_cam = get_preset_camera(CameraPreset.GOPRO_H4B_WIDE43_MEASURED, (128, 96))
    out_cam = get_output_camera(in_cam, scale=1.0, crop_borders=True)
    mesh = make_mesh(8, axis_names=("data", "space"))
    rng = np.random.default_rng(5)
    frames = jnp.asarray(rng.uniform(0, 255, (8, 96, 128)).astype(np.float32))
    rots = _random_rotations(8, seed=6)
    from video_annotator_tpu.ops.warp_xla import (
        bilinear_sample,
        compute_warp_map,
    )

    # Odd heights pad the row grid to the space axis and crop back
    # (VERDICT r1 item 8) — (41, 64) exercises that; (40, 64) is the
    # aligned 2D (data, space) sharding; None is the auto-fit camera.
    for out_size in (None, (40, 64), (41, 64)):
        size = out_size or (out_cam.height, out_cam.width)
        out = warp_streams_sharded(
            frames, rots, out_cam, in_cam, mesh, out_size=out_size
        )
        for b in range(8):
            coords = compute_warp_map(out_cam, in_cam, rots[b], size)
            want = np.asarray(bilinear_sample(frames[b], coords))
            # map math runs at a different matmul precision under pjit;
            # coords differing by ~1e-4 px move bilinear values by ~2e-2
            np.testing.assert_allclose(np.asarray(out[b]), want, atol=5e-2)


def test_warp_frame_pallas_spatial_matches_unsharded():
    """TP: horizontal output bands across devices, same fused kernel.
    The sharded result must equal the single-device warp exactly."""
    from video_annotator_tpu.ops.warp_pallas import plan_warp, warp_frame_pallas
    from video_annotator_tpu.parallel.streams import warp_frame_pallas_spatial

    in_cam = get_preset_camera(CameraPreset.GOPRO_H4B_WIDE43_MEASURED, (320, 240))
    out_cam = get_output_camera(in_cam, scale=1.0, crop_borders=True)
    plan = plan_warp(out_cam, in_cam, max_correction_deg=6.0)
    ny = plan.grid[0]
    nshards = 2 if ny % 2 == 0 else 1
    mesh = make_mesh(nshards, axis_names=("space",))

    rng = np.random.default_rng(11)
    frame = jnp.asarray(np.round(rng.uniform(0, 255, (240, 320))).astype(np.float32))
    rot = so3.exp(jnp.array([0.02, -0.015, 0.03]))

    got = warp_frame_pallas_spatial(
        frame, rot, plan, out_cam, in_cam, mesh
    )
    want = warp_frame_pallas(frame, rot, plan, out_cam, in_cam, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_warp_streams_pallas_sharded_matches_unsharded():
    """The fused Pallas kernel inside a shard_map DP shard (the
    production multi-chip encode path) equals the single-device batch."""
    from video_annotator_tpu.ops.warp_pallas import plan_warp, warp_frames_pallas
    from video_annotator_tpu.parallel.streams import warp_streams_pallas_sharded

    in_cam = get_preset_camera(CameraPreset.GOPRO_H4B_WIDE43_MEASURED, (128, 96))
    out_cam = get_output_camera(in_cam, scale=1.0, crop_borders=True)
    plan = plan_warp(out_cam, in_cam, max_correction_deg=6.0)
    mesh = make_mesh(4, axis_names=("data",))
    rng = np.random.default_rng(7)
    frames = jnp.asarray(
        np.round(rng.uniform(0, 255, (4, 96, 128))).astype(np.float32)
    )
    rots = _random_rotations(4, seed=8)

    out = warp_streams_pallas_sharded(
        frames, rots, plan, out_cam, in_cam, mesh
    )
    want = warp_frames_pallas(frames, rots, plan, out_cam, in_cam,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-4)

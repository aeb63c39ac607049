"""Pallas warp kernel (interpret mode) vs the XLA oracle.

The kernel implements exact 2x2 bilinear sampling, so it must match
``warp_image_xla`` to float rounding — far tighter than the 45 dB PSNR gate.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from video_annotator_tpu import so3
from video_annotator_tpu.camera import (
    CameraPreset,
    get_output_camera,
    get_preset_camera,
)
from video_annotator_tpu.ops.warp_pallas import plan_warp, warp_frame_pallas
from video_annotator_tpu.ops.warp_xla import warp_image_xla


@pytest.mark.parametrize("crop_borders", [True, False])
def test_pallas_matches_xla_oracle(crop_borders):
    in_cam = get_preset_camera(CameraPreset.GOPRO_H4B_WIDE43_MEASURED, (320, 240))
    out_cam = get_output_camera(in_cam, scale=1.0, crop_borders=crop_borders)
    plan = plan_warp(out_cam, in_cam, max_correction_deg=6.0)

    rng = np.random.default_rng(0)
    img = np.round(rng.uniform(0, 255, size=(240, 320))).astype(np.float32)
    rot = so3.exp(jnp.array([0.03, -0.02, 0.04]))

    ours = np.asarray(
        warp_frame_pallas(jnp.asarray(img), rot, plan, out_cam, in_cam, interpret=True)
    )
    ref = np.asarray(warp_image_xla(jnp.asarray(img), out_cam, in_cam, rot))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=0.05)


def test_pallas_rotation_extremes_within_plan():
    """Rotations up to the planned correction bound stay artifact-free."""
    in_cam = get_preset_camera(CameraPreset.GOPRO_H4B_WIDE43_MEASURED, (320, 240))
    out_cam = get_output_camera(in_cam, scale=1.0, crop_borders=True)
    plan = plan_warp(out_cam, in_cam, max_correction_deg=5.0)
    rng = np.random.default_rng(1)
    img = np.round(rng.uniform(0, 255, size=(240, 320))).astype(np.float32)
    for w in ([0.08, 0, 0], [0, -0.08, 0], [0, 0, 0.08]):
        rot = so3.exp(jnp.asarray(w, jnp.float32))
        ours = np.asarray(
            warp_frame_pallas(jnp.asarray(img), rot, plan, out_cam, in_cam, interpret=True)
        )
        ref = np.asarray(warp_image_xla(jnp.asarray(img), out_cam, in_cam, rot))
        np.testing.assert_allclose(ours, ref, atol=0.05)


def test_batched_matches_single():
    from video_annotator_tpu.ops.warp_pallas import warp_frames_pallas

    in_cam = get_preset_camera(CameraPreset.GOPRO_H4B_WIDE43_MEASURED, (320, 240))
    out_cam = get_output_camera(in_cam, scale=1.0, crop_borders=True)
    plan = plan_warp(out_cam, in_cam, max_correction_deg=6.0)
    rng = np.random.default_rng(3)
    frames = jnp.asarray(
        np.round(rng.uniform(0, 255, (2, 240, 320))).astype(np.float32)
    )
    rots = so3.exp(jnp.asarray(rng.normal(size=(2, 3)) * 0.02, jnp.float32))
    batch = np.asarray(
        warp_frames_pallas(frames, rots, plan, out_cam, in_cam, interpret=True)
    )
    for t in range(2):
        single = np.asarray(
            warp_frame_pallas(frames[t], rots[t], plan, out_cam, in_cam,
                              interpret=True)
        )
        np.testing.assert_allclose(batch[t], single, atol=1e-4)


def test_chroma_border_fill_preserves_sub_neutral_values():
    """Chroma planes warp raw with border=128: values below neutral must
    survive (regression: the packed path clipped u-128 at 0, wiping all
    chroma < 128), and fully-outside pixels must come out neutral."""
    in_cam = get_preset_camera(CameraPreset.GOPRO_H4B_WIDE43_MEASURED, (320, 240))
    # Uncropped output so the frame contains out-of-image regions.
    out_cam = get_output_camera(in_cam, scale=1.0, crop_borders=False)
    plan = plan_warp(out_cam, in_cam, max_correction_deg=6.0)
    u = np.full((240, 320), 60.0, np.float32)  # strongly sub-neutral chroma
    rot = so3.exp(jnp.array([0.03, -0.02, 0.04]))
    ours = np.asarray(
        warp_frame_pallas(
            jnp.asarray(u), rot, plan, out_cam, in_cam, interpret=True,
            border=128.0,
        )
    )
    ref = np.asarray(
        warp_image_xla(jnp.asarray(u) - 128.0, out_cam, in_cam, rot)
    ) + 128.0
    # Fully-inside pixels (oracle == 60 exactly) must carry the
    # sub-neutral value through exactly.
    inside = ref == 60.0
    assert inside.mean() > 0.3
    np.testing.assert_allclose(ours[inside], 60.0, atol=0.05)
    # Whole frame matches the centered XLA oracle except the <=1 px
    # top/left edge blend (taps beyond the clamped window fill with 0
    # instead of neutral).
    diff = np.abs(ours - ref)
    # (the boundary band is a few pixels wide; at 320x240 that is ~1-2%
    # of the frame — real configs are 6-12x larger)
    assert np.mean(diff > 0.6) < 0.02, np.mean(diff > 0.6)
    assert ours.max() <= 128.0 + 0.05


def test_planes_variant_matches_single():
    from video_annotator_tpu.ops.warp_pallas import warp_planes_pallas

    in_cam = get_preset_camera(CameraPreset.GOPRO_H4B_WIDE43_MEASURED, (320, 240))
    out_cam = get_output_camera(in_cam, scale=1.0, crop_borders=True)
    plan = plan_warp(out_cam, in_cam, max_correction_deg=6.0)
    rng = np.random.default_rng(3)
    planes = np.round(rng.uniform(0, 255, size=(2, 240, 320))).astype(np.float32)
    rot = so3.exp(jnp.array([0.02, -0.03, 0.01]))
    wu, wv = warp_planes_pallas(
        (jnp.asarray(planes[0]), jnp.asarray(planes[1])), rot, plan,
        out_cam, in_cam, interpret=True, border=128.0,
    )
    for got, plane in ((wu, planes[0]), (wv, planes[1])):
        ref = np.asarray(
            warp_frame_pallas(
                jnp.asarray(plane), rot, plan, out_cam, in_cam,
                interpret=True, border=128.0,
            )
        )
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_warp_yuv_fused_matches_components():
    """The single-dispatch YUV path equals the per-plane paths + rounding."""
    from video_annotator_tpu.ops.warp_pallas import (
        warp_planes_pallas,
        warp_yuv_pallas,
    )
    from video_annotator_tpu.ops.warp_xla import _scaled_camera

    in_cam = get_preset_camera(CameraPreset.GOPRO_H4B_WIDE43_MEASURED, (320, 240))
    out_cam = get_output_camera(in_cam, scale=1.0, crop_borders=True)
    out_w = out_cam.width - out_cam.width % 2
    out_h = out_cam.height - out_cam.height % 2
    in_half = _scaled_camera(in_cam, 0.5)
    out_half = _scaled_camera(out_cam, 0.5)
    plan_y = plan_warp(out_cam, in_cam, 6.0, (out_h, out_w))
    plan_c = plan_warp(out_half, in_half, 6.0, (out_h // 2, out_w // 2))

    rng = np.random.default_rng(11)
    y = rng.integers(0, 255, (240, 320), dtype=np.uint8)
    u = rng.integers(0, 255, (120, 160), dtype=np.uint8)
    v = rng.integers(0, 255, (120, 160), dtype=np.uint8)
    rot = so3.exp(jnp.array([0.02, -0.03, 0.01]))

    wy, wu, wv = warp_yuv_pallas(
        jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), rot,
        plan_y, out_cam, in_cam, plan_c, out_half, in_half, interpret=True,
    )
    assert wy.dtype == jnp.uint8 and wu.dtype == jnp.uint8
    assert wy.shape == (out_h, out_w)
    assert wu.shape == (out_h // 2, out_w // 2)

    ref_y = warp_frame_pallas(
        jnp.asarray(y), rot, plan_y, out_cam, in_cam, interpret=True
    )
    ref_u, ref_v = warp_planes_pallas(
        (jnp.asarray(u), jnp.asarray(v)), rot, plan_c, out_half, in_half,
        interpret=True, border=128.0,
    )
    for got, ref in ((wy, ref_y), (wu, ref_u), (wv, ref_v)):
        expect = np.round(np.asarray(ref)).astype(np.uint8)
        # float rounding at exact .5 boundaries may differ by 1
        diff = np.abs(np.asarray(got).astype(np.int32) - expect.astype(np.int32))
        assert diff.max() <= 1, diff.max()
        assert (diff > 0).mean() < 0.01


def test_warp_yuv_batch_matches_single():
    from video_annotator_tpu.ops.warp_pallas import (
        warp_yuv_batch_pallas,
        warp_yuv_pallas,
    )
    from video_annotator_tpu.ops.warp_xla import _scaled_camera

    in_cam = get_preset_camera(CameraPreset.GOPRO_H4B_WIDE43_MEASURED, (320, 240))
    out_cam = get_output_camera(in_cam, scale=1.0, crop_borders=True)
    out_w = out_cam.width - out_cam.width % 2
    out_h = out_cam.height - out_cam.height % 2
    in_half = _scaled_camera(in_cam, 0.5)
    out_half = _scaled_camera(out_cam, 0.5)
    plan_y = plan_warp(out_cam, in_cam, 6.0, (out_h, out_w))
    plan_c = plan_warp(out_half, in_half, 6.0, (out_h // 2, out_w // 2))

    rng = np.random.default_rng(5)
    T = 3
    ys = [jnp.asarray(rng.integers(0, 255, (240, 320), dtype=np.uint8)) for _ in range(T)]
    us = [jnp.asarray(rng.integers(0, 255, (120, 160), dtype=np.uint8)) for _ in range(T)]
    vs = [jnp.asarray(rng.integers(0, 255, (120, 160), dtype=np.uint8)) for _ in range(T)]
    rots = jnp.stack([so3.exp(jnp.asarray(x, jnp.float32))
                      for x in rng.normal(size=(T, 3)) * 0.02])

    batch = warp_yuv_batch_pallas(
        ys, us, vs, rots, plan_y, out_cam, in_cam, plan_c, out_half, in_half,
        interpret=True,
    )
    assert len(batch) == T
    for i in range(T):
        single = warp_yuv_pallas(
            ys[i], us[i], vs[i], rots[i], plan_y, out_cam, in_cam,
            plan_c, out_half, in_half, interpret=True,
        )
        for got, ref in zip(batch[i], single):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

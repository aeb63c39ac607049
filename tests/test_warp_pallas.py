"""Pallas warp kernel (interpret mode) vs the XLA oracle.

The kernel implements exact 2x2 bilinear sampling, so it must match
``warp_image_xla`` to float rounding — far tighter than the 45 dB PSNR gate.
"""

import dataclasses

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


@pytest.mark.parametrize(
    "out_model",
    ["fisheye", "equirect", "stereographic", "mercator", "hammer", "ball"],
)
def test_pallas_nonrect_output_matches_oracle(out_model):
    """Non-rectilinear OUTPUT projections (--projection with any of the
    v360 family names) run through the precomputed-ray-grid kernel path
    and must match the XLA oracle like the inlined rectilinear path does."""
    from video_annotator_tpu.camera import CameraModel, camera_from_dfov

    in_cam = get_preset_camera(CameraPreset.GOPRO_H4B_WIDE43_MEASURED, (320, 240))
    model = CameraModel(out_model)
    out_cam = camera_from_dfov(110.0, (256, 192), model)
    plan = plan_warp(out_cam, in_cam, max_correction_deg=6.0)

    rng = np.random.default_rng(2)
    img = np.round(rng.uniform(0, 255, size=(240, 320))).astype(np.float32)
    rot = so3.exp(jnp.array([0.03, -0.02, 0.04]))

    ours = np.asarray(
        warp_frame_pallas(jnp.asarray(img), rot, plan, out_cam, in_cam,
                          interpret=True)
    )
    ref = np.asarray(warp_image_xla(jnp.asarray(img), out_cam, in_cam, rot))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=0.06)


def test_pallas_nonrect_yuv_batch_matches_single():
    from video_annotator_tpu.camera import CameraModel, camera_from_dfov
    from video_annotator_tpu.ops.warp_pallas import (
        warp_yuv_batch_pallas,
        warp_yuv_pallas,
    )
    from video_annotator_tpu.ops.warp_xla import _scaled_camera

    in_cam = get_preset_camera(CameraPreset.GOPRO_H4B_WIDE43_MEASURED, (192, 144))
    out_cam = camera_from_dfov(100.0, (160, 120), CameraModel.FISHEYE)
    in_h = _scaled_camera(in_cam, 0.5)
    out_h = _scaled_camera(out_cam, 0.5)
    plan_y = plan_warp(out_cam, in_cam, 6.0, (120, 160))
    plan_c = plan_warp(out_h, in_h, 6.0, (60, 80))

    rng = np.random.default_rng(3)
    mk = lambda h, w: jnp.asarray(  # noqa: E731
        rng.integers(0, 255, (h, w), dtype=np.uint8)
    )
    ys = [mk(144, 192) for _ in range(2)]
    us = [mk(72, 96) for _ in range(2)]
    vs = [mk(72, 96) for _ in range(2)]
    rots = so3.exp(jnp.asarray(rng.normal(size=(2, 3)) * 0.02, jnp.float32))

    batch = warp_yuv_batch_pallas(ys, us, vs, rots, plan_y, out_cam, in_cam,
                                  plan_c, out_h, in_h, interpret=True)
    for i in range(2):
        single = warp_yuv_pallas(ys[i], us[i], vs[i], rots[i], plan_y,
                                 out_cam, in_cam, plan_c, out_h, in_h,
                                 interpret=True)
        for a, b in zip(batch[i], single):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


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


def test_batched_chunks_match_unchunked():
    """SMEM chunking (max_t) must be invisible in the result: a 3-frame
    batch forced through 2-frame dispatches equals the single-dispatch
    batch (the 4K cap is ~10 frames of tile metadata per 1 MB SMEM)."""
    from video_annotator_tpu.ops.warp_pallas import warp_frames_pallas

    in_cam = get_preset_camera(CameraPreset.GOPRO_H4B_WIDE43_MEASURED, (320, 240))
    out_cam = get_output_camera(in_cam, scale=1.0, crop_borders=True)
    plan = plan_warp(out_cam, in_cam, max_correction_deg=6.0)
    rng = np.random.default_rng(5)
    frames = jnp.asarray(
        np.round(rng.uniform(0, 255, (3, 240, 320))).astype(np.float32)
    )
    rots = so3.exp(jnp.asarray(rng.normal(size=(3, 3)) * 0.02, jnp.float32))
    whole = np.asarray(
        warp_frames_pallas(frames, rots, plan, out_cam, in_cam, interpret=True)
    )
    chunked = np.asarray(
        warp_frames_pallas(frames, rots, plan, out_cam, in_cam, interpret=True,
                           max_t=2)
    )
    np.testing.assert_allclose(chunked, whole, atol=1e-5)


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
    # Whole frame matches the centered XLA oracle, INCLUDING the partial
    # -tap border band: the kernel's border-weight deficit blends
    # out-of-window taps toward neutral 128, exactly like the oracle's
    # centered sampling (regression: they used to blend toward 0,
    # leaving a green fringe at warp edges).
    diff = np.abs(ours - ref)
    assert diff.max() <= 0.6, diff.max()
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


def test_box_downsample_and_mip_camera():
    from video_annotator_tpu.ops.warp_pallas import box_downsample, mip_camera
    from video_annotator_tpu.ops.warp_xla import _scaled_camera

    img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    d = np.asarray(box_downsample(img, 1))
    # rows: [0 1 2 3; 4 5 6 7; 8 9 10 11]; odd height edge-replicates row 2.
    np.testing.assert_allclose(d, [[2.5, 4.5], [8.5, 10.5]])
    assert np.asarray(box_downsample(img, 0)) is not None
    assert box_downsample(img, 0).shape == (3, 4)

    cam = get_preset_camera(CameraPreset.GOPRO_H4B_WIDE43_MEASURED, (320, 240))
    m1 = mip_camera(cam, 1)
    s1 = _scaled_camera(cam, 0.5)
    for f in ("fx", "fy", "cx", "cy"):
        np.testing.assert_allclose(float(getattr(m1, f)), float(getattr(s1, f)))
    assert (m1.width, m1.height) == (160, 120)
    # Two levels compose: scale factors multiply, dims ceil-halve twice.
    m2 = mip_camera(cam, 2)
    np.testing.assert_allclose(float(m2.fx), float(cam.fx) * 0.25)
    assert (m2.width, m2.height) == (80, 60)


def test_mip_prefilter_level_selection():
    from video_annotator_tpu.ops.warp_pallas import mip_prefilter_level
    from video_annotator_tpu.camera import Camera, CameraModel

    in_cam = get_preset_camera(
        CameraPreset.GOPRO_H4B_WIDE43_MEASURED, (1280, 960)
    )
    # Same-scale output: no pixel minifies 2x -> level 0.
    out_full = get_output_camera(in_cam, scale=1.0, crop_borders=True)
    assert mip_prefilter_level(
        out_full, in_cam, (out_full.height, out_full.width)
    ) == 0
    # Quarter-res output: every pixel minifies >= 2x -> level >= 1.
    out_q = get_output_camera(in_cam, scale=0.25, crop_borders=True)
    lvl = mip_prefilter_level(
        out_q, in_cam, (out_q.height, out_q.width)
    )
    assert lvl >= 1


def test_warp_yuv_mip_matches_manual_downsample():
    """mip=1 inside the dispatch == explicit downsample + mip=0 dispatch."""
    from video_annotator_tpu.ops.warp_pallas import (
        box_downsample,
        mip_camera,
        warp_yuv_pallas,
    )
    from video_annotator_tpu.ops.warp_xla import _scaled_camera

    in_cam = get_preset_camera(CameraPreset.GOPRO_H4B_WIDE43_MEASURED, (320, 240))
    out_cam = get_output_camera(in_cam, scale=0.4, crop_borders=True)
    out_w = out_cam.width - out_cam.width % 2
    out_h = out_cam.height - out_cam.height % 2
    in_eff = mip_camera(in_cam, 1)
    in_half = _scaled_camera(in_eff, 0.5)
    out_half = _scaled_camera(out_cam, 0.5)
    plan_y = plan_warp(out_cam, in_eff, 6.0, (out_h, out_w))
    plan_c = plan_warp(out_half, in_half, 6.0, (out_h // 2, out_w // 2))

    rng = np.random.default_rng(3)
    y = jnp.asarray(rng.integers(0, 255, (240, 320), dtype=np.uint8))
    u = jnp.asarray(rng.integers(0, 255, (120, 160), dtype=np.uint8))
    v = jnp.asarray(rng.integers(0, 255, (120, 160), dtype=np.uint8))
    rot = so3.exp(jnp.array([0.01, -0.02, 0.03]))

    got = warp_yuv_pallas(
        y, u, v, rot, plan_y, out_cam, in_eff, plan_c, out_half, in_half,
        interpret=True, mip=1,
    )
    want = warp_yuv_pallas(
        box_downsample(y, 1), box_downsample(u, 1), box_downsample(v, 1),
        rot, plan_y, out_cam, in_eff, plan_c, out_half, in_half,
        interpret=True, mip=0,
    )
    for g, w_ in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w_))


def test_per_tile_mip_with_nonrect_output():
    """--prefilter with a non-rect output (ray-grid kernel path): minifying
    fisheye-out render still matches the unfiltered oracle on smooth
    content (the per-tile levels compose with the ray grid)."""
    from video_annotator_tpu.camera import CameraModel, camera_from_dfov

    in_cam = get_preset_camera(CameraPreset.GOPRO_H4B_WIDE43_MEASURED, (512, 384))
    out_cam = camera_from_dfov(100.0, (128, 96), CameraModel.FISHEYE)
    plan = plan_warp(out_cam, in_cam, 4.0, mip_levels=2)
    assert plan.mip_max >= 1  # heavy minification: levels actually engage

    yy, xx = np.mgrid[0:384, 0:512].astype(np.float32)
    img = 128 + 60 * np.sin(xx / 60.0) * np.cos(yy / 60.0)
    rot = so3.exp(jnp.array([0.01, -0.01, 0.02]))
    ours = np.asarray(
        warp_frame_pallas(jnp.asarray(img), rot, plan, out_cam, in_cam,
                          interpret=True)
    )
    ref = np.asarray(warp_image_xla(jnp.asarray(img), out_cam, in_cam, rot))
    # Smooth content: box prefilter changes values by << 1 grey level.
    valid = ref > 1.0
    assert np.abs(ours - ref)[valid].max() < 2.0


def test_frame_warper_prefilter_cpu_path():
    """CPU/XLA fallback honours prefilter; smooth content stays faithful."""
    from video_annotator_tpu.pipeline.render import FrameWarper

    in_cam = get_preset_camera(CameraPreset.GOPRO_H4B_WIDE43_MEASURED, (640, 480))
    out_cam = get_output_camera(in_cam, scale=0.25, crop_borders=True)
    yy, xx = np.mgrid[0:480, 0:640].astype(np.float32)
    y = 128 + 60 * np.sin(xx / 40.0) * np.cos(yy / 40.0)
    u = np.full((240, 320), 90, np.float32)
    v = np.full((240, 320), 160, np.float32)
    rot = so3.exp(jnp.array([0.01, 0.0, -0.01]))

    plain = FrameWarper(in_cam, out_cam, 6.0)
    pre = FrameWarper(in_cam, out_cam, 6.0, prefilter=True)
    assert plain.mip == 0
    assert pre.mip >= 1

    wy0, _, _ = plain(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), rot)
    wy1, wu1, wv1 = pre(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v), rot)
    assert wy1.shape == wy0.shape
    a, b = np.asarray(wy0), np.asarray(wy1)
    mask = (a > 1) & (b > 1)  # compare interior (borders identical anyway)
    mse = float(np.mean((a[mask] - b[mask]) ** 2))
    psnr = 10 * np.log10(255.0**2 / max(mse, 1e-9))
    # The prefilter is a real low-pass (mip level 1 here), so bit-exact
    # agreement is impossible by design; on smooth content it must still
    # meet the repo-wide 45 dB fidelity standard (measured: 47.4 dB).
    assert psnr > 45.0, psnr
    # Constant chroma must stay constant under the prefilter (borders fill
    # with neutral 128, so test the majority interior).
    assert np.median(np.abs(np.asarray(wu1) - 90)) < 1.5
    assert np.median(np.abs(np.asarray(wv1) - 160)) < 1.5


def test_trip_rows_4_matches_8():
    """Schedule trip granularity is a pure perf knob: outputs identical."""
    in_cam = get_preset_camera(CameraPreset.GOPRO_H4B_WIDE43_MEASURED, (320, 240))
    out_cam = get_output_camera(in_cam, scale=1.0, crop_borders=False)
    rng = np.random.default_rng(9)
    img = np.round(rng.uniform(0, 255, size=(240, 320))).astype(np.float32)
    rot = so3.exp(jnp.array([-0.02, 0.03, 0.01]))
    outs = []
    for tr in (8, 4):
        plan = plan_warp(out_cam, in_cam, max_correction_deg=6.0, trip_rows=tr)
        outs.append(np.asarray(warp_frame_pallas(
            jnp.asarray(img), rot, plan, out_cam, in_cam, interpret=True
        )))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_per_tile_mip_plan_levels_mixed():
    """A minifying config gets level >= 1 over the bulk while stretched
    corners stay at level 0 — the per-tile advantage over a global level."""
    in_cam = get_preset_camera(
        CameraPreset.GOPRO_H4B_WIDE43_MEASURED, (1280, 960)
    )
    out_cam = get_output_camera(in_cam, scale=0.3, crop_borders=True)
    out_w = out_cam.width - out_cam.width % 2
    out_h = out_cam.height - out_cam.height % 2
    plan = plan_warp(out_cam, in_cam, 6.0, (out_h, out_w), mip_levels=2)
    assert plan.mip_max >= 1
    lv = plan.levels
    assert (lv >= 1).mean() > 0.5  # bulk of tiles prefilter
    # window should be much smaller than the unfiltered plan's
    plan0 = plan_warp(out_cam, in_cam, 6.0, (out_h, out_w))
    assert plan.wh <= plan0.wh and plan.ww <= plan0.ww


def test_per_tile_mip_exact_on_linear_ramp():
    """Box downsampling + bilinear is EXACT for linear images; any
    half-pixel convention error in the level transform shows as a shift."""
    in_cam = get_preset_camera(
        CameraPreset.GOPRO_H4B_WIDE43_MEASURED, (640, 480)
    )
    out_cam = get_output_camera(in_cam, scale=0.3, crop_borders=True)
    out_w = out_cam.width - out_cam.width % 2
    out_h = out_cam.height - out_cam.height % 2
    plan = plan_warp(out_cam, in_cam, 6.0, (out_h, out_w), mip_levels=2)
    assert plan.mip_max >= 1

    yy, xx = np.mgrid[0:480, 0:640].astype(np.float32)
    img = 0.2 * xx + 0.15 * yy + 10.0
    rot = so3.exp(jnp.array([0.01, -0.02, 0.015]))
    got = np.asarray(warp_frame_pallas(
        jnp.asarray(img), rot, plan, out_cam, in_cam, interpret=True
    ))
    ref = np.asarray(warp_image_xla(
        jnp.asarray(img), out_cam, in_cam, rot, (out_h, out_w)
    ))
    # Compare strictly-inside pixels: the <=1 px edge band blends toward
    # the border at slightly different sub-pixel positions per level.
    from video_annotator_tpu.ops.warp_xla import compute_warp_map

    cm = np.asarray(compute_warp_map(out_cam, in_cam, rot, (out_h, out_w)))
    inside = (
        (cm[..., 0] >= 1.5) & (cm[..., 0] <= 640 - 2.5)
        & (cm[..., 1] >= 1.5) & (cm[..., 1] <= 480 - 2.5)
    )
    assert inside.mean() > 0.7
    # packs round to bytes, so allow ~1 byte-step of deviation
    assert np.abs(got - ref)[inside].max() < 1.5


def test_per_tile_mip_antialiases_checkerboard():
    in_cam = get_preset_camera(
        CameraPreset.GOPRO_H4B_WIDE43_MEASURED, (640, 480)
    )
    out_cam = get_output_camera(in_cam, scale=0.25, crop_borders=True)
    out_w = out_cam.width - out_cam.width % 2
    out_h = out_cam.height - out_cam.height % 2
    plan_m = plan_warp(out_cam, in_cam, 6.0, (out_h, out_w), mip_levels=2)
    plan_0 = plan_warp(out_cam, in_cam, 6.0, (out_h, out_w))
    assert plan_m.mip_max >= 1

    yy, xx = np.mgrid[0:480, 0:640]
    img = (((xx // 2) + (yy // 2)) % 2 * 200.0 + 20).astype(np.float32)
    rot = so3.exp(jnp.array([0.005, 0.01, 0.0]))
    out_m = np.asarray(warp_frame_pallas(
        jnp.asarray(img), rot, plan_m, out_cam, in_cam, interpret=True
    ))
    out_0 = np.asarray(warp_frame_pallas(
        jnp.asarray(img), rot, plan_0, out_cam, in_cam, interpret=True
    ))
    # Away from borders the 2px checker at >=4x minification should
    # average out near 120 under the prefilter; point-sampled bilinear
    # keeps large alias swings.
    c = (slice(out_h // 4, 3 * out_h // 4), slice(out_w // 4, 3 * out_w // 4))
    assert out_m[c].std() < out_0[c].std() * 0.5, (
        out_m[c].std(), out_0[c].std()
    )
    assert abs(float(out_m[c].mean()) - 120.0) < 8.0


def test_trip_group_matches_single():
    """Grouped schedule walks (N entries/iteration, dead padding, split
    accumulators) are pure perf knobs: outputs identical for every
    combination, short and long schedules alike."""
    in_cam = get_preset_camera(CameraPreset.GOPRO_H4B_WIDE43_MEASURED, (320, 240))
    out_cam = get_output_camera(in_cam, scale=1.0, crop_borders=False)
    rng = np.random.default_rng(21)
    img = np.round(rng.uniform(0, 255, size=(240, 320))).astype(np.float32)
    for wvec in ([0.01, -0.02, 0.03], [0.06, 0.0, -0.05], [0.0, 0.0, 0.0]):
        rot = so3.exp(jnp.asarray(wvec, jnp.float32))
        base = None
        for group, split in ((1, False), (2, False), (2, True), (4, True)):
            plan = plan_warp(out_cam, in_cam, 6.0, trip_group=group,
                             split_acc=split)
            got = np.asarray(warp_frame_pallas(
                jnp.asarray(img), rot, plan, out_cam, in_cam, interpret=True
            ))
            if base is None:
                base = got
            else:
                np.testing.assert_array_equal(base, got)


def test_origin_pass_guards_behind_rays():
    """Equirect output past 90 deg: the device origin pass must pin
    behind-camera rays to border (like the host planner) — unguarded
    projection mirrors or NaNs them into the bound reductions."""
    import jax.numpy as jnp
    import numpy as np

    from video_annotator_tpu.camera import CameraModel, camera_from_dfov
    from video_annotator_tpu.ops.warp_pallas import (
        _tile_bounds_grid,
        plan_warp,
    )

    in_cam = camera_from_dfov(145.8, (256, 192), CameraModel.FISHEYE)
    out_cam = camera_from_dfov(220.0, (256, 192), CameraModel.EQUIRECT)
    plan = plan_warp(out_cam, in_cam, 4.0, (192, 256))
    (mnx, mxx, mny, mxy), cols = _tile_bounds_grid(
        plan, out_cam, in_cam, jnp.eye(3, dtype=jnp.float32)
    )
    for arr in (mnx, mxx, mny, mxy, cols):
        assert bool(jnp.all(jnp.isfinite(arr))), "non-finite tile bounds"
    assert float(mnx.min()) >= -8.0 and float(mxx.max()) <= plan.in_w + 8.0
    assert float(mny.min()) >= -8.0 and float(mxy.max()) <= plan.in_h + 8.0


# --- 4-tap modes (bicubic / lanczos) ---------------------------------------


@pytest.mark.parametrize("interp", ["bicubic", "lanczos"])
def test_pallas_four_tap_matches_oracle(interp):
    """The 4-tap kernel modes (--interp bicubic/lanczos on the Pallas
    path) must match the XLA samplers, including the border band where
    the 4x4 stencil partially overlaps the image."""
    in_cam = get_preset_camera(CameraPreset.GOPRO_H4B_WIDE43_MEASURED, (320, 240))
    out_cam = get_output_camera(in_cam, scale=1.0, crop_borders=False)
    plan = plan_warp(out_cam, in_cam, max_correction_deg=6.0, interp=interp)
    assert plan.taps == 4

    rng = np.random.default_rng(5)
    img = np.round(rng.uniform(0, 255, size=(240, 320))).astype(np.float32)
    for w in ([0.03, -0.02, 0.04], [0.0, 0.0, 0.0], [-0.08, 0.0, 0.05]):
        rot = so3.exp(jnp.asarray(w, jnp.float32))
        ours = np.asarray(
            warp_frame_pallas(jnp.asarray(img), rot, plan, out_cam, in_cam,
                              interpret=True)
        )
        ref = np.asarray(
            warp_image_xla(jnp.asarray(img), out_cam, in_cam, rot,
                           interp=interp)
        )
        np.testing.assert_allclose(ours, ref, atol=0.08)


@pytest.mark.parametrize("interp", ["bicubic", "lanczos"])
def test_pallas_four_tap_nonrect_output(interp):
    """4-tap sampling composes with the precomputed-ray-grid path
    (non-rectilinear --projection)."""
    from video_annotator_tpu.camera import CameraModel, camera_from_dfov

    in_cam = get_preset_camera(CameraPreset.GOPRO_H4B_WIDE43_MEASURED, (320, 240))
    out_cam = camera_from_dfov(110.0, (256, 192), CameraModel.STEREOGRAPHIC)
    plan = plan_warp(out_cam, in_cam, max_correction_deg=6.0, interp=interp)

    rng = np.random.default_rng(6)
    img = np.round(rng.uniform(0, 255, size=(240, 320))).astype(np.float32)
    rot = so3.exp(jnp.array([0.02, -0.03, 0.01]))
    ours = np.asarray(
        warp_frame_pallas(jnp.asarray(img), rot, plan, out_cam, in_cam,
                          interpret=True)
    )
    ref = np.asarray(
        warp_image_xla(jnp.asarray(img), out_cam, in_cam, rot, interp=interp)
    )
    np.testing.assert_allclose(ours, ref, atol=0.08)


def test_pallas_four_tap_yuv_batch():
    """The fused YUV batch dispatch (the encode hot path) honors the
    plan's 4-tap mode; uint8 outputs match the XLA bicubic oracle to
    the rounding step."""
    from video_annotator_tpu.camera import camera_from_dfov, CameraModel
    from video_annotator_tpu.ops.warp_pallas import warp_yuv_batch_pallas
    from video_annotator_tpu.ops.warp_xla import _scaled_camera

    in_cam = get_preset_camera(CameraPreset.GOPRO_H4B_WIDE43_MEASURED, (192, 144))
    out_cam = get_output_camera(in_cam, scale=1.0, crop_borders=True)
    in_h = _scaled_camera(in_cam, 0.5)
    out_h = _scaled_camera(out_cam, 0.5)
    oh = out_cam.height - out_cam.height % 2
    ow = out_cam.width - out_cam.width % 2
    plan_y = plan_warp(out_cam, in_cam, 6.0, (oh, ow), interp="bicubic")
    plan_c = plan_warp(out_h, in_h, 6.0, (oh // 2, ow // 2), interp="bicubic")

    rng = np.random.default_rng(7)
    mk = lambda h, w: jnp.asarray(  # noqa: E731
        rng.integers(0, 255, (h, w), dtype=np.uint8)
    )
    ys = [mk(144, 192) for _ in range(2)]
    us = [mk(72, 96) for _ in range(2)]
    vs = [mk(72, 96) for _ in range(2)]
    rots = so3.exp(jnp.asarray(rng.normal(size=(2, 3)) * 0.02, jnp.float32))

    batch = warp_yuv_batch_pallas(ys, us, vs, rots, plan_y, out_cam, in_cam,
                                  plan_c, out_h, in_h, interpret=True)
    for i in range(2):
        ref_y = np.asarray(
            warp_image_xla(ys[i].astype(jnp.float32), out_cam, in_cam,
                           rots[i], (oh, ow), interp="bicubic")
        )
        got_y = np.asarray(batch[i][0]).astype(np.float64)
        # uint8 rounding: allow 1 count plus the kernel/oracle float gap.
        assert np.abs(got_y - np.clip(np.round(ref_y), 0, 255)).max() <= 1.0


def test_similarity_rides_fused_kernel():
    """The vidstab family's 2D similarity is a 3x3 homogeneous matrix:
    over identity pinhole cameras the rotation kernel computes exactly
    M @ (x, y, 1). Luma must match warp_frame_similarity to rounding;
    chroma too, INCLUDING the partial-tap border band (the kernel's
    border-weight deficit blends window-edge taps toward neutral 128,
    like the XLA path's centered sampling)."""
    from video_annotator_tpu.models.similarity import (
        SimilarityWarper,
        warp_frame_similarity,
    )
    from video_annotator_tpu.ops.warp_pallas import warp_yuv_batch_pallas

    rng = np.random.default_rng(3)
    w, h = 192, 144
    corr = np.stack([
        [4.0, -3.0, 0.02, 0.01],
        [-5.0, 2.5, -0.015, -0.02],
    ])
    warper = SimilarityWarper(w, h, corr)
    mk = lambda hh, ww: jnp.asarray(  # noqa: E731
        rng.integers(0, 255, (hh, ww), dtype=np.uint8)
    )
    ys = [mk(h, w) for _ in range(2)]
    us = [mk(h // 2, w // 2) for _ in range(2)]
    vs = [mk(h // 2, w // 2) for _ in range(2)]
    mats = jnp.asarray(SimilarityWarper.matrices(corr))
    outs = warp_yuv_batch_pallas(
        ys, us, vs, mats, warper.plan_y, warper.cam, warper.cam,
        warper.plan_c, warper.cam_c, warper.cam_c, interpret=True,
    )
    for i in range(2):
        ry, ru, rv = warp_frame_similarity(
            ys[i].astype(jnp.float32), us[i].astype(jnp.float32),
            vs[i].astype(jnp.float32), jnp.asarray(corr[i], jnp.float32),
        )
        got_y = np.asarray(outs[i][0]).astype(np.float64)
        ref_y = np.clip(np.round(np.asarray(ry)), 0, 255)
        np.testing.assert_allclose(got_y, ref_y, atol=1.0)
        for got, ref in ((outs[i][1], ru), (outs[i][2], rv)):
            g = np.asarray(got).astype(np.float64)
            r = np.clip(np.round(np.asarray(ref)), 0, 255)
            np.testing.assert_allclose(g, r, atol=1.0)


@pytest.mark.parametrize("interp", ["bicubic"])
def test_band_and_rolling_shutter_compose_with_four_tap(interp):
    """The TP band path and the rolling-shutter per-tile-row rotations
    must honor the plan's 4-tap mode like the plain path does."""
    from video_annotator_tpu.ops.warp_pallas import warp_frame_band_pallas

    in_cam = get_preset_camera(CameraPreset.GOPRO_H4B_WIDE43_MEASURED, (320, 240))
    out_cam = get_output_camera(in_cam, scale=1.0, crop_borders=True)
    plan = plan_warp(out_cam, in_cam, max_correction_deg=6.0, interp=interp)
    rng = np.random.default_rng(9)
    img = np.round(rng.uniform(0, 255, size=(240, 320))).astype(np.float32)

    # Band (TP) path: both shards concatenated == the plain warp.
    rot = so3.exp(jnp.array([0.02, -0.01, 0.03]))
    whole = np.asarray(
        warp_frame_pallas(jnp.asarray(img), rot, plan, out_cam, in_cam,
                          interpret=True)
    )
    ny = plan.out_h // 8
    band_rows = -(-ny // 2)
    bands = [
        np.asarray(
            warp_frame_band_pallas(jnp.asarray(img), rot, plan, out_cam,
                                   in_cam, 2, jnp.int32(s * band_rows),
                                   interpret=True)
        )
        for s in range(2)
    ]
    got = np.concatenate(bands, axis=0)[: whole.shape[0], : whole.shape[1]]
    np.testing.assert_allclose(got, whole, atol=1e-4)

    # Rolling shutter: per-tile-row rotation stack through the 4-tap
    # kernel matches the XLA oracle's per-row-rotation map.
    rots = so3.exp(jnp.asarray(rng.normal(size=(ny, 3)) * 0.01, jnp.float32))
    ours = np.asarray(
        warp_frame_pallas(jnp.asarray(img), rots, plan, out_cam, in_cam,
                          interpret=True)
    )
    ref = np.asarray(
        warp_image_xla(jnp.asarray(img), out_cam, in_cam, rots,
                       interp=interp)
    )
    np.testing.assert_allclose(ours, ref, atol=0.08)


def test_dbuf_depth_3_matches_depth_2():
    """Window-DMA pipeline depth is a pure perf knob: outputs identical."""
    in_cam = get_preset_camera(CameraPreset.GOPRO_H4B_WIDE43_MEASURED, (320, 240))
    out_cam = get_output_camera(in_cam, scale=1.0, crop_borders=False)
    rng = np.random.default_rng(13)
    img = np.round(rng.uniform(0, 255, size=(240, 320))).astype(np.float32)
    rot = so3.exp(jnp.array([0.015, -0.02, 0.01]))
    outs = []
    for depth in (2, 3, 4):
        plan = plan_warp(out_cam, in_cam, max_correction_deg=6.0)
        plan = dataclasses.replace(plan, dbuf_depth=depth)
        outs.append(np.asarray(warp_frame_pallas(
            jnp.asarray(img), rot, plan, out_cam, in_cam, interpret=True
        )))
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])

"""Experimental Pallas LK kernel vs the XLA path (interpret mode)."""

import numpy as np

import cv2
import jax.numpy as jnp

from video_annotator_tpu.ops.corners import detect_corners
from video_annotator_tpu.ops.lk import pyramidal_lk
from video_annotator_tpu.ops.lk_pallas import pyramidal_lk_pallas


def test_lk_pallas_matches_xla():
    rng = np.random.default_rng(1)
    img = rng.normal(size=(60, 80)).astype(np.float32)
    img = cv2.resize(img, (640, 480), interpolation=cv2.INTER_CUBIC)
    img = cv2.GaussianBlur(img, (0, 0), 1.0)
    img = ((img - img.min()) / (img.max() - img.min()) * 255).astype(np.float32)
    M = cv2.getRotationMatrix2D((320, 240), 1.0, 1.0)
    M[0, 2] += 5.5
    M[1, 2] -= 3.3
    img2 = cv2.warpAffine(img, M, (640, 480))

    pts, valid = detect_corners(jnp.asarray(img), max_corners=64, min_distance=25)
    xp, xs = pyramidal_lk(jnp.asarray(img), jnp.asarray(img2), pts, valid)
    pp, ps = pyramidal_lk_pallas(
        jnp.asarray(img), jnp.asarray(img2), pts, valid, interpret=True
    )
    both = np.asarray(xs) & np.asarray(ps) & np.asarray(valid)
    assert both.sum() > 30
    d = np.abs(np.asarray(xp) - np.asarray(pp))[both]
    assert np.median(d) < 0.1, np.median(d)


def test_lk_pallas_edge_points_fail_cleanly():
    """Points within the window/DMA margin of an edge can't run the kernel's
    static-range contract; they must come back status=False (cv2-style),
    never as plausible-looking garbage flow."""
    rng = np.random.default_rng(2)
    img = rng.normal(size=(60, 80)).astype(np.float32)
    img = cv2.resize(img, (640, 480), interpolation=cv2.INTER_CUBIC)
    img = ((img - img.min()) / (img.max() - img.min()) * 255).astype(np.float32)
    img2 = np.roll(img, (2, 3), axis=(0, 1)).astype(np.float32)

    # Rows near top/bottom (unsafe at some pyramid level) + safe interior.
    ys = np.asarray([9.0, 12.0, 30.0, 60.0, 240.0, 470.0, 474.0])
    pts = jnp.asarray(np.stack([np.full_like(ys, 320.0), ys], axis=1),
                      jnp.float32)
    valid = jnp.ones((len(ys),), bool)
    new_pts, status = pyramidal_lk_pallas(
        jnp.asarray(img), jnp.asarray(img2), pts, valid, interpret=True
    )
    status = np.asarray(status)
    new_pts = np.asarray(new_pts)
    # The deep-interior point tracks the known (3, 2) shift.
    assert status[4]
    np.testing.assert_allclose(new_pts[4], [323.0, 242.0], atol=0.35)
    # Every status=True point must agree with the truth — no silent
    # corruption from clamped windows.
    for i in np.nonzero(status)[0]:
        np.testing.assert_allclose(
            new_pts[i] - np.asarray(pts)[i], [3.0, 2.0], atol=0.5
        )
    # Edge rows (y < 17 at level 0, or unsafe at coarser levels) fail.
    assert not status[0]


def test_lk_pallas_tracks_last_strip():
    """Points whose window origin clamps against the right/bottom edge
    but whose span still FITS the clamped window must track normally: a
    did-anything-clamp status gate killed every point in the final
    128-column strip (~16% of a 1280-wide level) even though the kernel
    math was exact there."""
    rng = np.random.default_rng(3)
    img = rng.normal(size=(45, 80)).astype(np.float32)
    img = cv2.resize(img, (1280, 720), interpolation=cv2.INTER_CUBIC)
    img = ((img - img.min()) / (img.max() - img.min()) * 255).astype(np.float32)
    img2 = np.roll(img, (2, 3), axis=(0, 1)).astype(np.float32)

    # Interior-y points across the previously-dead right band and the
    # bottom band (all >= 68 px from the true edge so every pyramid
    # level has room).
    xy = [(1080.0, 360.0), (1150.0, 300.0), (1200.0, 400.0),
          (640.0, 600.0), (700.0, 640.0), (1100.0, 620.0),
          (640.0, 360.0), (200.0, 200.0)]
    pts = jnp.asarray(np.asarray(xy, np.float32))
    valid = jnp.ones((len(xy),), bool)
    new_pts, status = pyramidal_lk_pallas(
        jnp.asarray(img), jnp.asarray(img2), pts, valid, interpret=True
    )
    status = np.asarray(status)
    assert status.all(), status
    d = np.asarray(new_pts) - np.asarray(xy)
    np.testing.assert_allclose(d, np.tile([3.0, 2.0], (len(xy), 1)),
                               atol=0.5)


def test_lk_pairs_matches_per_frame_packed():
    """The batched-pairs path (tall-stack bands, one launch per level)
    must be BIT-EXACT vs the per-frame packed path on every pair — the
    band relocation is a pure word-row offset, so any difference means
    windows leaked across frame bands."""
    from video_annotator_tpu.ops.lk_pallas import (
        lk_pack_pyramid,
        lk_pack_pyramid_pairs,
        pyramidal_lk_pallas_packed,
        pyramidal_lk_pallas_pairs,
    )

    rng = np.random.default_rng(5)
    t, h, w = 4, 480, 640
    base = rng.normal(size=(60, 80)).astype(np.float32)
    base = cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)
    base = ((base - base.min()) / (base.max() - base.min()) * 255).astype(
        np.float32)
    frames = np.stack([
        np.roll(base, (3 * i - 4, 2 * i - 3), axis=(0, 1)) for i in range(t)
    ]).astype(np.float32)

    n = 32
    pts_list, valid_list = [], []
    for i in range(t - 1):
        pts, valid = detect_corners(
            jnp.asarray(frames[i]), max_corners=n, min_distance=30
        )
        pts_list.append(pts)
        valid_list.append(valid)
    points = jnp.stack(pts_list)
    valid = jnp.stack(valid_list)

    packed_tall = lk_pack_pyramid_pairs(jnp.asarray(frames), interpret=True)
    got_pts, got_st = pyramidal_lk_pallas_pairs(
        packed_tall, (h, w), points, valid, interpret=True
    )

    packed = [lk_pack_pyramid(jnp.asarray(frames[i]), interpret=True)
              for i in range(t)]
    for i in range(t - 1):
        want_pts, want_st = pyramidal_lk_pallas_packed(
            packed[i], packed[i + 1], (h, w), points[i], valid[i],
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got_st[i]),
                                      np.asarray(want_st))
        np.testing.assert_array_equal(np.asarray(got_pts[i]),
                                      np.asarray(want_pts),
                                      err_msg=f"pair {i}")


def test_lk_pairs_edge_points_fail_cleanly():
    """Band-edge points (near a frame's top/bottom in the tall stack)
    must gate exactly like the per-frame path — never silently read the
    neighboring frame's band."""
    from video_annotator_tpu.ops.lk_pallas import (
        lk_pack_pyramid,
        lk_pack_pyramid_pairs,
        pyramidal_lk_pallas_packed,
        pyramidal_lk_pallas_pairs,
    )

    rng = np.random.default_rng(6)
    t, h, w = 3, 480, 640
    frames = np.stack([
        rng.uniform(0, 255, (h, w)) for _ in range(t)
    ]).astype(np.float32)
    ys = np.asarray([9.0, 12.0, 30.0, 60.0, 240.0, 460.0, 470.0, 474.0])
    pts1 = np.stack([np.full_like(ys, 320.0), ys], axis=1)
    points = jnp.asarray(np.stack([pts1] * (t - 1)), jnp.float32)
    valid = jnp.ones((t - 1, len(ys)), bool)

    packed_tall = lk_pack_pyramid_pairs(jnp.asarray(frames), interpret=True)
    got_pts, got_st = pyramidal_lk_pallas_pairs(
        packed_tall, (h, w), points, valid, interpret=True
    )
    for i in range(t - 1):
        want_pts, want_st = pyramidal_lk_pallas_packed(
            lk_pack_pyramid(jnp.asarray(frames[i]), interpret=True),
            lk_pack_pyramid(jnp.asarray(frames[i + 1]), interpret=True),
            (h, w), points[i], valid[i], interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got_st[i]),
                                      np.asarray(want_st))
        np.testing.assert_array_equal(np.asarray(got_pts[i]),
                                      np.asarray(want_pts))

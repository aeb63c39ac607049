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

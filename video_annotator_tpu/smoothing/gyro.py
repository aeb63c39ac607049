"""GPMF gyro integration: IMU angular rates -> per-frame camera rotations.

The reference planned (but commented out) gyro-assisted stabilization: parse
``GYRO`` streams from the GoPro metadata track, scale samples, interpolate
per-sample timestamps from packet pts/duration, and feed roll/pitch/yaw into
the trajectory filter (``opencv/gpmf.cpp:5-11,82-105``; demux hook at
``opencv/AvFrameSourceFileVaapi.cpp:121-122``). This module implements that
design natively: integrate the angular-rate samples on SO(3) with a
``lax.scan`` and resample the resulting orientation trajectory at frame
timestamps, producing the same "accumulated rotation per frame" the visual
tracker estimates — the two sources share every downstream stage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from video_annotator_tpu import so3


@jax.jit
def integrate_gyro(
    omega: jax.Array,  # (S, 3) angular rate samples, rad/s (camera frame)
    sample_ts: jax.Array,  # (S,) sample timestamps, seconds
    frame_ts: jax.Array,  # (T,) frame timestamps, seconds
) -> jax.Array:
    """Accumulated camera rotation at each frame timestamp, (T, 3, 3).

    Orientation is integrated per gyro sample (R_{k+1} = R_k exp(w_k dt_k),
    scan over samples) and then geodesically interpolated at frame times.
    The first frame is the identity reference, matching the visual tracker's
    convention (``opencv/FrameSourceWarp.cpp:209``).
    """
    dt = jnp.diff(sample_ts)
    steps = so3.exp(omega[:-1] * dt[:, None])  # (S-1, 3, 3)

    def step(R, dR):
        Rn = so3.matmul(R, dR)
        return Rn, Rn

    eye = jnp.eye(3, dtype=omega.dtype)
    _, Rs = jax.lax.scan(step, eye, steps)
    Rs = jnp.concatenate([eye[None], Rs], axis=0)  # (S, 3, 3) at sample_ts

    # Geodesic resample at frame timestamps.
    idx = jnp.clip(
        jnp.searchsorted(sample_ts, frame_ts, side="right") - 1,
        0,
        sample_ts.shape[0] - 2,
    )
    t0 = sample_ts[idx]
    t1 = sample_ts[idx + 1]
    alpha = jnp.clip((frame_ts - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0, 1.0)
    R_frames = so3.slerp(Rs[idx], Rs[idx + 1], alpha)

    # Rebase so the first frame is the identity.
    R0_inv = jnp.swapaxes(R_frames[0], -1, -2)
    return so3.matmul(R0_inv[None], R_frames)

"""Stabilization-QUALITY benchmark: numbers for what the reference eyeballs.

The reference's only quality mechanisms are visual — the ``--compare``
grid (``src/render.ts:1052-1223``) and the ``dewobble_test.sh`` A/B
harness judged by a human (SURVEY.md section 4). This benchmark makes
quality quantitative, using the one asset the reference never had: a
synthetic source with an exact ground-truth camera trajectory
(``io/synthetic.py``).

Each stabilizer family renders the same shaky clip end-to-end (the real
pipeline: analyse -> smooth -> warp -> write); the outputs are scored on

- ``hf_shake``: RMS *high-frequency* inter-frame image motion of the
  output. Per-frame global motion is the MEDIAN displacement of corner
  features tracked with the framework's own pyramidal LK
  (``ops/corners.py`` + ``ops/lk.py``) between consecutive output luma
  frames; the displacement series is then detrended with the same
  Savitzky-Golay window the smoother uses — an intentional pan is not
  shake, residual jitter is. This is exactly what stabilization exists
  to remove. Reported in px and in degrees-equivalent (px / focal at
  the output's center), so families rendered at different pixel scales
  compare on one axis. (Global phase correlation was tried first and
  rejected: the synthetic world texture is a sum of sinusoids, so the
  whitened cross-power spectrum has near-equal secondary peaks and the
  estimator throws multi-pixel outliers; local feature tracking with a
  median is immune to both the periodicity and stray outliers.)
- ``reduction_db``: ``20*log10(shake_unstabilized / shake_out)`` against
  a *family-matched* unstabilized baseline (same output camera, same px
  scale). Positive = the stabilizer removed shake.
- ``traj_rms_deg`` (rotation family): RMS angle between the analysed
  camera trajectory and the synthetic ground truth — the analogue of the
  reference calibration tool's RMS reprojection self-check
  (``camera_calibration.cpp:600-606``), applied to motion estimation.

Measurement pitfall this benchmark is built around: the rotation family
renders at the auto-fit output dfov (145.8°) by default, and a
rectilinear view that wide has large camera-fixed corner regions outside
the fisheye's valid cone. Those regions are STATIONARY in the
unstabilized render and SWIM with the correction in stabilized ones, so
a global-translation metric locks onto the border instead of the scene
and inverts every conclusion. The rotation configs therefore render at a
narrow ``--output-dfov`` (default 70°) where every output pixel is valid
in every frame; the 2D families keep their native (input-sized) canvas,
whose invalid band is only as deep as the few-px correction and falls
inside the measurement's 1/8 central crop.

Usage:  python benchmarks/quality.py [--w 640 --h 480 --n 150 --radius 15]
Writes one JSON object per config to stdout and benchmarks/quality.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure_shake(path: str, radius: int) -> float:
    """RMS high-frequency inter-frame translation (px) of a video's luma."""
    import jax
    import jax.numpy as jnp

    from video_annotator_tpu.io.video import open_reader
    from video_annotator_tpu.ops.corners import detect_corners
    from video_annotator_tpu.ops.lk import pyramidal_lk
    from video_annotator_tpu.smoothing.savgol import savgol_weights

    @jax.jit
    def track(prev, nxt):
        pts, valid = detect_corners(
            prev, max_corners=64, min_distance=24, border=16
        )
        new, ok = pyramidal_lk(prev, nxt, pts, valid)
        return pts, new, ok

    reader = open_reader(path)
    shifts = []
    prev = None
    try:
        for y, _, _ in reader:
            # Central crop: the 2D families' border band swims with the
            # correction; the scene, not the border, is the signal.
            h, w = y.shape
            c = jnp.asarray(
                y[h // 8 : h - h // 8, w // 8 : w - w // 8].astype(np.float32)
            )
            if prev is not None:
                pts, new, ok = track(prev, c)
                d = np.asarray(new - pts)
                okn = np.asarray(ok)
                shifts.append(
                    np.median(d[okn], axis=0)
                    if okn.sum() >= 8
                    else np.zeros(2)
                )
            prev = c
    finally:
        reader.close()
    d = np.asarray(shifts)  # (T-1, 2) per-frame (dx, dy)
    if len(d) < 3:
        return 0.0
    # Detrend with the smoother's own SG window (replicate-padded, the
    # trajectory smoother's end semantics): pans survive, jitter remains.
    w_sg = np.asarray(savgol_weights(radius, 2), np.float64)
    r = len(w_sg) // 2
    padded = np.concatenate(
        [np.repeat(d[:1], r, axis=0), d, np.repeat(d[-1:], r, axis=0)]
    )
    trend = np.stack(
        [np.convolve(padded[:, i], w_sg, mode="valid") for i in range(2)],
        axis=-1,
    )
    hf = d - trend
    return float(np.sqrt((hf**2).sum(axis=1).mean()))


def traj_rms_deg(dest: str, src: str) -> float:
    """RMS angle (deg) between the analysed trajectory and ground truth."""
    import jax.numpy as jnp

    from video_annotator_tpu import so3
    from video_annotator_tpu.io.synthetic import SyntheticSource
    from video_annotator_tpu.pipeline.trajectory import (
        Trajectory,
        trajectory_path,
    )

    traj = Trajectory.load(trajectory_path(dest))
    cfg = SyntheticSource.from_uri(src).config
    w_true = cfg.rotation_vectors()  # R_t applied to rays; camera = R_t^-1
    r_true = np.asarray(so3.exp(jnp.asarray(w_true)))
    r_expect = r_true.transpose(0, 2, 1) @ r_true[0]
    r_est = traj.rotations()
    n = min(len(r_est), len(r_expect))
    errs = [
        np.linalg.norm(
            np.asarray(so3.log(jnp.asarray(r_est[t] @ r_expect[t].T)))
        )
        for t in range(n)
    ]
    return float(np.degrees(np.sqrt(np.mean(np.square(errs)))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=640)
    ap.add_argument("--h", type=int, default=480)
    ap.add_argument("--n", type=int, default=150)
    ap.add_argument("--shake", type=float, default=0.008)
    ap.add_argument("--radius", type=int, default=15)
    ap.add_argument("--dfov", type=float, default=70.0,
                    help="rotation-family output dfov (narrow => all "
                         "output pixels valid; see module docstring)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "quality.json"))
    args = ap.parse_args()

    from fractions import Fraction

    from video_annotator_tpu.camera import CameraPreset
    from video_annotator_tpu.io.video import VideoMeta
    from video_annotator_tpu.pipeline.render import (
        RenderOptions,
        build_cameras,
        render,
    )

    src = (
        f"synthetic://shaky?w={args.w}&h={args.h}&n={args.n}"
        f"&seed=11&shake={args.shake}&pan=0.002"
    )
    base = dict(
        preset=CameraPreset.GOPRO_H4B_WIDE43_MEASURED,
        stabilise_radius=args.radius,
        # Rows measure the formulation they NAME: pin the sequential
        # tracker here (paired rows override) so the default-"auto"
        # resolution (paired on an accelerator backend) cannot silently
        # change what an unlabeled row means between hosts.
        analysis_mode="tracked",
        # Zero extra canvas so every rotation config renders the SAME
        # output camera (the default 20% stabilise buffer would change
        # the px-per-degree scale between configs).
        stabilise_buffer=0.0,
    )
    rot = dict(output_dfov=args.dfov)
    # (name, options, baseline-name or None)
    configs = [
        ("unstabilized", dict(stabilise="none", **rot), None),
        ("rotation_smooth_savgol", dict(stabilise="smooth", **rot),
         "unstabilized"),
        # --analysis-scale quality delta: the 4k_visual_full_pipeline
        # benchmark tracks at 0.5 (the reference demo's scale,
        # DisplayImage.cpp:48); these rows put a number on what downscaled
        # tracking costs in trajectory accuracy and residual shake.
        ("rotation_smooth_scale05",
         dict(stabilise="smooth", analysis_scale=0.5, **rot),
         "unstabilized"),
        ("rotation_smooth_scale025",
         dict(stabilise="smooth", analysis_scale=0.25, **rot),
         "unstabilized"),
        # --analysis-mode paired: the batched TPU-first analyse (fresh
        # corners per frame, all pairs in one launch per level) scored
        # against the sequential tracker; the 4k_visual_full_pipeline
        # bench runs this mode at scale 0.5, so that exact combination
        # gets its own row.
        ("rotation_smooth_paired",
         dict(stabilise="smooth", analysis_mode="paired", **rot),
         "unstabilized"),
        ("rotation_smooth_paired_scale05",
         dict(stabilise="smooth", analysis_mode="paired",
              analysis_scale=0.5, **rot),
         "unstabilized"),
        # --analysis-detect-level 0 (track-resolution corner detection):
        # the documented remedy for paired's trajectory-RMS regression at
        # scale 0.5; these rows close the remedy loop with data (VERDICT
        # r4 item 3) — does detect0 recover tracked's traj RMS, and at
        # what analyse cost (fps side: benchmarks/results.json
        # 4k_visual_full_pipeline_detect0 row).
        ("rotation_smooth_paired_detect0",
         dict(stabilise="smooth", analysis_mode="paired",
              analysis_detect_level=0, **rot),
         "unstabilized"),
        ("rotation_smooth_paired_scale05_detect0",
         dict(stabilise="smooth", analysis_mode="paired",
              analysis_scale=0.5, analysis_detect_level=0, **rot),
         "unstabilized"),
        ("rotation_smooth_kalman",
         dict(stabilise="smooth", smoother="kalman", **rot), "unstabilized"),
        # --streaming --smoother kalman: the fixed-lag window form
        # (filter burn-in over the ring's past radius, RTS back from its
        # future radius). Its dB vs the two-phase global RTS row above
        # IS the committed truncation cost (VERDICT r4 item 6).
        ("rotation_smooth_kalman_streaming",
         dict(stabilise="smooth", smoother="kalman", streaming=True, **rot),
         "unstabilized"),
        ("rotation_fixed", dict(stabilise="fixed", **rot), "unstabilized"),
        # Every user-visible rendering MODE gets a scored row (VERDICT r2
        # item 7): the 4-tap interpolators, the mip prefilter, and the
        # rolling-shutter correction ride the same trajectory math as
        # rotation_smooth_savgol, so their rows isolate what the MODE does
        # to residual shake (correctness vs the cv2/XLA oracles is the
        # per-kernel tests' job; this scores end-to-end stabilization).
        ("rotation_smooth_bicubic",
         dict(stabilise="smooth", interp="bicubic", **rot), "unstabilized"),
        ("rotation_smooth_lanczos",
         dict(stabilise="smooth", interp="lanczos", **rot), "unstabilized"),
        ("rotation_smooth_prefilter",
         dict(stabilise="smooth", prefilter="auto", **rot), "unstabilized"),
        # Rolling shutter: the synthetic source is GLOBAL-shutter, so
        # this row quantifies the penalty of asserting a readout the
        # sensor does not have (--rolling-shutter 0.5 skews each
        # scanline band by up to half the inter-frame motion —
        # measured 10.4 dB vs 21.8 without). Per-scanline warp
        # CORRECTNESS vs its oracle is tests/test_rolling.py's job;
        # this row documents the knob's failure mode on mismatched
        # footage, the number a user needs to diagnose "why did
        # stabilization get worse when I set readout time".
        ("rotation_smooth_rollingshutter",
         dict(stabilise="smooth", rolling_shutter=0.5, **rot),
         "unstabilized"),
        ("unstabilized_2d", dict(filter="similarity", stabilise="none"),
         None),
        ("similarity_smooth", dict(filter="similarity", stabilise="smooth"),
         "unstabilized_2d"),
        ("deshake_smooth", dict(filter="deshake", stabilise="smooth"),
         "unstabilized_2d"),
    ]

    # px -> degrees-equivalent at the output's center: rotation family
    # at the narrow output camera's focal, 2D families at the input
    # camera's (their canvas is the input frame).
    meta = VideoMeta(args.w, args.h, Fraction(30, 1), args.n)
    in_cam, rot_out_cam = build_cameras(
        meta, RenderOptions(**base, stabilise="none", **rot)
    )
    px_per_rad = {
        "rotation": float(rot_out_cam.fx),
        "2d": float(in_cam.fx),
    }

    results = []
    shakes: dict[str, float] = {}
    with tempfile.TemporaryDirectory() as td:
        for name, opts, baseline in configs:
            dest = os.path.join(td, f"{name}.y4m")
            # dict-merge (not **base, **opts) so a row's explicit
            # analysis_mode overrides base's tracked pin.
            render(src, dest, RenderOptions(**{**base, **opts}))
            shake = measure_shake(dest, args.radius)
            shakes[name] = shake
            fam = "rotation" if "output_dfov" in opts else "2d"
            row = {
                "config": name,
                "metric": "hf_shake_px_rms",
                "value": round(shake, 4),
                "unit": "px",
                "hf_shake_deg_rms": round(
                    float(np.degrees(shake / px_per_rad[fam])), 4
                ),
            }
            if baseline is not None:
                row["reduction_db"] = round(
                    20.0
                    * np.log10(
                        max(shakes[baseline], 1e-9) / max(shake, 1e-9)
                    ),
                    2,
                )
            if opts.get("stabilise") != "none" and \
                    opts.get("filter", "rotation") == "rotation":
                row["traj_rms_deg"] = round(traj_rms_deg(dest, src), 4)
            results.append(row)
            print(json.dumps(row), flush=True)

    from provenance import stamp

    for row in results:
        stamp(row)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()

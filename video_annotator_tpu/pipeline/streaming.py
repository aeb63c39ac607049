"""Single-pass streaming render: decode once, bounded-lookahead smoothing.

The reference's native engine is a streaming pipeline: frames and measured
rotations queue in a lookahead buffer until ``smooth_radius`` future frames
exist, then each frame is smoothed and warped as it leaves the window
(``opencv/FrameSourceWarp.cpp:452-464``; EOF replays the last rotation so
the tail still gets smoothed, ``:456-461``). The two-phase analyse/encode
design (``pipeline/render.py``) checkpoints the whole trajectory like the
TS side's ``.trf`` flow but decodes the source twice; this module is the
native engine's single-pass shape: track, smooth with a sliding window,
and warp in one decode pass — output identical to the two-phase path
(same Savitzky-Golay weights, same replicate-clamp end semantics), with
latency bounded by the lookahead radius instead of the clip length.

The lookahead ring holds ``radius + warp_batch`` decoded YUV frames in
device memory (at 4K: ~17 MB/frame — the default radius 90 + batch 32 is
~2 GB of a 16 GB chip), the TPU analogue of the reference's
``-extra_hw_frames`` VAAPI pool sizing (``src/render.ts:220-223``).
"""

from __future__ import annotations

import os
from collections import deque
from fractions import Fraction
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from video_annotator_tpu import so3
from video_annotator_tpu.io.video import VideoMeta, open_reader, open_writer
from video_annotator_tpu.pipeline.profiler import StageProfiler
from video_annotator_tpu.pipeline.render import (
    FrameWarper,
    RenderOptions,
    _estimate_up0,
    _frame_range,
    _make_tracker,
    _passthrough_kwargs,
    build_cameras,
)
from video_annotator_tpu.pipeline.trajectory import Trajectory, trajectory_path
from video_annotator_tpu.smoothing.savgol import savgol_weights


def _make_batch_corrections(radius: int, options: RenderOptions,
                            up0: Optional[np.ndarray]):
    """Jitted window -> warp-rotation batch.

    Takes the measured rotations for the emitted frames plus ``radius``
    clamp-replicated neighbors on each side, and returns the same
    corrections ``compute_corrections`` produces for those frames.
    """
    w = jnp.asarray(savgol_weights(radius, order=2)) if radius else None
    attitude = so3.from_euler(
        np.radians(options.roll), np.radians(options.pitch),
        np.radians(options.yaw),
    )
    lock = options.horizon_lock
    up = jnp.asarray(
        up0 if up0 is not None else np.asarray([0.0, -1.0, 0.0]), jnp.float32
    )

    @jax.jit
    def batch_corr(window):  # (B + 2*radius, 3, 3) f32
        measured = window[radius : window.shape[0] - radius]
        if options.stabilise == "none":
            virtual = measured
        elif options.stabilise == "fixed":
            virtual = jnp.broadcast_to(
                jnp.eye(3, dtype=window.dtype), measured.shape
            )
        else:  # smooth: SG conv over the window (replicas already in place)
            flat = window.reshape(-1, 9)
            sm = jax.lax.conv_general_dilated(
                flat.T[:, None, :],
                w[None, None, :],
                window_strides=(1,),
                padding="VALID",
                dimension_numbers=("NCH", "OIH", "NCH"),
                preferred_element_type=jnp.float32,
            )[:, 0, :].T
            virtual = so3.project(sm.reshape(-1, 3, 3))

        if lock:
            from video_annotator_tpu.smoothing.horizon import level_horizon

            virtual = level_horizon(virtual, up)
            corr = so3.matmul(measured, jnp.swapaxes(virtual, -1, -2))
        elif options.stabilise == "none":
            corr = jnp.broadcast_to(
                jnp.eye(3, dtype=window.dtype), measured.shape
            )
        else:
            corr = so3.matmul(measured, jnp.swapaxes(virtual, -1, -2))
        return so3.matmul(corr, attitude[None].astype(window.dtype))

    return batch_corr


def render_streaming(
    source: str,
    dest: Optional[str],
    options: Optional[RenderOptions] = None,
    profiler: Optional[StageProfiler] = None,
) -> VideoMeta:
    """One-pass track+smooth+warp+encode with a lookahead window."""
    options = options or RenderOptions()
    prof = profiler or StageProfiler()
    if options.analyse_only or options.encode_only:
        raise ValueError("--streaming is single-pass; drop -a/-c")
    if options.stabilise == "smooth" and options.smoother != "savgol":
        raise ValueError(
            "--streaming smoothing is windowed (savgol); the Kalman RTS "
            "smoother needs the whole trajectory — use the two-phase path"
        )

    reader = open_reader(source, prefer_native=options.native_io)
    meta = reader.meta
    detect_step, track_step = _make_tracker(meta, options)
    in_cam, out_cam = build_cameras(meta, options)
    warper = FrameWarper(in_cam, out_cam, options.max_correction_deg,
                         prefilter=options.prefilter == "auto")

    first, last = _frame_range(meta, options)
    n_expect = (last - first) if meta.num_frames else 0
    out_meta = VideoMeta(
        width=warper.out_w,
        height=warper.out_h,
        fps=Fraction(options.frame_rate).limit_denominator(1001)
        if options.frame_rate
        else meta.fps,
        num_frames=n_expect,
    )
    from video_annotator_tpu.io.prefetch import AsyncFrameWriter, DevicePrefetcher

    writer = AsyncFrameWriter(
        open_writer(None if options.no_output else dest, out_meta,
                    encoder=options.encoder,
                    **_passthrough_kwargs(source, meta, options))
    )

    up0 = (
        _estimate_up0(source, float(first) / float(meta.fps))
        if options.horizon_lock
        else None
    )
    batch = options.warp_batch or max(
        1, int(os.environ.get("VAT_WARP_BATCH", "32")))

    # Lookahead only matters for windowed smoothing; fixed/none emit
    # immediately. The EFFECTIVE radius shrinks for clips shorter than the
    # window, exactly like compute_corrections — decided lazily at first
    # emission (pre-EOF emission implies the clip outlasts the window).
    want_radius = (
        options.stabilise_radius if options.stabilise == "smooth" else 0
    )

    # --- state ---------------------------------------------------------
    from video_annotator_tpu.pipeline.render import KEY_FRAME_MAX_AGE

    frames = deque()  # (y, u, v) device triples awaiting emission
    rots = []  # device (3, 3) measured rotations, one per tracked frame
    emitted = 0
    batch_corr = None
    radius_eff = None

    r_acc = jnp.eye(3, dtype=jnp.float32)
    prev_delta = jnp.eye(3, dtype=jnp.float32)
    key = jax.random.PRNGKey(7)
    prev_gray = None
    pts = valid = None
    age = 0

    def emit(n: int, at_eof: bool):
        """Warp+write frames [emitted, emitted+n) (n <= batch)."""
        nonlocal emitted, batch_corr, radius_eff
        if n <= 0:
            return
        if batch_corr is None:
            total = len(rots) if at_eof else None
            radius_eff = (
                min(want_radius, max((total or len(rots)) - 1, 1))
                if options.stabilise == "smooth"
                else 0
            )
            batch_corr = _make_batch_corrections(radius_eff, options, up0)
        t0 = emitted
        last_i = len(rots) - 1
        window = jnp.stack(
            [
                rots[min(max(k, 0), last_i)]
                for k in range(t0 - radius_eff, t0 + batch + radius_eff)
            ]
        )
        with prof.stage("smooth"):
            corr = batch_corr(window)
        ys, us, vs = zip(*(
            [frames[i] for i in range(n)] + [frames[n - 1]] * (batch - n)
        ))
        with prof.stage("warp"):
            outs = warper.warp_yuv_batch(ys, us, vs, corr)
        with prof.stage("encode"):
            for triple in outs[:n]:
                writer.write(triple)
        for _ in range(n):
            frames.popleft()
        emitted += n

    pre = DevicePrefetcher(prof.wrap_iter("decode", iter(reader)),
                           depth=options.prefetch_depth)
    idx = -1
    for y, u, v in pre:
        idx += 1
        if idx < first:
            continue
        if idx >= last:
            break
        with prof.stage("track"):
            if prev_gray is None:
                pts, valid, prev_gray = detect_step(y)
            else:
                pts, valid, prev_delta, r_acc, key, prev_gray = track_step(
                    prev_gray, y, pts, valid, prev_delta, r_acc, key,
                    refresh_age=age >= KEY_FRAME_MAX_AGE,
                )
                age = 0 if age >= KEY_FRAME_MAX_AGE else age + 1
        frames.append((y, u, v))
        rots.append(r_acc)
        # Emit every frame whose full lookahead window is present.
        while len(rots) - want_radius - emitted >= batch:
            emit(batch, at_eof=False)
    pre.close()
    # EOF: the remaining window smooths against clamp-replicated ends
    # (the reference's trajectory-extrapolation EOF semantics).
    while emitted < len(rots):
        emit(min(batch, len(rots) - emitted), at_eof=True)
    with prof.stage("encode"):
        writer.close()
    reader.close()

    # Persist the trajectory checkpoint (one device->host sync), so later
    # --encode-only reruns can reuse this pass's analysis.
    if dest and rots:
        rotvecs = np.asarray(
            jax.jit(jax.vmap(so3.log))(jnp.stack(rots)), np.float64
        )
        Trajectory(
            params=rotvecs, kind="so3", fps=meta.fps, width=meta.width,
            height=meta.height, source=source,
            up0=up0 if up0 is not None
            else _estimate_up0(source, float(first) / float(meta.fps)),
        ).save(trajectory_path(dest))
    return out_meta

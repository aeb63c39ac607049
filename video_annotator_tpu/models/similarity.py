"""The vidstab-family stabilizer: 2D similarity trajectory.

Equivalent of the reference's vidstab pipeline (two-pass: ``vidstabdetect``
writes motion data, ``vidstabtransform`` applies smoothed transforms with
``optzoom: 0``, ``zoom: -buffer``, ``interpol: bicubic``, ``smoothing:
radius`` — ``src/render.ts:546-585``). Analysis tracks corners with LK and
fits robust per-frame similarities; encoding smooths the accumulated
(dx, dy, angle, log_scale) trajectory with the same SG kernel the rotation
family uses, and warps with the inverse correction.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from video_annotator_tpu.ops.affine import (
    compose_similarity,
    fit_similarity,
    invert_similarity,
    warp_similarity,
)
from video_annotator_tpu.ops.corners import detect_corners
from video_annotator_tpu.ops.lk import pyramidal_lk
from video_annotator_tpu.ops.lk_pallas import pyramidal_lk_pallas
from video_annotator_tpu.pipeline.profiler import StageProfiler
from video_annotator_tpu.pipeline.trajectory import Trajectory
from video_annotator_tpu.smoothing.savgol import savgol_weights, sg_conv


def analyse_similarity(
    source: str,
    options,  # RenderOptions
    profiler: Optional[StageProfiler] = None,
) -> Trajectory:
    """Track the accumulated 2D similarity trajectory (vidstabdetect)."""
    from video_annotator_tpu.pipeline.render import (
        KEY_FRAME_MAX_AGE,
        MAX_CORNERS,
        open_trimmed,
        tracking_border,
        tracking_gates,
    )

    prof = profiler or StageProfiler()
    reader, meta, first, last = open_trimmed(source, options)
    # --analysis-scale: track on a box-downsampled level; similarities
    # conjugate through scaling (translation x 2^level, angle/log-scale
    # unchanged), applied once at collect time.
    from video_annotator_tpu.pipeline.render import analysis_level

    level = analysis_level(options, meta)
    track_w = meta.width >> level
    min_distance, min_inliers, min_refresh = tracking_gates(track_w)
    border = tracking_border(track_w, meta.height >> level)

    import functools as _ft

    from video_annotator_tpu.ops.warp_pallas import box_downsample

    def _track_res(gray):
        return box_downsample(gray, level) if level else gray

    @_ft.partial(jax.jit, static_argnames=("refresh_age",))
    def track_step(prev_gray, gray, pts, valid, prev_params, acc, refresh_age):
        """Fully-device analyse step (same shape as the rotation family's,
        ``pipeline/render.py``): track + fit + accumulate + conditional
        corner refresh, with no per-frame host read. Over a remote backend
        a blocked device->host round trip costs ~30-90 ms/frame — this
        loop syncs once, at the end of the clip."""
        gray = _track_res(gray)
        lk = pyramidal_lk if jax.default_backend() == "cpu" else pyramidal_lk_pallas
        new_pts, status = lk(prev_gray, gray, pts, valid)
        params, inliers = fit_similarity(pts, new_pts, status)
        params = jnp.where(inliers >= min_inliers, params, prev_params)
        acc = compose_similarity(params, acc)
        if refresh_age:
            out_pts, out_valid = detect_corners(
                gray, max_corners=MAX_CORNERS, min_distance=min_distance,
                border=border,
            )
        else:
            # NOTE: the count-based refresh runs on device, so the host's
            # age counter does not reset on it (same cadence as the
            # rotation family's fully-device step) — the worst case is one
            # redundant detect at the age limit.
            out_pts, out_valid = jax.lax.cond(
                jnp.sum(status) < min_refresh,
                lambda: detect_corners(
                    gray, max_corners=MAX_CORNERS, min_distance=min_distance,
                    border=border,
                ),
                lambda: (new_pts, status),
            )
        return out_pts, out_valid, params, acc, gray

    @jax.jit
    def detect_step(gray):
        gray = _track_res(gray)
        return detect_corners(
            gray, max_corners=MAX_CORNERS, min_distance=min_distance,
            border=border,
        ) + (gray,)

    acc = jnp.zeros(4, jnp.float32)
    prev_params = jnp.zeros(4, jnp.float32)
    out = []
    prev_gray = None
    pts = valid = None
    age = 0
    idx = reader.start_frame - 1
    from video_annotator_tpu.io.prefetch import DevicePrefetcher

    pre = DevicePrefetcher(prof.wrap_iter("decode", iter(reader)),
                           depth=getattr(options, "prefetch_depth", 3))
    try:
        for y, _, _ in pre:
            idx += 1
            if idx < first:
                continue
            if idx >= last:
                break
            if prev_gray is None:
                with prof.stage("detect"):
                    pts, valid, prev_gray = detect_step(y)
                out.append(acc)
            else:
                with prof.stage("track"):
                    pts, valid, prev_params, acc, prev_gray = track_step(
                        prev_gray, y, pts, valid, prev_params, acc,
                        refresh_age=age >= KEY_FRAME_MAX_AGE,
                    )
                    out.append(acc)
                age = 0 if age >= KEY_FRAME_MAX_AGE else age + 1
    finally:
        # Like analyse() (pipeline/render.py): an exception mid-loop must
        # still join the prefetch thread and close the native reader.
        pre.close()
        reader.close()
    # One device->host sync for the whole trajectory; translations
    # scale back to full-resolution pixels.
    with prof.stage("collect"):
        params_np = (
            np.asarray(jnp.stack(out), np.float64)
            if out else np.zeros((0, 4))
        )
        params_np[:, :2] *= float(1 << level)
    return Trajectory(
        params=params_np,
        kind="similarity",
        fps=meta.fps,
        width=meta.width,
        height=meta.height,
        source=source,
    )


def similarity_corrections(traj: Trajectory, options) -> np.ndarray:
    """Per-frame sampling transforms (output px -> source px), (T, 4)."""
    t = traj.num_frames
    acc = jnp.asarray(traj.params, jnp.float32)  # (T, 4) accumulated
    if t == 0 or options.stabilise == "none":
        return np.zeros((t, 4), np.float32)
    if options.stabilise == "fixed":
        smooth = jnp.zeros_like(acc)
    else:
        radius = min(options.stabilise_radius, max(t - 1, 1))
        w = jnp.asarray(savgol_weights(radius, 2))
        padded = jnp.concatenate(
            [
                jnp.broadcast_to(acc[:1], (radius, 4)),
                acc,
                jnp.broadcast_to(acc[-1:], (radius, 4)),
            ],
            axis=0,
        )
        smooth = sg_conv(padded, w)
    # Display correction = smooth o acc^-1 (take the frame to its smoothed
    # pose); the sampler needs the inverse map (output px -> source px):
    # sample = corr^-1 = acc o smooth^-1.
    corr = jax.vmap(lambda a, s: compose_similarity(s, invert_similarity(a)))(
        acc, smooth
    )
    sample = jax.vmap(invert_similarity)(corr)
    # vidstabtransform's ``zoom: -stabiliseBuffer`` (src/render.ts:569-570):
    # zoom OUT by buffer percent around the frame centre while stabilising,
    # so corrections reveal borders instead of cropping content. Sampling
    # scale is the display scale's inverse.
    if options.stabilise_buffer:
        z = 1.0 - options.stabilise_buffer / 100.0
        k = 1.0 / max(z, 1e-3)
        cx = (traj.width - 1) / 2.0
        cy = (traj.height - 1) / 2.0
        zoom = jnp.asarray(
            [cx * (1.0 - k), cy * (1.0 - k), 0.0, float(np.log(k))],
            jnp.float32,
        )
        sample = jax.vmap(lambda p: compose_similarity(p, zoom))(sample)
    return np.asarray(sample)


def warp_frame_similarity(y, u, v, sample_params, interp="bilinear",
                          out_size=None):
    """Warp YUV planes by a similarity sampling transform.

    The reference's vidstabtransform asks for bicubic interpolation
    (``src/render.ts:571``) — pass ``interp='bicubic'`` (CLI
    ``--filter vidstab --interp bicubic``) for that exact behavior.
    ``out_size`` (h, w) grows the canvas (the --upsample fold:
    ``pipeline/render.py:encode_2d`` shrinks the sampling log-scale by
    log(upsample/100) to match).
    """
    half = sample_params * jnp.asarray([0.5, 0.5, 1.0, 1.0])
    half_size = (
        None if out_size is None else (out_size[0] // 2, out_size[1] // 2)
    )
    wy = warp_similarity(y, sample_params, interp=interp, out_size=out_size)
    wu = warp_similarity(u - 128.0, half, interp=interp,
                         out_size=half_size) + 128.0
    wv = warp_similarity(v - 128.0, half, interp=interp,
                         out_size=half_size) + 128.0
    return wy, wu, wv


class SimilarityWarper:
    """Fused-Pallas batched warp for the similarity family (TPU encode).

    A 2D similarity is a 3x3 homogeneous pixel matrix, so the rotation
    family's fused kernel runs it UNCHANGED over identity pinhole
    cameras (f=1, c=0): the kernel's rectilinear path computes
    ``M @ (x, y, 1)`` with a perspective divide by the constant 1
    (``ops/affine.similarity_matrix``). Chroma planes use f=0.5
    cameras, which conjugates M into the half-resolution frame —
    exactly the ``params * [0.5, 0.5, 1, 1]`` transform
    :func:`warp_frame_similarity` applies.

    The two-phase design knows every correction up front, so the plan
    probes the CLIP'S OWN extremes (all corner combinations of the
    per-parameter min/max, slightly padded) instead of a worst-case
    rotation budget. Replaces the XLA gather path's ~245 ms/frame at 4K
    (the reference's vidstabtransform runs this loop on CPU,
    ``src/render.ts:546-585``).
    """

    def __init__(self, width: int, height: int, corrections: np.ndarray,
                 interp: str = "bilinear", out_size=None):
        from video_annotator_tpu.camera import Camera, CameraModel
        from video_annotator_tpu.ops.warp_pallas import plan_warp

        if out_size is not None:
            # --upsample fold: a larger canvas whose sampling transforms
            # already carry the shrunken log-scale (encode_2d).
            self.out_h, self.out_w = out_size
        else:
            self.out_w = width - width % 2
            self.out_h = height - height % 2
        self.cam = Camera.make(1.0, 1.0, 0.0, 0.0, width, height,
                               CameraModel.RECTILINEAR)
        # f=0.5, c=0: chroma coordinate x_c unprojects to 2*x_c and the
        # mapped source projects to sx/2 — the exact half-translation
        # conjugation the XLA path uses (not _scaled_camera's
        # pixel-center variant, so both backends match bit-for-bit).
        self.cam_c = Camera.make(0.5, 0.5, 0.0, 0.0, width // 2,
                                 height // 2, CameraModel.RECTILINEAR)

        corr = np.asarray(corrections, np.float64).reshape(-1, 4)
        if corr.shape[0] == 0:
            # An empty trim window still constructs the warper before
            # the frame loop decides there is nothing to warp; plan for
            # the identity instead of crashing on an empty reduction.
            corr = np.zeros((1, 4))
        lo, hi = corr.min(axis=0), corr.max(axis=0)
        pad = np.array([2.0, 2.0, 0.005, 0.01]) + 0.05 * (hi - lo)
        lo, hi = lo - pad, hi + pad

        # Probe set: translation shifts the whole map uniformly — it
        # moves each tile's window ORIGIN (computed per frame by the
        # origin pass) but not its source SPAN, which is what the plan
        # sizes. So probe every (angle, zoom) corner, pairing each with
        # both translation extremes (translation only matters through
        # the out-of-image clipping at borders): 9 probes instead of
        # the full 16-corner product — planning is a ~60 s full-res f64
        # pass per extra probe at 4K on one host core.
        combos = np.asarray([
            (dx, dy, ang, ls)
            for ang in (lo[2], hi[2])
            for ls in (lo[3], hi[3])
            for dx, dy in ((lo[0], lo[1]), (hi[0], hi[1]))
        ])
        # Probe matrices come from the SAME params->matrix mapping the
        # runtime uses (ops/affine.similarity_matrix via matrices()) so
        # plan and kernel can never desynchronize.
        probe_mats = list(self.matrices(combos).astype(np.float64))
        self.plan_y = plan_warp(
            self.cam, self.cam, out_size=(self.out_h, self.out_w),
            interp=interp, probe_mats=probe_mats,
        )
        self.plan_c = plan_warp(
            self.cam_c, self.cam_c,
            out_size=(self.out_h // 2, self.out_w // 2),
            interp=interp, probe_mats=probe_mats,
        )

    @staticmethod
    def matrices(corrections: np.ndarray) -> np.ndarray:
        """(T, 4) params -> (T, 3, 3) f32 matrices for the kernel."""
        from video_annotator_tpu.ops.affine import similarity_matrix

        return np.asarray(
            jax.vmap(similarity_matrix)(
                jnp.asarray(corrections, jnp.float32)
            )
        )

    def warp_yuv_batch(self, ys, us, vs, mats):
        from video_annotator_tpu.ops.warp_pallas import (
            warp_yuv_batch_pallas,
        )

        return warp_yuv_batch_pallas(
            ys, us, vs, mats, self.plan_y, self.cam, self.cam,
            self.plan_c, self.cam_c, self.cam_c,
        )

    def warp_yuv(self, y, u, v, mat):
        """Single-frame fused warp (uint8 planes) — the compare grid's
        per-cell path."""
        from video_annotator_tpu.ops.warp_pallas import warp_yuv_pallas

        return warp_yuv_pallas(
            y, u, v, mat, self.plan_y, self.cam, self.cam,
            self.plan_c, self.cam_c, self.cam_c,
        )

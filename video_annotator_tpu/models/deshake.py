"""The deshake-family stabilizer: global translation + blurred-edge fill.

Equivalent of ffmpeg's ``deshake`` (block-matching global motion,
``src/render.ts:730-771``) and ``deshake_opencl`` (same model with a
``smooth_window_multiplier`` and the edge-blur treatment the reference
builds from a ``geq`` alpha ramp + blur, ``getBlurEdgesPipeline``,
``src/render.ts:773-855``). Motion comes from FFT phase correlation
(branch-free, TPU-dense); borders revealed by the correction are filled
with a blurred copy instead of black.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from video_annotator_tpu.ops.phasecorr import phase_correlate
from video_annotator_tpu.pipeline.profiler import StageProfiler
from video_annotator_tpu.pipeline.trajectory import Trajectory
from video_annotator_tpu.smoothing.savgol import savgol_weights, sg_conv


def analyse_deshake(
    source: str,
    options,
    profiler: Optional[StageProfiler] = None,
) -> Trajectory:
    """Accumulated global translation per frame via phase correlation."""
    from video_annotator_tpu.pipeline.render import open_trimmed

    prof = profiler or StageProfiler()
    reader, meta, first, last = open_trimmed(source, options)
    # --analysis-scale: phase-correlate a box-downsampled level
    # (translations scale back by 2^level at collect time).
    from video_annotator_tpu.pipeline.render import analysis_level

    level = analysis_level(options)
    from video_annotator_tpu.ops.warp_pallas import box_downsample

    @jax.jit
    def track_step(prev_small, gray, acc):
        # d such that curr(x) ~= prev(x - d): camera moved by +d. Runs
        # and accumulates on device — no per-frame host sync (each
        # blocked round trip costs ~30-90 ms over a remote backend).
        small = box_downsample(gray, level).astype(jnp.float32) \
            if level else gray.astype(jnp.float32)
        d, _peak = phase_correlate(small, prev_small)
        return acc + d, small

    @jax.jit
    def first_step(gray):
        return (box_downsample(gray, level) if level else gray).astype(
            jnp.float32
        )

    acc = jnp.zeros(2, jnp.float32)
    out = []
    prev_gray = None
    idx = reader.start_frame - 1
    from video_annotator_tpu.io.prefetch import DevicePrefetcher

    pre = DevicePrefetcher(prof.wrap_iter("decode", iter(reader)),
                           depth=getattr(options, "prefetch_depth", 3))
    for y, _, _ in pre:
        idx += 1
        if idx < first:
            continue
        if idx >= last:
            break
        if prev_gray is None:
            prev_gray = first_step(y)
            out.append(acc)
        else:
            with prof.stage("track"):
                acc, prev_gray = track_step(prev_gray, y, acc)
                out.append(acc)
    pre.close()
    reader.close()
    with prof.stage("collect"):
        params_np = (
            np.asarray(jnp.stack(out), np.float64)
            if out else np.zeros((0, 2))
        )
        params_np *= float(1 << level)
    return Trajectory(
        params=params_np,
        kind="translation",
        fps=meta.fps,
        width=meta.width,
        height=meta.height,
        source=source,
    )


def deshake_corrections(traj: Trajectory, options) -> np.ndarray:
    """Per-frame sampling offsets (output px -> source px), (T, 2)."""
    t = traj.num_frames
    acc = jnp.asarray(traj.params, jnp.float32)
    if options.stabilise == "none":
        return np.zeros((t, 2), np.float32)
    if options.stabilise == "fixed":
        smooth = jnp.zeros_like(acc)
    else:
        radius = min(options.stabilise_radius, max(t - 1, 1))
        w = jnp.asarray(savgol_weights(radius, 2))
        padded = jnp.concatenate(
            [
                jnp.broadcast_to(acc[:1], (radius, 2)),
                acc,
                jnp.broadcast_to(acc[-1:], (radius, 2)),
            ],
            axis=0,
        )
        smooth = sg_conv(padded, w)
    # sample at x_out + (acc - smooth): remove the jitter component.
    return np.asarray(acc - smooth)


def _gauss_blur(img: jax.Array, sigma: float = 8.0) -> jax.Array:
    radius = int(3 * sigma)
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    img_p = jnp.pad(img, ((radius, radius), (0, 0)), mode="edge")
    # vertical pass: columns as the conv batch axis
    v = jax.lax.conv_general_dilated(
        img_p.T[:, None, :], k[None, None, :], (1,), "VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )[:, 0, :].T
    v_p = jnp.pad(v, ((0, 0), (radius, radius)), mode="edge")
    return jax.lax.conv_general_dilated(
        v_p[:, None, :], k[None, None, :], (1,), "VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )[:, 0, :]


@jax.jit
def warp_frame_deshake(y, u, v, offset, blur_edges: bool = True):
    """Translate YUV planes by ``offset`` (x, y), blurred-edge fill."""

    def shift(img, off, fill_blur):
        h, w = img.shape
        ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + off[1]
        xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + off[0]
        from video_annotator_tpu.ops.warp_xla import bilinear_sample

        out = bilinear_sample(img, jnp.stack([xs, ys], axis=-1))
        if fill_blur:
            inside = (
                (xs >= 0) & (xs <= w - 1) & (ys >= 0) & (ys <= h - 1)
            ).astype(jnp.float32)
            bg = _gauss_blur(img)
            # clamp coordinates => replicate-edge sample of the blur
            xc = jnp.clip(xs, 0, w - 1)
            yc = jnp.clip(ys, 0, h - 1)
            bg_s = bilinear_sample(bg, jnp.stack([xc, yc], axis=-1))
            out = inside * out + (1.0 - inside) * bg_s
        return out

    half = offset * 0.5
    wy = shift(y, offset, blur_edges)
    wu = shift(u - 128.0, half, False) + 128.0
    wv = shift(v - 128.0, half, False) + 128.0
    return wy, wu, wv

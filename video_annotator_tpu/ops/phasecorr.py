"""Global translation estimation by phase correlation.

The deshake-family stabilizers (ffmpeg ``deshake`` block search,
``src/render.ts:730-771``; ``deshake_opencl``, ``src/render.ts:857-911``)
estimate a global inter-frame translation. Block matching is
branch-and-search shaped; the TPU-native equivalent is FFT phase
correlation — two 2D FFTs and an argmax, all dense array work — with
subpixel refinement from the correlation peak's neighborhood.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit)
def phase_correlate(a: jax.Array, b: jax.Array):
    """Translation (dx, dy) such that a(x) ~= b(x - d), plus peak response.

    I.e. ``d`` is how far ``a``'s content sits ahead of ``b``'s:
    ``phase_correlate(shifted, original)`` returns the applied shift
    (see ``tests/test_models.py``; ``models/deshake.py`` accumulates
    ``phase_correlate(curr, prev)`` as the camera translation).

    Hann-windowed phase correlation with parabolic subpixel interpolation.
    """
    h, w = a.shape
    wy = jnp.hanning(h)[:, None]
    wx = jnp.hanning(w)[None, :]
    win = wy * wx
    fa = jnp.fft.rfft2(a.astype(jnp.float32) * win)
    fb = jnp.fft.rfft2(b.astype(jnp.float32) * win)
    cross = fa * jnp.conj(fb)
    cross = cross / (jnp.abs(cross) + 1e-9)
    corr = jnp.fft.irfft2(cross, s=(h, w))

    idx = jnp.argmax(corr)
    py = idx // w
    px = idx % w

    def subpixel(c, p, n):
        lo = c[(p - 1) % n]
        hi = c[(p + 1) % n]
        mid = c[p]
        denom = lo - 2 * mid + hi
        off = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (lo - hi) / denom, 0.0)
        return jnp.clip(off, -0.5, 0.5)

    oy = subpixel(corr[:, px], py, h)
    ox = subpixel(corr[py, :], px, w)
    fy = py.astype(jnp.float32) + oy
    fx = px.astype(jnp.float32) + ox
    # wrap to signed shifts
    dy = jnp.where(fy > h / 2, fy - h, fy)
    dx = jnp.where(fx > w / 2, fx - w, fx)
    peak = corr[py, px]
    return jnp.stack([dx, dy]), peak

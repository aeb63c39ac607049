"""Pyramidal Lucas-Kanade as a Pallas TPU kernel (8 points per grid step).

The XLA formulation (``ops/lk.py``) vmaps dynamic slices over points, which
lowers to general gathers — ~58 ms/frame at 1920x1440 on v5e, the analyse
phase's bottleneck. This kernel keeps each point's local windows in VMEM
and implements the per-iteration fractional resample with *dynamic circular
rolls* (the dynamic-addressing primitive Mosaic supports cheaply) plus
static slices: align the window so the patch sits at the origin, then blend
four statically-shifted copies.

Per point: DMA two (48, 256) windows (prev/next; all 16 DMAs of an 8-point
group start before any compute), build the template + Scharr gradients
once, then a fixed refinement loop with two rolls and a bilinear blend per
step. All shapes static.

STATUS: experimental — correct (matches the XLA path to iteration
tolerance) but NOT faster on v5e: Mosaic lowers dynamic *sublane* rotates
at ~7 us per (48, 256) roll, which dominates everything (~160 us per
point-level vs ~75 us for the gather formulation). The production analyse
path keeps ``ops/lk.py``; revisit with a pre-shifted-copies + lax.switch
y-alignment or a batched lane-gather formulation. Measured with
/tmp-style microbenches on 2026-08-16; also note compiled negative
dynamic sublane rolls are WRONG (handled below by taking shifts mod size).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_annotator_tpu.ops.lk import (
    DEF_ITERS,
    DEF_LEVELS,
    MIN_EIG_THRESHOLD,
    WIN,
    build_pyramid,
)

WROWS = 48  # window rows (>= WIN + search slack + roll headroom)
WCOLS = 256  # window cols (2 lane tiles; 128-aligned origins always fit)
PR = 24  # working patch rows (WIN + 3, rounded to sublanes)
HALF = WIN // 2
PGROUP = 8  # points per grid step (output block sublane requirement)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _bilinear_at(A, fy, fx, dy, dx):
    """(PR, 128) patch of rolled window A at static offset (dy, dx),
    fractional (fy, fx)."""
    x00 = A[dy : dy + PR, dx : dx + 128]
    x01 = A[dy : dy + PR, dx + 1 : dx + 129]
    x10 = A[dy + 1 : dy + PR + 1, dx : dx + 128]
    x11 = A[dy + 1 : dy + PR + 1, dx + 1 : dx + 129]
    top = x00 * (1.0 - fx) + x01 * fx
    bot = x10 * (1.0 - fx) + x11 * fx
    return top * (1.0 - fy) + bot * fy


def _make_lk_kernel(iters: int):
    def one_point(i, j, oyp_ref, oxp_ref, oyn_ref, oxn_ref, fpt_ref,
                  wprev, wnext, sem_p, sem_n):
        oyp = oyp_ref[i]
        oxp = oxp_ref[i]
        oyn = oyn_ref[i]
        oxn = oxn_ref[i]
        px = fpt_ref[i, 0]
        py = fpt_ref[i, 1]
        gx = fpt_ref[i, 2]
        gy = fpt_ref[i, 3]

        # Template top-left (continuous) and its window-relative parts.
        ptx = px - HALF
        pty = py - HALF
        ipx = jnp.floor(ptx)
        ipy = jnp.floor(pty)
        fpx = ptx - ipx
        fpy = pty - ipy
        # Rolls are circular, so raw offsets work for any in-image point;
        # out-of-image points produce garbage that the bounds mask kills.
        ry = ipy.astype(jnp.int32) - oyp
        rx = ipx.astype(jnp.int32) - oxp

        pltpu.make_async_copy(wprev.at[j], wprev.at[j], sem_p.at[j]).wait()
        # Align: patch top-left (minus 1 for gradient halo) to the origin.
        # Compiled dynamic sublane rolls require non-negative shifts
        # (negative shifts silently misbehave); roll left by s == roll
        # right by size - s.
        sy_ = jnp.remainder(-(ry - 1), WROWS)
        sx_ = jnp.remainder(-(rx - 1), WCOLS)
        A = pltpu.roll(pltpu.roll(wprev[j], sy_, 0), sx_, 1)
        tpl = _bilinear_at(A, fpy, fpx, 1, 1)
        # Scharr gradients ([3,10,3]/16 smoothing x [-1,0,1]/2 derivative).
        tm = _bilinear_at(A, fpy, fpx, 0, 0)
        t0 = _bilinear_at(A, fpy, fpx, 0, 1)
        tp = _bilinear_at(A, fpy, fpx, 0, 2)
        bm = _bilinear_at(A, fpy, fpx, 2, 0)
        b0 = _bilinear_at(A, fpy, fpx, 2, 1)
        bp = _bilinear_at(A, fpy, fpx, 2, 2)
        ml = _bilinear_at(A, fpy, fpx, 1, 0)
        mr = _bilinear_at(A, fpy, fpx, 1, 2)
        gx_img = (3.0 * (tp - tm) + 10.0 * (mr - ml) + 3.0 * (bp - bm)) / 32.0
        gy_img = (3.0 * (bm - tm) + 10.0 * (b0 - t0) + 3.0 * (bp - tp)) / 32.0

        rows = jax.lax.broadcasted_iota(jnp.int32, (PR, 128), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (PR, 128), 1)
        mask = ((rows < WIN) & (cols < WIN)).astype(jnp.float32)
        gx_img = gx_img * mask
        gy_img = gy_img * mask
        tpl = tpl * mask

        gxx = jnp.sum(gx_img * gx_img)
        gxy = jnp.sum(gx_img * gy_img)
        gyy = jnp.sum(gy_img * gy_img)
        det = gxx * gyy - gxy * gxy
        trace = gxx + gyy
        min_eig = (
            trace - jnp.sqrt(jnp.maximum(trace * trace - 4 * det, 0.0))
        ) * 0.5
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)

        pltpu.make_async_copy(wnext.at[j], wnext.at[j], sem_n.at[j]).wait()
        wn = wnext[j]

        def body(_, v):
            vx, vy = v
            nx_ = px + vx - HALF
            ny_ = py + vy - HALF
            inx = jnp.floor(nx_)
            iny = jnp.floor(ny_)
            fnx = nx_ - inx
            fny = ny_ - iny
            cry = iny.astype(jnp.int32) - oyn
            crx = inx.astype(jnp.int32) - oxn
            B = pltpu.roll(
                pltpu.roll(wn, jnp.remainder(-cry, WROWS), 0),
                jnp.remainder(-crx, WCOLS), 1,
            )
            cur = _bilinear_at(B, fny, fnx, 0, 0) * mask
            r = cur - tpl
            bx = jnp.sum(r * gx_img)
            by = jnp.sum(r * gy_img)
            dvx = (gyy * bx - gxy * by) * inv_det
            dvy = (gxx * by - gxy * bx) * inv_det
            return (vx - dvx, vy - dvy)

        vx, vy = jax.lax.fori_loop(0, iters, body, (gx, gy))

        ok_g = (min_eig / (WIN * WIN) > MIN_EIG_THRESHOLD).astype(jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        return jnp.where(
            col == 0, vx, jnp.where(col == 1, vy, jnp.where(col == 2, ok_g, 0.0))
        )

    def kernel(oyp_ref, oxp_ref, oyn_ref, oxn_ref, fpt_ref,
               prev_hbm, next_hbm, out_ref, wprev, wnext, sem_p, sem_n):
        g = pl.program_id(0)
        # Start all 16 window DMAs of this 8-point group before any compute.
        for j in range(PGROUP):
            i = g * PGROUP + j
            oyp = pl.multiple_of(oyp_ref[i], 8)
            oxp = pl.multiple_of(oxp_ref[i], 128)
            oyn = pl.multiple_of(oyn_ref[i], 8)
            oxn = pl.multiple_of(oxn_ref[i], 128)
            pltpu.make_async_copy(
                prev_hbm.at[pl.ds(oyp, WROWS), pl.ds(oxp, WCOLS)],
                wprev.at[j], sem_p.at[j],
            ).start()
            pltpu.make_async_copy(
                next_hbm.at[pl.ds(oyn, WROWS), pl.ds(oxn, WCOLS)],
                wnext.at[j], sem_n.at[j],
            ).start()

        out_rows = [
            one_point(g * PGROUP + j, j, oyp_ref, oxp_ref, oyn_ref, oxn_ref,
                      fpt_ref, wprev, wnext, sem_p, sem_n)
            for j in range(PGROUP)
        ]
        out_ref[...] = jnp.concatenate(out_rows, axis=0)

    return kernel


@functools.partial(jax.jit, static_argnames=("shape", "iters", "interpret"))
def _lk_level_pallas(
    prev_pad: jax.Array,  # (hp, wp) padded level image
    next_pad: jax.Array,
    pts: jax.Array,  # (N, 2) level coords; N multiple of PGROUP
    guess: jax.Array,  # (N, 2)
    shape: Tuple[int, int],  # padded shape (static)
    iters: int = DEF_ITERS,
    interpret: bool = False,
):
    hp, wp = shape
    n = pts.shape[0]
    assert n % PGROUP == 0, n

    # Window origins (aligned); circular rolls absorb any in-window offset.
    ipx = jnp.floor(pts[:, 0] - HALF).astype(jnp.int32)
    ipy = jnp.floor(pts[:, 1] - HALF).astype(jnp.int32)
    oxp = jnp.clip(((ipx - 1) // 128) * 128, 0, max(wp - WCOLS, 0))
    oyp = jnp.clip(((ipy - 9) // 8) * 8, 0, max(hp - WROWS, 0))
    inx = jnp.floor(pts[:, 0] + guess[:, 0] - HALF).astype(jnp.int32)
    iny = jnp.floor(pts[:, 1] + guess[:, 1] - HALF).astype(jnp.int32)
    oxn = jnp.clip(((inx - 1) // 128) * 128, 0, max(wp - WCOLS, 0))
    oyn = jnp.clip(((iny - 9) // 8) * 8, 0, max(hp - WROWS, 0))

    fpt = jnp.stack([pts[:, 0], pts[:, 1], guess[:, 0], guess[:, 1]], axis=-1)

    kernel = _make_lk_kernel(iters)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n // PGROUP,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (PGROUP, 128), lambda g, *pf: (g, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((PGROUP, WROWS, WCOLS), jnp.float32),
            pltpu.VMEM((PGROUP, WROWS, WCOLS), jnp.float32),
            pltpu.SemaphoreType.DMA((PGROUP,)),
            pltpu.SemaphoreType.DMA((PGROUP,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(oyp, oxp, oyn, oxn, fpt, prev_pad, next_pad)
    return out[:, 0], out[:, 1], out[:, 2] > 0.5


def pyramidal_lk_pallas(
    prev_img: jax.Array,
    next_img: jax.Array,
    points: jax.Array,  # (N, 2)
    valid: jax.Array,  # (N,)
    levels: int = DEF_LEVELS,
    iters: int = DEF_ITERS,
    interpret: bool = False,
):
    """Drop-in replacement for :func:`ops.lk.pyramidal_lk` on TPU."""
    h, w = prev_img.shape
    n = points.shape[0]
    pad_n = _round_up(n, PGROUP) - n
    pts_p = jnp.pad(points, ((0, pad_n), (0, 0)), constant_values=2.0 * HALF)

    pyr_prev = build_pyramid(prev_img, levels)
    pyr_next = build_pyramid(next_img, levels)

    flow = pts_p * 0.0
    status = valid
    for lvl in range(levels - 1, -1, -1):
        ph, pw = pyr_prev[lvl].shape
        if ph < WROWS or pw < WCOLS:
            continue  # tiny level: keep coarse guess
        hp = _round_up(ph, 8)
        wp = _round_up(pw, 128)
        prev_pad = jnp.pad(pyr_prev[lvl], ((0, hp - ph), (0, wp - pw)))
        next_pad = jnp.pad(pyr_next[lvl], ((0, hp - ph), (0, wp - pw)))
        scale = 2.0**lvl
        vx, vy, ok = _lk_level_pallas(
            prev_pad, next_pad, pts_p / scale, flow / scale, (hp, wp),
            iters, interpret,
        )
        flow = jnp.stack([vx, vy], axis=-1) * scale
        status = status & ok[:n]

    new_pts = points + flow[:n]
    half = float(HALF)
    in_bounds = (
        (points[:, 0] >= half) & (points[:, 0] < w - half)
        & (points[:, 1] >= half) & (points[:, 1] < h - half)
        & (new_pts[:, 0] >= half) & (new_pts[:, 0] < w - half)
        & (new_pts[:, 1] >= half) & (new_pts[:, 1] < h - half)
    )
    return new_pts, status & in_bounds

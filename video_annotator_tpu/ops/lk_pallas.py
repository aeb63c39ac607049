"""Pyramidal Lucas-Kanade as a Pallas TPU kernel (8 points per grid step).

Replaces the XLA formulation for the analyse hot loop: ``ops/lk.py`` vmaps
dynamic slices over points, which lowers to general gathers over the full
image — ~68 ms/frame at 1920x1440 on v5e, the analyse-phase bottleneck
(the reference's ``cv::calcOpticalFlowPyrLK``,
``opencv/FrameSourceWarp.cpp:252-259``, is its GPU hot spot too).

TPU-native design — everything is resolved with the two dynamic-addressing
primitives the hardware does well (per-sublane lane gathers and variable
byte shifts), batched 8 points per vector op:

1. Pyramid levels are quad-row byte-packed into strip-major int32 words
   (the fused warp kernel's layout, ``pack_frame_words``): word (s, r, c)
   holds pixel rows 4r..4r+3 of column 128s + c. LK tolerates the uint8
   rounding — cv2's own tracking pyramids are uint8.
2. Each grid step tracks 8 points (sublanes). Per point, one 3D DMA
   fetches a (2 strips, 20 words, 128) window around the point (prev) /
   point+guess (next); origins are scalar-prefetched, 8-word aligned in y
   (Mosaic DMA constraint) and strip-aligned in x.
3. The y alignment residue (0..7 words, per point) is removed ONCE by an
   8-candidate masked select into an aligned scratch window — after that
   every patch row lives within a small static word range, so nothing
   ever needs dynamic sublane addressing (the old roll-based kernel spent
   ~7 us per dynamic sublane roll, per point, per iteration).
4. A patch row sample is then: one masked lane gather per 128-column
   section with per-point column indices (take_along_axis gathers
   per-sublane independently), a static lane roll for the x+1 tap, a
   per-point word select over a small static candidate range, and
   per-point variable byte shifts for the in-word row — exact bilinear on
   the uint8 data.
5. The template's Scharr gradients come from one supersampled patch via
   static row/lane shifts; iterations run the classic Newton update with
   the template-side gradient matrix (cv2 semantics).
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
from video_annotator_tpu.ops.warp_pallas import pack_frame_words

HALF = WIN // 2
PAD = 6  # iteration drift allowance (pixels) inside the one-shot window
PGROUP = 8  # points per grid step
NSTRIP = 2  # 128-column strips per window
WCOLS = NSTRIP * 128
DMA_WORDS = 20  # DMA'd word rows: aligned span + 8-word alignment residue
AW = 12  # aligned window word rows (48 pixel rows >= patch + drift + frac)
PROWS = WIN + 4  # supersampled template rows (halo for Scharr + bilinear)
# Template patch row -1 (gradient halo) offset inside the aligned window:
# construction places its floor at PAD + the word phase (0..3).
RY0 = PAD


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _make_lk_kernel(iters: int):
    def kernel(oyp_ref, sxp_ref, oyn_ref, sxn_ref, fpt_ref,
               prev_hbm, next_hbm, out_ref,
               wprev, wnext, aprev, anext, tpl_s, gx_s, gy_s, sem_p, sem_n):
        g = pl.program_id(0)
        for j in range(PGROUP):
            i = g * PGROUP + j
            oyp = pl.multiple_of(oyp_ref[i], 8)
            oyn = pl.multiple_of(oyn_ref[i], 8)
            pltpu.make_async_copy(
                prev_hbm.at[pl.ds(sxp_ref[i], NSTRIP), pl.ds(oyp, DMA_WORDS), :],
                wprev.at[j], sem_p.at[j],
            ).start()
            pltpu.make_async_copy(
                next_hbm.at[pl.ds(sxn_ref[i], NSTRIP), pl.ds(oyn, DMA_WORDS), :],
                wnext.at[j], sem_n.at[j],
            ).start()

        # Per-point quantities as (PGROUP, 1) vectors. fpt lanes:
        # 0: gx0, 1: gy0, 2: bwp, 3: ryp, 4: ixp, 5: bwn, 6: ryn, 7: ixn
        fpt = fpt_ref[...]  # (PGROUP, 128)
        gx0 = fpt[:, 0:1]
        gy0 = fpt[:, 1:2]
        bwp = fpt[:, 2:3].astype(jnp.int32)
        ryp = fpt[:, 3:4]
        ixp = fpt[:, 4:5]
        bwn = fpt[:, 5:6].astype(jnp.int32)
        ryn = fpt[:, 6:7]
        ixn = fpt[:, 7:8]

        for j in range(PGROUP):
            pltpu.make_async_copy(wprev.at[j], wprev.at[j], sem_p.at[j]).wait()
            pltpu.make_async_copy(wnext.at[j], wnext.at[j], sem_n.at[j]).wait()

        # --- word-align both windows (8-candidate select, once) ----------
        def align(src, dst, bw):
            masks = [bw == c for c in range(8)]
            for r in range(AW):
                for s in range(NSTRIP):
                    acc = jnp.zeros((PGROUP, 128), jnp.int32)
                    for c in range(8):
                        acc = jnp.where(masks[c], src[:, s, r + c, :], acc)
                    dst[r, :, s * 128 : (s + 1) * 128] = acc

        align(wprev, aprev, bwp)
        align(wnext, anext, bwn)

        lanes = jax.lax.broadcasted_iota(jnp.int32, (PGROUP, 128), 1)
        colmask = (lanes < WIN).astype(jnp.float32)

        def sample_rows(awin, ry, ix, nrows, ylo, yhi):
            """Rows of the aligned window, bilinear in x.

            Row k (k = 0..nrows-1) is the image at pixel row floor(ry)+k,
            fractional column ix+lane, for every point (sublane). ylo/yhi
            statically bound floor(ry) so the per-point word select runs
            over a small static candidate range. The vertical fraction is
            the caller's to blend (rows k, k+1 bracket ry+k).
            """
            iy = jnp.floor(ry).astype(jnp.int32)  # (PG,1) in [ylo, yhi]
            ixi = jnp.floor(ix).astype(jnp.int32)
            fx = (ix - jnp.floor(ix)).astype(jnp.float32)
            idx = ixi + lanes  # (PG, 128) per-point column indices
            w_lo = ylo // 4
            w_hi = min((yhi + nrows - 1) // 4, AW - 1)
            gathered = {}
            shifted = {}
            for w in range(w_lo, w_hi + 1):
                acc = jnp.zeros((PGROUP, 128), jnp.int32)
                for s in range(NSTRIP):
                    local = idx - s * 128
                    inside = local.astype(jnp.uint32) < jnp.uint32(128)
                    gval = jnp.take_along_axis(
                        awin[w, :, s * 128 : (s + 1) * 128], local & 127,
                        axis=1,
                    )
                    acc = acc + jnp.where(inside, gval, 0)
                gathered[w] = acc
                # x+1 tap: lane l of the roll holds column idx + l + 1.
                shifted[w] = jnp.roll(acc, -1, axis=1)
            rows = []
            for k in range(nrows):
                flat = iy + k  # (PG,1), in [ylo+k, yhi+k]
                sh = (flat & 3) << 3
                wsel = flat >> 2
                c0 = (ylo + k) // 4
                c1 = min((yhi + k) // 4, AW - 1)
                g0 = gathered[c0]
                g1 = shifted[c0]
                for c in range(c0 + 1, c1 + 1):
                    hit = wsel == c
                    g0 = jnp.where(hit, gathered[c], g0)
                    g1 = jnp.where(hit, shifted[c], g1)
                v0 = ((g0 >> sh) & 0xFF).astype(jnp.float32)
                v1 = ((g1 >> sh) & 0xFF).astype(jnp.float32)
                rows.append(v0 * (1.0 - fx) + v1 * fx)
            return rows

        # --- template + Scharr gradients (prev window, once) -------------
        # Supersample PROWS rows x 128 cols one row/col above-left of the
        # patch (gradient halo); ryp's floor is RY0 + word phase (0..3).
        fyp = (ryp - jnp.floor(ryp)).astype(jnp.float32)
        sup = sample_rows(aprev, ryp, ixp - 1.0, PROWS, RY0, RY0 + 3)
        rows = [
            sup[k] * (1.0 - fyp) + sup[k + 1] * fyp for k in range(PROWS - 1)
        ]
        # rows[k] = image at patch row k-1, lane l = patch col l-1.
        shift1 = lambda a: jnp.roll(a, -1, axis=1)  # noqa: E731
        shift2 = lambda a: jnp.roll(a, -2, axis=1)  # noqa: E731
        for k in range(WIN):
            tm, t0, tp = rows[k], shift1(rows[k]), shift2(rows[k])
            m0 = shift1(rows[k + 1])
            mm, mp = rows[k + 1], shift2(rows[k + 1])
            bm, b0, bp = rows[k + 2], shift1(rows[k + 2]), shift2(rows[k + 2])
            gx_k = (3.0 * (tp - tm) + 10.0 * (mp - mm) + 3.0 * (bp - bm)) / 32.0
            gy_k = (3.0 * (bm - tm) + 10.0 * (b0 - t0) + 3.0 * (bp - tp)) / 32.0
            tpl_s[k] = m0 * colmask
            gx_s[k] = gx_k * colmask
            gy_s[k] = gy_k * colmask

        gxx = jnp.zeros((PGROUP, 1), jnp.float32)
        gxy = jnp.zeros((PGROUP, 1), jnp.float32)
        gyy = jnp.zeros((PGROUP, 1), jnp.float32)
        for k in range(WIN):
            gx_k = gx_s[k]
            gy_k = gy_s[k]
            gxx += jnp.sum(gx_k * gx_k, axis=1, keepdims=True)
            gxy += jnp.sum(gx_k * gy_k, axis=1, keepdims=True)
            gyy += jnp.sum(gy_k * gy_k, axis=1, keepdims=True)
        det = gxx * gyy - gxy * gxy
        trace = gxx + gyy
        min_eig = (
            trace - jnp.sqrt(jnp.maximum(trace * trace - 4.0 * det, 0.0))
        ) * 0.5
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)

        # --- iterations (next window) ------------------------------------
        # The window was fetched around point+guess; flow v samples at
        # offset (ryn, ixn) + (v - guess), clamped into the window.
        # (The XLA path re-fetches per iteration — unbounded drift, cv2
        # semantics; here drift beyond the padding clears status below.)
        y_hi = float(4 * AW - WIN - 3)
        x_hi = float(WCOLS - WIN - 2)

        def body(_, v):
            vx, vy = v
            # ryn points at patch row -1 (the gradient halo row, matching
            # the template supersample); the iteration patch starts at
            # row 0, hence the +1.
            oy = jnp.clip(ryn + 1.0 + (vy - gy0), 1.0, y_hi)
            ox = jnp.clip(ixn + (vx - gx0), 1.0, x_hi)
            fy = (oy - jnp.floor(oy)).astype(jnp.float32)
            cur_rows = sample_rows(
                anext, oy, ox, WIN + 1, 1, int(y_hi)
            )
            bx = jnp.zeros((PGROUP, 1), jnp.float32)
            by = jnp.zeros((PGROUP, 1), jnp.float32)
            for k in range(WIN):
                cur = cur_rows[k] * (1.0 - fy) + cur_rows[k + 1] * fy
                r = cur * colmask - tpl_s[k]
                bx += jnp.sum(r * gx_s[k], axis=1, keepdims=True)
                by += jnp.sum(r * gy_s[k], axis=1, keepdims=True)
            dvx = (gyy * bx - gxy * by) * inv_det
            dvy = (gxx * by - gxy * bx) * inv_det
            return (vx - dvx, vy - dvy)

        ones = jnp.ones((PGROUP, 1), jnp.float32)
        vx, vy = jax.lax.fori_loop(0, iters, body, (gx0 * ones, gy0 * ones))

        # Honest status under drift saturation: the window is fetched
        # once around point+guess, so recoverable drift is bounded by
        # its padding. Under large coherent motion (a whip pan) every
        # point clamps identically and the shared wrong flow would sail
        # through RANSAC — fail the track instead (the pipeline then
        # falls back like the reference does on tracking failure,
        # opencv/FrameSourceWarp.cpp:432-438).
        oy_want = ryn + 1.0 + (vy - gy0)
        ox_want = ixn + (vx - gx0)
        unsat = (
            (oy_want >= 1.0) & (oy_want <= y_hi)
            & (ox_want >= 1.0) & (ox_want <= x_hi)
        )
        ok = (
            (min_eig / float(WIN * WIN) > MIN_EIG_THRESHOLD) & unsat
        ).astype(jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (PGROUP, 128), 1)
        out_ref[...] = jnp.where(
            col == 0, vx, jnp.where(col == 1, vy, jnp.where(col == 2, ok, 0.0))
        )

    return kernel


def _origins(p, wstrips, hwords):
    """Window origin + in-window offsets for positions ``p`` (N, 2).

    Returns ``(oy, sx, bw, ry, ixw, ok)``. ``ok`` asserts the kernel's
    actual contracts ON THE CLAMPED origins — ``floor(ry)`` inside
    sample_rows' static candidate range [RY0, RY0+3] and the halo patch
    columns inside the window — so a point whose origin clamped against
    an image edge but whose span still FITS the clamped window tracks
    normally (a stricter did-anything-clamp gate killed every point in
    the last 128-column strip / final 8-word band of each level: ~16%
    of the width at 1280 wide). ``ok`` is False only when the span
    genuinely cannot fit (too close to the edge), matching cv2's border
    behavior; clamped values stay bounded AND aligned so the kernel
    still executes safely on masked points.
    """
    ix = jnp.floor(p[:, 0]).astype(jnp.int32)
    iy = jnp.floor(p[:, 1]).astype(jnp.int32)
    # x: strip-align so patch col -1 (gradient halo) stays inside.
    sx0 = (ix - (HALF + PAD + 1)) // 128
    sx = jnp.clip(sx0, 0, max(wstrips - NSTRIP, 0))
    # y: first needed pixel row is iy - HALF - 1 - PAD (halo + drift); its
    # word, then the 8-word DMA alignment, leaves residue bw in [0, 8).
    wy = (iy - (HALF + 1 + PAD)) // 4
    oy0 = (wy // 8) * 8
    oy = jnp.clip(oy0, 0, max(((hwords - DMA_WORDS) // 8) * 8, 0))
    bw = jnp.clip(wy - oy, 0, 7)
    # Patch row -1 (gradient halo, y = p_y - HALF - 1) as a fractional
    # pixel offset inside the ALIGNED window.
    ry = p[:, 1] - float(HALF + 1) - ((oy + bw) * 4).astype(jnp.float32)
    ixw = p[:, 0] - (sx * 128).astype(jnp.float32) - float(HALF)
    fry = jnp.floor(ry)
    ok = (
        (fry >= float(RY0)) & (fry <= float(RY0 + 3))
        # Halo sampling gathers columns floor(ixw)-1 .. floor(ixw)+WIN+1
        # (+1 more for the x+1 tap roll): keep them inside the window.
        & (ixw >= 1.0) & (ixw <= float(WCOLS - WIN - 3))
    )
    return oy, sx, bw, ry, ixw, ok


@functools.partial(
    jax.jit, static_argnames=("words_shape", "iters", "interpret")
)
def _lk_level_pallas(
    prev_words: jax.Array,  # (wstrips, hwords, 128) int32 packed level
    next_words: jax.Array,
    pts: jax.Array,  # (N, 2) level coords; N multiple of PGROUP
    guess: jax.Array,  # (N, 2)
    words_shape: Tuple[int, int],
    iters: int = DEF_ITERS,
    interpret: bool = False,
):
    wstrips, hwords = words_shape
    n = pts.shape[0]
    assert n % PGROUP == 0, n

    oyp, sxp, bwp, ryp, ixp, okp = _origins(pts, wstrips, hwords)
    tgt = pts + guess
    oyn, sxn, bwn, ryn, ixn, okn = _origins(tgt, wstrips, hwords)

    cols = [
        guess[:, 0],
        guess[:, 1],
        bwp.astype(jnp.float32),
        ryp,
        ixp,
        bwn.astype(jnp.float32),
        ryn,
        ixn,
    ]
    fpt = jnp.stack(
        cols + [jnp.zeros((n,), jnp.float32)] * (128 - len(cols)), axis=-1
    )

    kernel = _make_lk_kernel(iters)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n // PGROUP,),
        in_specs=[
            pl.BlockSpec(
                (PGROUP, 128), lambda g, *pf: (g, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (PGROUP, 128), lambda g, *pf: (g, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((PGROUP, NSTRIP, DMA_WORDS, 128), jnp.int32),
            pltpu.VMEM((PGROUP, NSTRIP, DMA_WORDS, 128), jnp.int32),
            pltpu.VMEM((AW, PGROUP, WCOLS), jnp.int32),
            pltpu.VMEM((AW, PGROUP, WCOLS), jnp.int32),
            pltpu.VMEM((WIN, PGROUP, 128), jnp.float32),
            pltpu.VMEM((WIN, PGROUP, 128), jnp.float32),
            pltpu.VMEM((WIN, PGROUP, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((PGROUP,)),
            pltpu.SemaphoreType.DMA((PGROUP,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(oyp, sxp, oyn, sxn, fpt, prev_words, next_words)
    # Edge points whose windows clamped ran with safe-but-wrong origins:
    # their flow is garbage by construction — fail the track (cv2 marks
    # border-straddling points st=0 the same way).
    return out[:, 0], out[:, 1], (out[:, 2] > 0.5) & okp & okn


@functools.partial(
    jax.jit, static_argnames=("levels", "interpret")
)
def lk_pack_pyramid(
    img: jax.Array,
    levels: int = DEF_LEVELS,
    interpret: bool = False,
):
    """Packed quad-row word pyramid for the LK kernel, built ONCE.

    A tracked frame participates in TWO consecutive LK calls (as `next`,
    then as `prev`); rebuilding the pyramid + pack each call doubles the
    dense per-frame work. The analyse loop carries this tuple instead of
    the raw luma. Levels too small for the kernel's window DMA pack to
    ``None`` (a static pytree hole — the level loop keeps its coarse
    guess there, exactly like the unpacked path).
    """
    pyr = build_pyramid(img, levels)
    packed = []
    for lvl in range(levels):
        ph, pw = pyr[lvl].shape
        if ph < 4 * DMA_WORDS + 32 or pw < WCOLS:
            packed.append(None)  # tiny level: keep coarse guess
            continue
        # Pallas bitcast pack on chip (the XLA fallback pack is ~10x
        # slower and runs 6x per frame here: 2 images x 3 levels).
        words = pack_frame_words(pyr[lvl], ph, pw, use_kernel=not interpret)
        # 8 extra edge-replicated word rows: the DMA always reads
        # DMA_WORDS rows from an 8-ALIGNED origin, so without slack the
        # bottom ~8 word rows (32 px) of every level are unreachable —
        # points there failed even though their span fits the image.
        # Replication mimics cv2's border behavior for the drift tail.
        words = jnp.concatenate(
            [words, jnp.repeat(words[:, -1:], 8, axis=1)], axis=1)
        packed.append(words)
    return tuple(packed)


@functools.partial(
    jax.jit, static_argnames=("img_shape", "iters", "interpret")
)
def pyramidal_lk_pallas_packed(
    packed_prev,
    packed_next,
    img_shape: Tuple[int, int],
    points: jax.Array,  # (N, 2)
    valid: jax.Array,  # (N,)
    iters: int = DEF_ITERS,
    interpret: bool = False,
):
    """LK on prebuilt packed pyramids (see :func:`lk_pack_pyramid`).

    Identical math to :func:`pyramidal_lk_pallas` — the wrapper is that
    function with the pyramid build hoisted out so callers can reuse the
    previous frame's pyramid from their carry.
    """
    h, w = img_shape
    n = points.shape[0]
    pad_n = _round_up(n, PGROUP) - n
    pts_p = jnp.pad(points, ((0, pad_n), (0, 0)), constant_values=4.0 * HALF)

    flow = pts_p * 0.0
    status = valid
    for lvl in range(len(packed_prev) - 1, -1, -1):
        pwords = packed_prev[lvl]
        nwords = packed_next[lvl]
        if pwords is None or nwords is None:
            continue  # tiny level: keep coarse guess
        scale = 2.0**lvl
        vx, vy, ok = _lk_level_pallas(
            pwords, nwords, pts_p / scale, flow / scale,
            (pwords.shape[0], pwords.shape[1]), iters, interpret,
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


@functools.partial(
    jax.jit, static_argnames=("levels", "iters", "interpret")
)
def pyramidal_lk_pallas(
    prev_img: jax.Array,
    next_img: jax.Array,
    points: jax.Array,  # (N, 2)
    valid: jax.Array,  # (N,)
    levels: int = DEF_LEVELS,
    iters: int = DEF_ITERS,
    interpret: bool = False,
):
    """Drop-in replacement for :func:`ops.lk.pyramidal_lk` on TPU.

    Jitted end-to-end: the pyramid build, packing, and the three level
    kernels fuse into one executable (eagerly dispatching the ~10
    intermediate ops costs ~40 ms over the remote backend).
    """
    packed_prev = lk_pack_pyramid(prev_img, levels, interpret)
    packed_next = lk_pack_pyramid(next_img, levels, interpret)
    return pyramidal_lk_pallas_packed(
        packed_prev, packed_next, prev_img.shape, points, valid,
        iters, interpret,
    )


# --------------------------------------------------------------------------
# Batched-pairs LK: every adjacent frame pair of a chunk in ONE kernel
# launch per level (the paired analyse mode's hot path).
#
# The per-frame path above launches ~3 level kernels per frame inside a
# sequential lax.scan; at ~200 points per frame each launch runs a
# 25-step grid — launch/pipeline overhead dominates and the chip idles
# between frames. Tracking T pairs is the same per-point math over T
# different images, and the kernel's only image addressing is the
# scalar-prefetched window origin — so stacking every frame's packed
# level along the WORD-ROW axis (each frame's band padded exactly like
# the per-frame pack, band stride a multiple of the 8-word DMA
# alignment) lets ONE launch with a T*N-point grid track all pairs:
# per-point origins are computed with the per-frame clamping rules and
# relocated into frame t's band by adding t * stride word rows. Points
# and flows stay in per-frame coordinates throughout; the same tall
# array serves as both prev (band t) and next (band t+1) operand.
# --------------------------------------------------------------------------


def lk_pack_pyramid_pairs(
    imgs: jax.Array,  # (T, H, W) luma frames
    levels: int = DEF_LEVELS,
    interpret: bool = False,
):
    """Tall-stack packed word pyramids for a chunk of T frames.

    Returns a tuple over levels: ``None`` for levels too small for the
    kernel (the pairs tracker keeps its coarse guess there, like the
    per-frame path), else a (wstrips, T * stride, 128) tall word array.
    The per-frame band stride (== the word-row count the clamping rules
    see, including the same 8 replicated slack rows
    :func:`lk_pack_pyramid` appends; always a multiple of 8) is a static
    shape fact — consumers recover it as ``words.shape[1] // T`` — so
    the pytree holds only arrays and survives being returned from a jit.
    """
    t = imgs.shape[0]
    pyr = jax.vmap(lambda im: tuple(build_pyramid(im, levels)))(imgs)
    packed = []
    for lvl in range(levels):
        ph, pw = pyr[lvl].shape[1], pyr[lvl].shape[2]
        if ph < 4 * DMA_WORDS + 32 or pw < WCOLS:
            packed.append(None)
            continue
        # vmap extends the pack kernel's grid with the frame axis: ONE
        # launch packs all T frames of a level (a lax.map here costs
        # T x 3 separate kernel launches per chunk).
        words = jax.vmap(
            lambda f: pack_frame_words(f, ph, pw,
                                       use_kernel=not interpret)
        )(pyr[lvl])  # (T, wstrips, hw, 128); hw = round_up(ph, 32)/4, mult of 8
        words = jnp.concatenate(
            [words, jnp.repeat(words[:, :, -1:], 8, axis=2)], axis=2
        )  # same bottom slack as lk_pack_pyramid, per band
        stride = words.shape[2]
        tall = jnp.transpose(words, (1, 0, 2, 3)).reshape(
            words.shape[1], t * stride, 128
        )
        packed.append(tall)
    return tuple(packed)


@functools.partial(
    jax.jit,
    static_argnames=("words_shape", "band_stride", "iters", "interpret"),
)
def _lk_level_pallas_pairs(
    words: jax.Array,  # (wstrips, T*band_stride, 128) tall packed level
    pts: jax.Array,  # (M, 2) level coords, per-frame frame-local
    band: jax.Array,  # (M,) int32 prev-frame band index (next = band + 1)
    guess: jax.Array,  # (M, 2)
    words_shape: Tuple[int, int],  # (wstrips, hwords_frame)
    band_stride: int,
    iters: int = DEF_ITERS,
    interpret: bool = False,
):
    """:func:`_lk_level_pallas` with both windows relocated into their
    frame's band of the tall stack. Origins use the PER-FRAME clamping
    rules (identical ok-gates and in-band clamps to the per-frame path),
    then shift by a multiple-of-8 word offset — the kernel is reused
    unchanged, reading prev from band ``t`` and next from band ``t+1``
    of the same array."""
    wstrips, hwords = words_shape
    n = pts.shape[0]
    assert n % PGROUP == 0, n
    assert band_stride % 8 == 0, band_stride

    oyp, sxp, bwp, ryp, ixp, okp = _origins(pts, wstrips, hwords)
    tgt = pts + guess
    oyn, sxn, bwn, ryn, ixn, okn = _origins(tgt, wstrips, hwords)
    oyp = oyp + band * band_stride
    oyn = oyn + (band + 1) * band_stride

    cols = [
        guess[:, 0],
        guess[:, 1],
        bwp.astype(jnp.float32),
        ryp,
        ixp,
        bwn.astype(jnp.float32),
        ryn,
        ixn,
    ]
    fpt = jnp.stack(
        cols + [jnp.zeros((n,), jnp.float32)] * (128 - len(cols)), axis=-1
    )

    kernel = _make_lk_kernel(iters)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n // PGROUP,),
        in_specs=[
            pl.BlockSpec(
                (PGROUP, 128), lambda g, *pf: (g, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (PGROUP, 128), lambda g, *pf: (g, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((PGROUP, NSTRIP, DMA_WORDS, 128), jnp.int32),
            pltpu.VMEM((PGROUP, NSTRIP, DMA_WORDS, 128), jnp.int32),
            pltpu.VMEM((AW, PGROUP, WCOLS), jnp.int32),
            pltpu.VMEM((AW, PGROUP, WCOLS), jnp.int32),
            pltpu.VMEM((WIN, PGROUP, 128), jnp.float32),
            pltpu.VMEM((WIN, PGROUP, 128), jnp.float32),
            pltpu.VMEM((WIN, PGROUP, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((PGROUP,)),
            pltpu.SemaphoreType.DMA((PGROUP,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(oyp, sxp, oyn, sxn, fpt, words, words)
    return out[:, 0], out[:, 1], (out[:, 2] > 0.5) & okp & okn


def pyramidal_lk_pallas_pairs(
    packed,
    img_shape: Tuple[int, int],
    points: jax.Array,  # (P, N, 2): pair p tracks frame p -> frame p+1
    valid: jax.Array,  # (P, N)
    iters: int = DEF_ITERS,
    interpret: bool = False,
):
    """Track N points through each of P adjacent pairs in one launch per
    level. ``packed`` is :func:`lk_pack_pyramid_pairs` of the chunk's
    P + 1 frames. Identical per-point math to
    :func:`pyramidal_lk_pallas_packed` (tested bit-exact); callers jit.
    """
    h, w = img_shape
    p_, n_ = points.shape[0], points.shape[1]
    m = p_ * n_
    pts = points.reshape(m, 2)
    band = jnp.repeat(jnp.arange(p_, dtype=jnp.int32), n_)
    pad_m = _round_up(m, PGROUP) - m
    pts_p = jnp.pad(pts, ((0, pad_m), (0, 0)), constant_values=4.0 * HALF)
    band_p = jnp.pad(band, (0, pad_m))

    flow = pts_p * 0.0
    status = valid.reshape(m)
    for lvl in range(len(packed) - 1, -1, -1):
        words = packed[lvl]
        if words is None:
            continue  # tiny level: keep coarse guess
        stride = words.shape[1] // (p_ + 1)  # static: T bands of `stride`
        scale = 2.0**lvl
        vx, vy, ok = _lk_level_pallas_pairs(
            words, pts_p / scale, band_p, flow / scale,
            (words.shape[0], stride), stride, iters, interpret,
        )
        flow = jnp.stack([vx, vy], axis=-1) * scale
        status = status & ok[:m]

    new_pts = pts + flow[:m]
    half = float(HALF)
    in_bounds = (
        (pts[:, 0] >= half) & (pts[:, 0] < w - half)
        & (pts[:, 1] >= half) & (pts[:, 1] < h - half)
        & (new_pts[:, 0] >= half) & (new_pts[:, 0] < w - half)
        & (new_pts[:, 1] >= half) & (new_pts[:, 1] < h - half)
    )
    return (
        new_pts.reshape(p_, n_, 2),
        (status & in_bounds).reshape(p_, n_),
    )

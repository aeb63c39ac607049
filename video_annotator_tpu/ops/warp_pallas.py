"""Fused stabilize+undistort warp as a Pallas TPU kernel.

Replaces the reference's per-frame hot path — the ``createMap`` OpenCL kernel
(``opencv/createMap.cl:1-51``, re-run every frame because the rotation changes,
``opencv/FrameSourceWarp.cpp:272-314``) followed by ``cv::remap`` — with ONE
kernel that never materializes the map in HBM: map coordinates are computed
in-register per output tile and immediately consumed by the sampling
gather — exact 2x2 bilinear by default, or a 4-tap mode (Keys bicubic /
Lanczos2 via per-tap weight polynomials) when the plan's ``interp`` asks
for it. The same kernel also serves the similarity (vidstab) family:
a 2D similarity is a 3x3 homogeneous pixel matrix over identity
cameras (``models/similarity.py``).

TPU-native design
-----------------
Remap is a scattered gather, which TPUs have no native instruction for over a
full HBM image. The kernel exploits the warp's *smoothness* and the 8-bit
pixel depth:

1. The frame is re-packed once per frame (cheap XLA bitcast) into
   "quad-row words": an int32 array of shape (H/4, W) whose word (r, x)
   holds rows 4r..4r+3 of column x. Gathers and DMAs then move 4 vertical
   pixels per element — 4x fewer gathers and 4x less window DMA than a
   float32 kernel.
2. The output is processed in (TILE_H, 128) tiles. Each tile's source pixels
   live in a small window whose per-tile origin is computed per frame by a
   cheap XLA pass over a dense sub-tile sample of the map (the plan's
   static window shape comes from probing worst-case correction rotations).
3. The window is DMA'd HBM -> VMEM, and bilinear sampling loops over the
   window's *word* rows: the two horizontal taps come from Mosaic's
   lane-axis dynamic gather (``take_along_axis(..., axis=1)`` on (8, 128)
   operands — the only gather shape the TPU supports natively) with
   128-wide sections; the four packed rows are unpacked with static shifts
   and weighted by the vertical hat function, which zeroes all but the two
   relevant rows. The accumulation is exact 2x2 bilinear on the uint8
   data, matching the XLA oracle to float rounding.
4. A per-tile active word-row range [wr_lo, wr_hi) from the origin pass
   keeps the loop proportional to the tile's true source span.

Out-of-image sources produce ``border`` (cv::remap BORDER_CONSTANT
semantics), and partially-outside pixels blend their missing taps toward
``border`` too (the border-weight deficit) — 0 for luma, neutral 128 for
chroma planes.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_annotator_tpu.camera import Camera, CameraModel

TILE_H = 8
TILE_W = 128


@dataclasses.dataclass(frozen=True)
class WarpPlan:
    """Static kernel configuration chosen by :func:`plan_warp`."""

    out_h: int  # padded output height (multiple of TILE_H)
    out_w: int  # padded output width (multiple of TILE_W)
    crop_h: int  # true output height
    crop_w: int
    wh: int  # window height in pixels; multiple of 32
    ww: int  # window width in pixels; multiple of 128
    in_h: int
    in_w: int
    # Safety margins subtracted from the sampled per-tile minimum (map
    # curvature between samples), measured by the planner. The margins
    # protect the window ORIGIN (conservative); the dips are the measured
    # curvature escape + safety used for the per-section active row
    # ranges and section-touch tests, where every extra word row costs
    # ~8 row-visits of kernel time per tile.
    margin_x: int = 3
    margin_y: int = 3
    dip_x: float = 3.0
    dip_y: float = 3.0
    # Word rows per schedule trip. Smaller trips fit narrow per-section
    # spans with fewer wasted row visits (a 5-word span costs one 8-row
    # trip but two 4-row trips would visit the same 8); larger trips
    # amortize per-trip setup (entry decode + window slice). Tuned by
    # measurement per configuration.
    trip_rows: int = 8
    # Schedule entries walked per fori_loop iteration (1 disables). The
    # loop's per-iteration overhead measures ~110 cycles on v5e (scalar
    # decode -> vector dependency bubble + loop bookkeeping) — comparable
    # to a whole 8-row trip's vector work — so grouping entries amortizes
    # it (group=2: luma 2.61 -> 2.27 ms; group=4 + split accumulators:
    # 2.08 ms at 4K). Short schedules pad with DEAD entries pointing at
    # the phantom section (index `sections`), whose gathers mask to zero
    # for every pixel.
    trip_group: int = 1
    # With grouping, alternate entries accumulate into independent
    # register pairs (summed once after the loop): halves the FMA
    # dependency chain the loop carries.
    split_acc: bool = False
    # Predicated tail: the grouped loop walks only total // group FULL
    # groups; the up-to-(group-1) remaining entries run under scalar
    # lax.cond guards. Without it, short schedules pad to a full group
    # with DEAD entries whose gathers mask to zero but whose vector work
    # (gathers + extracts + FMAs over the whole tile) still executes —
    # at mean ~3.7 entries/tile and group 4 that wasted ~1.8 entries
    # (~25% of kernel time). A not-taken cond costs a scalar branch.
    pred_tail: bool = True
    # Double-buffered window DMA: at grid step g, issue step g+1's
    # window copy into the other slot before waiting on this step's.
    # Component-stripped timing showed the window DMA costs ~450 ns/tile
    # of pure LATENCY (52% of the luma kernel; the 48 KB itself is
    # ~60 ns of HBM bandwidth) and overlaps with nothing — the map math
    # is only ~95 ns. (An earlier double-buffer attempt measured slower,
    # but that was before the schedule walk was cut 3x; the DMA stall
    # now dominates.)
    dbuf: bool = True
    # Window-DMA pipeline depth: number of VMEM window slots / how many
    # tiles ahead copies are issued (2 = classic double buffer). The
    # roofline (docs/KERNEL.md) puts the copy LATENCY at ~450 ns/tile
    # against ~429 ns of walk compute, so one slot of lookahead hides it
    # only barely; depth 3 issues two tiles ahead. VMEM cost is one
    # window (~48 KB) per extra slot.
    dbuf_depth: int = 2
    # Per-TILE mip levels (the minification prefilter): level l tiles
    # sample from the l-times box-downsampled input through coordinates
    # scaled by 2^-l. mip_max == 0 disables the machinery entirely (the
    # kernel compiles without it). levels_blob packs the static (ny, nx)
    # uint8 level grid (hashable for the jit caches).
    mip_max: int = 0
    levels_blob: bytes = b""
    # Resampler: "bilinear" (exact 2x2, the reference native engine's
    # INTER_LINEAR), "bicubic" (Keys a=-0.75, vidstab's interpol=bicubic)
    # or "lanczos" (v360's interp=lanczos, 4x4 windowed sinc). The 4-tap
    # modes run the same schedule walk with one extra pixel of window
    # margin, 4 horizontal gathers per word-row visit (vs 2) and
    # per-tap polynomial weights in the fractional offset (exact for
    # Keys — it IS a cubic; fitted to ~1e-6 for lanczos, whose sinc
    # window Mosaic cannot evaluate directly).
    interp: str = "bilinear"
    # DIAGNOSTIC ONLY (env VAT_WARP_DIAG, never a product path): "no_dma"
    # compiles the kernel WITHOUT the window copies (gathers read stale
    # VMEM — wrong pixels, pure vector+loop timing), "no_walk" skips the
    # schedule walk (borders only — DMA+map+output timing). Together
    # they decompose the measured ns/tile into its DMA-exposure and
    # vector components on the real chip (docs/KERNEL.md round-5
    # decomposition).
    diag: str = ""

    @property
    def taps(self) -> int:
        return 2 if self.interp == "bilinear" else 4

    @property
    def levels(self) -> np.ndarray:
        ny, nx = self.grid
        if not self.mip_max:
            return np.zeros((ny, nx), np.uint8)
        return np.frombuffer(self.levels_blob, np.uint8).reshape(ny, nx)

    @property
    def grid(self) -> Tuple[int, int]:
        return (self.out_h // TILE_H, self.out_w // TILE_W)

    @property
    def sections(self) -> int:
        return self.ww // 128

    @property
    def wh_words(self) -> int:
        return self.wh // 4

    @property
    def win_sections(self) -> int:
        # +1 phantom section for DEAD padding entries (never DMA'd;
        # its gathers mask to zero).
        return self.sections + (1 if self.trip_group > 1 else 0)

    @property
    def slots(self) -> int:
        # Max (section, trip) schedule entries per tile: every section
        # spanning its worst-case trip count.
        r = self.trip_rows
        return self.sections * ((self.wh_words + r - 1) // r + 1)

    # --- schedule entry compression -------------------------------------
    # Entries are (word-row start, section) pairs packed several per int32
    # word: SMEM prefetch space is ~1MB and the uncompressed schedule of a
    # 4-frame 4K batch would not fit.

    @property
    def entry_bits_w(self) -> int:
        return max(1, (self.wh_words - 1).bit_length())

    @property
    def entry_bits_s(self) -> int:
        # One spare value above sections-1: the DEAD entry's phantom
        # section (trip-group padding).
        return max(1, self.sections.bit_length())

    @property
    def entries_per_word(self) -> int:
        bits = self.entry_bits_w + self.entry_bits_s
        epw = 32 // bits
        return 1 << max(0, epw.bit_length() - 1)  # floor to a power of 2

    @property
    def slot_words(self) -> int:
        return -(-self.slots // self.entries_per_word)

    # meta1 bit layout: [oyw | strip | level? | count], low to high.
    @property
    def meta1_bits_oyw(self) -> int:
        return max(1, (_round_up(self.in_h, 32) // 4).bit_length())

    @property
    def meta1_bits_strip(self) -> int:
        return max(1, (_round_up(self.in_w, 128) // 128).bit_length())

    @property
    def meta1_bits_level(self) -> int:
        return 2 if self.mip_max else 0


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def warp_scratch_shapes(plan: "WarpPlan", mode=None):
    """Scratch shapes (window VMEM + DMA semaphores) for a warp kernel.

    Must mirror what :func:`_make_kernel` indexes: ``mode="uv"`` stacks
    the two chroma planes' windows; ``plan.dbuf`` doubles both window
    and semaphores for the double-buffered window pipeline.
    """
    win = (plan.win_sections, plan.wh_words, 128)
    sem = ()
    if mode == "uv":
        win = (2,) + win
        sem = (2,) + sem
    if plan.dbuf:
        win = (plan.dbuf_depth,) + win
        sem = (plan.dbuf_depth,) + sem
    return [
        pltpu.VMEM(win, jnp.int32),
        pltpu.SemaphoreType.DMA(sem) if sem else pltpu.SemaphoreType.DMA,
    ]


def _unproject_np(out_camera: Camera, ys: np.ndarray, xs: np.ndarray):
    """NumPy twin of ``Camera.unproject`` (f64): (..., 3) output rays.

    Host-side planning and the non-rectilinear kernels' precomputed ray
    grids both need exact output-model unprojection without a device
    round trip. Delegates to :func:`camera.unproject_np`, which covers
    every output model (including the v360 panoramic family).
    """
    from video_annotator_tpu.camera import unproject_np

    return unproject_np(out_camera, ys, xs)


def _warp_map_np(out_camera: Camera, in_camera: Camera, rot: np.ndarray, out_size):
    """NumPy twin of :func:`compute_warp_map` for host-side planning.

    The planner probes several rotations at full output resolution; doing
    that eagerly through JAX on a remote TPU backend is dispatch-bound, so
    the plan is computed entirely on host.
    """
    h, w = out_size
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    rays = _unproject_np(out_camera, ys, xs)
    rot = np.asarray(rot, np.float64)
    v = rays @ rot.T
    # Behind-camera rays (possible with equirect output past 90 deg)
    # render as border; pin them far outside so the planner's clip
    # handles them and no NaN/Inf leaks into the bound reductions.
    behind = v[..., 2] <= 1e-9
    vz = np.where(behind, 1.0, v[..., 2])
    a = np.where(behind, -1e6, v[..., 0] / vz)
    b = np.where(behind, -1e6, v[..., 1] / vz)
    if in_camera.model == CameraModel.FISHEYE:
        r = np.sqrt(a * a + b * b)
        theta = np.arctan(r)
        k = np.asarray(in_camera.dist, np.float64)
        t2 = theta * theta
        theta = theta * (1.0 + t2 * (k[0] + t2 * (k[1] + t2 * (k[2] + t2 * k[3]))))
        scale = np.where(r > 1e-8, theta / np.maximum(r, 1e-8), 1.0)
        sx = float(in_camera.fx) * a * scale + float(in_camera.cx)
        sy = float(in_camera.fy) * b * scale + float(in_camera.cy)
    else:
        sx = float(in_camera.fx) * a + float(in_camera.cx)
        sy = float(in_camera.fy) * b + float(in_camera.cy)
    return np.stack([sx, sy], axis=-1)


@functools.lru_cache(maxsize=8)
def _tap_weight_coeffs(interp: str) -> tuple:
    """Per-tap weight polynomials in the fractional offset f in [0, 1).

    Returns 4 coefficient tuples (highest power first, np.polyval order),
    one per tap offset (-1, 0, 1, 2). Keys bicubic weights ARE cubics in
    f, so the degree-3 fit is exact (to f64 rounding); lanczos2's
    normalized windowed-sinc weights are fitted with a degree-9
    polynomial (max error ~1e-7 — far below uint8 quantization). The
    normalization matches the XLA oracle: lanczos divides by the
    full-stencil weight sum (``ops/warp_xla.py:lanczos_sample``), Keys
    sums to 1 by construction.
    """
    # Fit against the XLA oracle's own weight functions (single source of
    # truth — ops/warp_xla.py); evaluated through jnp, so convert back.
    # ensure_compile_time_eval keeps the evaluation eager even when the
    # kernel is built inside an outer trace (shard_map/jit stages every
    # jnp bind otherwise, and np.asarray on the tracer would throw — the
    # sharded 4-tap DP path hit exactly that).
    import jax

    from video_annotator_tpu.ops.warp_xla import keys_weight, lanczos_weight

    f = np.linspace(0.0, 1.0, 2049)
    with jax.ensure_compile_time_eval():
        if interp == "bicubic":
            ws = [np.asarray(keys_weight(f - k), np.float64)
                  for k in (-1, 0, 1, 2)]
            deg = 3
        elif interp == "lanczos":
            ws = [np.asarray(lanczos_weight(f - k), np.float64)
                  for k in (-1, 0, 1, 2)]
            norm = ws[0] + ws[1] + ws[2] + ws[3]
            ws = [w / norm for w in ws]
            deg = 9
        else:
            raise ValueError(f"no 4-tap weights for interp={interp!r}")
    out = []
    for w in ws:
        c = np.polyfit(f, w, deg)
        err = float(np.abs(np.polyval(c, f) - w).max())
        assert err < 1e-5, (interp, err)
        out.append(tuple(float(v) for v in c))
    return tuple(out)


def _rodrigues_np(w: np.ndarray) -> np.ndarray:
    theta = float(np.linalg.norm(w))
    if theta < 1e-12:
        return np.eye(3)
    k = w / theta
    K = np.array(
        [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]], np.float64
    )
    return np.eye(3) + math.sin(theta) * K + (1 - math.cos(theta)) * (K @ K)


# Sub-tile sampling steps for the origin pass: each (8, 128) tile is probed
# at a 3x5 interior grid, so the per-tile min/max bounds are tight (map
# curvature between samples is well under a pixel) and the safety margin
# stays small.
SUB_Y = 4
SUB_X = 32
NY_SUB = TILE_H // SUB_Y  # y sample intervals per tile
NX_SUB = TILE_W // SUB_X  # x sample intervals per tile


def plan_warp(
    out_camera: Camera,
    in_camera: Camera,
    max_correction_deg: float = 6.0,
    out_size: Tuple[int, int] | None = None,
    trip_rows: int = 8,
    mip_levels: int = 0,
    trip_group: int | None = None,
    split_acc: bool | None = None,
    interp: str = "bilinear",
    probe_mats=None,
) -> WarpPlan:
    """Choose static window sizes by probing the map over worst-case rotations.

    Evaluates the warp map on a coarse grid for a set of extreme rotations
    (``max_correction_deg`` bounds the per-frame stabilization correction)
    and measures the maximum source extent of any (8, 128) output tile plus
    how far true extrema escape the sub-tile sampled bounds.

    ``probe_mats`` overrides the probe set with explicit 3x3 matrices
    (identity is always added). The similarity/vidstab family plans with
    its clip's actual correction extremes expressed as homogeneous
    pixel-space matrices over identity cameras — the same kernel then
    serves affine warps (``models/similarity.py``).
    """
    import os
    import sys
    if trip_group is None:
        trip_group = int(os.environ.get("VAT_TRIP_GROUP", "4"))
    if split_acc is None:
        split_acc = os.environ.get("VAT_SPLIT_ACC", "1") != "0"
    pred_tail = os.environ.get("VAT_PRED_TAIL", "1") != "0"
    dbuf = os.environ.get("VAT_DBUF", "1") != "0"
    # Each slot is a full VMEM source window (~48 KB, doubled with mips);
    # clamp to [2, 4] so an oversized env value fails soft instead of
    # building a kernel that dies in Mosaic with an opaque VMEM error.
    dbuf_depth = min(4, max(2, int(os.environ.get("VAT_DBUF_DEPTH", "2"))))
    diag = os.environ.get("VAT_WARP_DIAG", "")
    if diag and set(diag.split(",")) - {"no_dma", "no_walk"}:
        # A typo'd diagnostic must not silently measure the normal
        # kernel while the user believes the diag ran.
        raise ValueError(
            f"VAT_WARP_DIAG={diag!r}: expected no_dma, no_walk, or "
            f"no_dma,no_walk")
    if diag:
        # Loud, once per plan: a leftover export in the shell would
        # otherwise corrupt every product render without a trace
        # (no_dma gathers read stale VMEM; no_walk outputs borders).
        print(
            f"WARNING: VAT_WARP_DIAG={diag} builds a DIAGNOSTIC warp "
            f"kernel — output pixels are garbage; timing only "
            f"(docs/KERNEL.md). Unset it for real renders.",
            file=sys.stderr,
        )
    if out_size is None:
        out_size = (out_camera.height, out_camera.width)
    crop_h, crop_w = out_size
    out_h = _round_up(crop_h, TILE_H)
    out_w = _round_up(crop_w, TILE_W)

    if probe_mats is not None:
        probes = [np.eye(3)] + [np.asarray(p, np.float64) for p in probe_mats]
    else:
        ang = math.radians(max_correction_deg)
        probes = [np.eye(3)]
        for axis in ([ang, 0, 0], [0, ang, 0], [0, 0, ang],
                     [-ang, 0, 0], [0, -ang, 0], [0, 0, -ang],
                     [ang / 1.7, ang / 1.7, ang / 1.7]):
            probes.append(_rodrigues_np(np.asarray(axis, np.float64)))

    ny, nx = out_h // TILE_H, out_w // TILE_W
    span_x_t = np.zeros((ny, nx))  # per-tile source spans, max over probes
    span_y_t = np.zeros((ny, nx))
    smin_t = np.full((ny, nx), np.inf)  # per-tile min map-Jacobian sigma
    dip_x = 0.0  # how far the true extremum escapes the sampled bound
    dip_y = 0.0
    for rot in probes:
        cmap = _warp_map_np(out_camera, in_camera, rot, (out_h, out_w))
        # Out-of-image sources render as 0 and never need real window
        # coverage; clamp them so corner tiles (where the fisheye forward
        # model stretches wildly outside the frame) don't inflate the plan.
        sx = np.clip(cmap[..., 0], -8.0, in_camera.width + 8.0)
        sy = np.clip(cmap[..., 1], -8.0, in_camera.height + 8.0)
        bx = sx.reshape(ny, TILE_H, nx, TILE_W)
        by = sy.reshape(ny, TILE_H, nx, TILE_W)
        tmin_x = bx.min(axis=(1, 3))
        tmin_y = by.min(axis=(1, 3))
        tmax_y = by.max(axis=(1, 3))
        span_x_t = np.maximum(span_x_t, bx.max(axis=(1, 3)) - tmin_x)
        span_y_t = np.maximum(span_y_t, tmax_y - tmin_y)
        if mip_levels:
            # Smallest singular value of the map Jacobian per pixel,
            # reduced to a per-tile min: sampling from level l is
            # blur-free wherever sigma_min >= 2^l. Only pixels that are
            # actually rendered constrain the level: out-of-image sources
            # (clipped above -> zero gradients) fill with the border
            # value, and the grid padding beyond the crop is never
            # emitted.
            ga = np.gradient(sx, axis=1)
            gb = np.gradient(sx, axis=0)
            gc = np.gradient(sy, axis=1)
            gd = np.gradient(sy, axis=0)
            e = ga * ga + gb * gb + gc * gc + gd * gd
            det = ga * gd - gb * gc
            disc = np.sqrt(np.maximum(e * e - 4.0 * det * det, 0.0))
            smin = np.sqrt(np.maximum((e - disc) * 0.5, 0.0))
            # Same band the kernel's valid mask renders (4-tap modes
            # reach one pixel further): excluded border pixels would
            # leave edge tiles unconstrained and mip-blur the partial
            # -overlap band the kernel still blends.
            tpad_r = 0.0 if interp == "bilinear" else 1.0
            rendered = (
                (cmap[..., 0] > -1.0 - tpad_r)
                & (cmap[..., 0] < in_camera.width + tpad_r)
                & (cmap[..., 1] > -1.0 - tpad_r)
                & (cmap[..., 1] < in_camera.height + tpad_r)
            )
            rendered[crop_h:, :] = False
            rendered[:, crop_w:] = False
            smin = np.where(rendered, smin, 1e9)
            smin_t = np.minimum(
                smin_t,
                smin.reshape(ny, TILE_H, nx, TILE_W).min(axis=(1, 3)),
            )
        sw = np.lib.stride_tricks.sliding_window_view
        sgx = sx[::SUB_Y, ::SUB_X]
        sgy = sy[::SUB_Y, ::SUB_X]
        if sgx.shape[0] < 3 or sgx.shape[1] < 5:
            # Output smaller than one sample window (tiny frames): fall
            # back to a conservative fixed dip.
            dip_x = max(dip_x, 4.0)
            dip_y = max(dip_y, 4.0)
            continue
        twin = (NY_SUB + 1, NX_SUB + 1)
        smin_x = sw(sgx, twin)[::NY_SUB, ::NX_SUB].min(axis=(2, 3))
        smin_y = sw(sgy, twin)[::NY_SUB, ::NX_SUB].min(axis=(2, 3))
        smax_y = sw(sgy, twin)[::NY_SUB, ::NX_SUB].max(axis=(2, 3))
        # The in-plan sample grid lacks the far boundary row/col, so it
        # covers one tile less per axis; compare on the shared region (edge
        # tiles behave like their neighbors, and the margin adds slack).
        cy, cx_ = smin_x.shape
        dip_x = max(dip_x, float((smin_x - tmin_x[:cy, :cx_]).max()))
        dip_y = max(
            dip_y,
            float((smin_y - tmin_y[:cy, :cx_]).max()),
            float((tmax_y[:cy, :cx_] - smax_y).max()),
        )
        # Per-SAMPLE-COLUMN dip: the kernel's per-section row ranges bound
        # each 32-px output column interval by its two bounding sample
        # columns (3-row windows); measure how far true extrema escape
        # those much narrower bounds.
        ny8 = out_h // TILE_H
        cwin = (NY_SUB + 1, 1)
        cmin_y = sw(sgy, cwin)[::NY_SUB].min(axis=(2, 3))
        cmax_y = sw(sgy, cwin)[::NY_SUB].max(axis=(2, 3))
        cmin_x = sw(sgx, cwin)[::NY_SUB].min(axis=(2, 3))
        cmax_x = sw(sgx, cwin)[::NY_SUB].max(axis=(2, 3))
        pmin_y = np.minimum(cmin_y[:, :-1], cmin_y[:, 1:])
        pmax_y = np.maximum(cmax_y[:, :-1], cmax_y[:, 1:])
        pmin_x = np.minimum(cmin_x[:, :-1], cmin_x[:, 1:])
        pmax_x = np.maximum(cmax_x[:, :-1], cmax_x[:, 1:])
        ivals_min_y = sy.reshape(ny8, TILE_H, nx, NX_SUB, SUB_X).min(axis=(1, 4))
        ivals_max_y = sy.reshape(ny8, TILE_H, nx, NX_SUB, SUB_X).max(axis=(1, 4))
        ivals_min_x = sx.reshape(ny8, TILE_H, nx, NX_SUB, SUB_X).min(axis=(1, 4))
        ivals_max_x = sx.reshape(ny8, TILE_H, nx, NX_SUB, SUB_X).max(axis=(1, 4))
        iy, ix_ = pmin_y.shape
        dip_col = max(
            float((pmin_y - ivals_min_y.reshape(ny8, -1)[:iy, :ix_]).max()),
            float((ivals_max_y.reshape(ny8, -1)[:iy, :ix_] - pmax_y).max()),
            float((pmin_x - ivals_min_x.reshape(ny8, -1)[:iy, :ix_]).max()),
            float((ivals_max_x.reshape(ny8, -1)[:iy, :ix_] - pmax_x).max()),
        )
        dip_x = max(dip_x, dip_col)
        dip_y = max(dip_y, dip_col)

    # Per-tile mip levels: the deepest level still blur-free for EVERY
    # pixel of the tile (with a 5% guard); source spans then shrink by
    # 2^-level, which is what sizes the shared window below.
    if mip_levels:
        smin_t = np.minimum(smin_t, 1e9)  # never-rendered tiles: deepest
        lv = np.floor(np.log2(np.maximum(smin_t / 1.05, 1.0)))
        # Cap at 3: the level rides a 2-bit meta1 field (meta1_bits_level);
        # deeper would silently corrupt the packed schedule count.
        lv = np.clip(lv, 0, min(mip_levels, 3)).astype(np.uint8)
        mip_max = int(lv.max())
        levels_blob = lv.tobytes() if mip_max else b""
        scale_t = 0.5 ** lv.astype(np.float64)
    else:
        mip_max = 0
        levels_blob = b""
        scale_t = 1.0
    max_dx = float((span_x_t * scale_t).max())
    max_dy = float((span_y_t * scale_t).max())

    # Dips measured on the probe set; +0.75 guards sub-probe rotations.
    dip_x += 0.75
    dip_y += 0.75
    # 4-tap modes reach one pixel further on each side (taps -1..+2 vs
    # the bilinear 0..+1): grow the conservative origin margin and the
    # window extent by the extra tap reach.
    tap_pad = 0 if interp == "bilinear" else 1
    margin_x = int(math.ceil(dip_x)) + 2 + tap_pad
    margin_y = int(math.ceil(dip_y)) + 2 + tap_pad
    # Window must cover: margin below the sampled min, the tile's true
    # source extent, +2 for the upper bilinear tap (+1 more for 4-tap),
    # and the origin alignment rounding (4 rows / 128 cols).
    wh = _round_up(int(math.ceil(max_dy)) + margin_y + 4 + 4 + tap_pad, 32)
    ww = _round_up(int(math.ceil(max_dx)) + margin_x + 4 + 128 + tap_pad, 128)
    # The frame is zero-padded up to the packing/DMA grid before the
    # kernel (zero padding reproduces the BORDER_CONSTANT edge exactly),
    # so the window may cover the padded extent but no more.
    wh = min(wh, _round_up(in_camera.height, 32))
    ww = min(ww, _round_up(in_camera.width, 128))
    plan = WarpPlan(
        out_h=out_h,
        out_w=out_w,
        crop_h=crop_h,
        crop_w=crop_w,
        wh=wh,
        ww=ww,
        in_h=in_camera.height,
        in_w=in_camera.width,
        margin_x=margin_x,
        margin_y=margin_y,
        dip_x=dip_x,
        dip_y=dip_y,
        trip_rows=trip_rows,
        trip_group=trip_group,
        split_acc=split_acc,
        pred_tail=pred_tail,
        dbuf=dbuf,
        dbuf_depth=dbuf_depth,
        diag=diag,
        mip_max=mip_max,
        levels_blob=levels_blob,
        interp=interp,
    )
    meta1_bits = (
        plan.meta1_bits_oyw
        + plan.meta1_bits_strip
        + plan.meta1_bits_level
        + plan.slots.bit_length()
    )
    assert meta1_bits <= 31, (meta1_bits, plan)
    # The schedule's shift-down trick (never re-chunk a chain whose last
    # trip would run past the window) assumes trip chains can always be
    # placed inside [0, wh_words); ceil(span/trip_rows)*trip_rows can
    # exceed wh_words when trip_rows does not divide it (a full-window
    # span then overruns the VMEM window slice — garbage taps).
    assert plan.wh_words % plan.trip_rows == 0, (
        "trip_rows must divide the window word rows",
        plan.trip_rows,
        plan.wh_words,
    )
    return plan


def _tile_bounds_grid(
    plan: WarpPlan,
    out_camera: Camera,
    in_camera: Camera,
    rotation: jax.Array,
):
    """Per-tile (min, max) source bounds via a dense sampled map."""
    ny, nx = plan.grid
    ys = jnp.arange(NY_SUB * ny + 1, dtype=jnp.float32) * SUB_Y
    xs = jnp.arange(NX_SUB * nx + 1, dtype=jnp.float32) * SUB_X
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
    rays = out_camera.unproject(grid)
    rotation = rotation.astype(jnp.float32)
    if rotation.ndim == 3:
        # Rolling shutter: one rotation per output TILE ROW; each sampled
        # row uses its tile's rotation (boundary samples clamp down).
        ridx = jnp.clip(
            (ys.astype(jnp.int32)) // TILE_H, 0, rotation.shape[0] - 1
        )
        rotated = jnp.einsum(
            "hij,hwj->hwi", rotation[ridx], rays,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        rotated = jnp.einsum(
            "ij,hwj->hwi", rotation, rays,
            precision=jax.lax.Precision.HIGHEST,
        )
    # Behind-camera rays (equirect/wide outputs past 90 deg) must pin far
    # outside, exactly like the host twin _warp_map_np: an unguarded
    # project() mirrors (z < 0) or NaNs (z ~ 0) them, corrupting the
    # bound reductions and with them the tile window origins.
    behind = rotated[..., 2] <= 1e-9
    safe = jnp.where(
        behind[..., None],
        jnp.asarray([0.0, 0.0, 1.0], rotated.dtype),
        rotated,
    )
    src = in_camera.project(safe)  # (2ny+1, 4nx+1, 2)
    sx = jnp.clip(jnp.where(behind, -1e6, src[..., 0]), -8.0, plan.in_w + 8.0)
    sy = jnp.clip(jnp.where(behind, -1e6, src[..., 1]), -8.0, plan.in_h + 8.0)

    # Stacked max-reduce_windows instead of eight separate launches
    # (these tiny grids are overhead-bound; min(x) = -max(-x)).
    stacked = jnp.stack([-sx, sx, -sy, sy])
    ext = jax.lax.reduce_window(
        stacked, -jnp.inf, jax.lax.max,
        window_dimensions=(1, NY_SUB + 1, NX_SUB + 1),
        window_strides=(1, NY_SUB, NX_SUB),
        padding="VALID",
    )
    # Per-sample-column bounds (3-row windows): feed the per-section row
    # ranges. Shape (4, ny, 4nx+1).
    cols = jax.lax.reduce_window(
        stacked, -jnp.inf, jax.lax.max,
        window_dimensions=(1, NY_SUB + 1, 1), window_strides=(1, NY_SUB, 1),
        padding="VALID",
    )
    return (-ext[0], ext[1], -ext[2], ext[3]), cols


def _tile_origins(
    plan: WarpPlan,
    out_camera: Camera,
    in_camera: Camera,
    rotation: jax.Array,
):
    """Per-tile window origins + per-SECTION active word-row ranges.

    Origins are aligned to the DMA grid of the quad-row word array:
    32 pixel rows (= 8 word rows) and 128 columns. Each 128-column window
    section gets its own row range: the map's x-curvature makes the
    tile-union span ~2x wider than any single section needs, and sections
    no pixel touches get an empty range (the kernel's loop then runs zero
    trips — free section skipping).
    """
    (min_x, max_x, min_y, max_y), cols = _tile_bounds_grid(
        plan, out_camera, in_camera, rotation
    )
    del max_x, max_y
    ny, nx = plan.grid
    if plan.mip_max:
        # Per-tile mip: bounds move to the tile's level-l coordinate
        # frame, x_l = (x + 0.5) * 2^-l - 0.5 (box_downsample pixel-center
        # convention). Everything downstream (origins, section touch
        # tests, row ranges) then describes the downsampled plane the
        # kernel samples. Dips/margins stay in full-res pixels —
        # conservative at level > 0.
        s_t = jnp.asarray(0.5 ** plan.levels.astype(np.float32))
        off_t = jnp.asarray((plan.levels > 0).astype(np.float32))
        min_x = (min_x + 0.5) * s_t - 0.5 + off_t
        min_y = (min_y + 0.5) * s_t - 0.5 + off_t
    ox = jnp.floor(min_x - plan.margin_x).astype(jnp.int32)
    oy = jnp.floor(min_y - plan.margin_y).astype(jnp.int32)
    in_h_pad = _round_up(plan.in_h, 32)
    in_w_pad = _round_up(plan.in_w, 128)
    ox = (jnp.clip(ox, 0, max(in_w_pad - plan.ww, 0)) // 128) * 128
    # The y origin is word-granular (4 px), NOT vreg-aligned: the HBM side
    # of the window DMA is linear so any sublane start is legal, and an
    # origin at the tile's true minimum row keeps each section's active
    # range inside the FIRST 8-word block most of the time (32-px-aligned
    # origins made ~6-word spans straddle two blocks, nearly doubling the
    # kernel's row visits).
    oy = (jnp.clip(oy, 0, max(in_h_pad - plan.wh, 0)) // 4) * 4
    # (word-row origin oyw is derived after the flatten below)

    # Per-tile 32-px column INTERVALS: interval k of tile tx is bounded by
    # sample columns 4*tx+k and 4*tx+k+1; a pixel's source coordinates are
    # bounded by its interval's pair bounds (within the planner-measured
    # dip). The pair's x-range decides which sections the interval's
    # pixels can touch — individual columns would miss intervals that
    # straddle a section boundary. cols is (4, ny, 4nx+1) as
    # (-min_x, max_x, -min_y, max_y).
    pair = jnp.maximum(cols[:, :, :-1], cols[:, :, 1:])
    colbs = [
        (
            -pair[0, :, k::NX_SUB][:, :nx],
            pair[1, :, k::NX_SUB][:, :nx],
            -pair[2, :, k::NX_SUB][:, :nx],
            pair[3, :, k::NX_SUB][:, :nx],
        )
        for k in range(NX_SUB)
    ]
    # Tap coverage bounds from measured dips (NOT the conservative origin
    # margins): true source x in [xmin-dip, xmax+dip]; taps floor(x) and
    # floor(x)+1 (4-tap modes: floor(x)-1 .. floor(x)+2). A section is
    # touched iff the tap interval meets [lo_b, hi_b).
    tap_lo = 1.0 if plan.taps == 4 else 0.0  # reach below floor(x)
    tap_hi = 2.0 if plan.taps == 4 else 1.0  # reach above floor(x)
    mx1 = plan.dip_x + tap_lo
    mx2 = plan.dip_x + tap_hi
    nsec = plan.sections
    # Vectorized over sections: (S, ...) bounds from the NX_SUB interval
    # bound sets (a python loop here costs hundreds of tiny HLO ops that
    # dominate the per-frame origin pass).
    cb = jnp.stack([jnp.stack(b) for b in colbs])  # (NX_SUB, 4, ny, nx)
    if plan.mip_max:
        # colbs un-negates the reduce_window channels: all four are plain
        # coordinates (min_x, max_x, min_y, max_y) — one uniform level
        # transform.
        cb = (cb + 0.5) * s_t - 0.5 + off_t

    # Flatten the (ny, nx) tile grid to dense (mrows, 128) blocks for
    # ALL the schedule math below: (.., ny, nx)-shaped tensors put nx on
    # the lane axis (19 of 128 lanes used at 4K — ~6x vreg waste for
    # ~100 elementwise ops). The broadcast ranks are unchanged, so the
    # arithmetic below is identical; only the layout differs.
    n_t = ny * nx
    n_pad = _round_up(n_t, 128)
    mrows = n_pad // 128

    def flat(a):
        a2 = a.reshape(a.shape[:-2] + (n_t,))
        if n_pad != n_t:
            widths = [(0, 0)] * (a2.ndim - 1) + [(0, n_pad - n_t)]
            a2 = jnp.pad(a2, widths)
        return a2.reshape(a.shape[:-2] + (mrows, 128))

    cb = flat(cb)
    ox = flat(ox)
    oy = flat(oy)
    oyw = oy // 4
    oxf = ox.astype(jnp.float32)
    lo_b = oxf[None] + 128.0 * jnp.arange(nsec, dtype=jnp.float32).reshape(
        nsec, 1, 1
    )
    hi_b = lo_b + 128.0
    # Sample interval touches a section if any tap of a pixel it bounds
    # can land inside [lo_b, hi_b).
    touch = (cb[:, 1][:, None] + mx2 > lo_b[None]) & (
        cb[:, 0][:, None] - mx1 < hi_b[None]
    )  # (NX_SUB, S, ny, nx)
    ymin = jnp.min(
        jnp.where(touch, cb[:, 2][:, None], jnp.inf), axis=0
    )  # (S, ny, nx)
    ymax = jnp.max(jnp.where(touch, cb[:, 3][:, None], -jnp.inf), axis=0)
    empty = ymax < ymin
    ymin = jnp.where(empty, 0.0, ymin)
    ymax = jnp.where(empty, -8.0, ymax)
    # Active word rows cover taps floor(sy)-tap_lo..floor(sy)+tap_hi for
    # true sy in [ymin-dip, ymax+dip]; every extra word row here costs ~8
    # row-visits of kernel time per (tile, section).
    wr_lo = jnp.clip(
        (jnp.floor(ymin - plan.dip_y).astype(jnp.int32) - int(tap_lo)
         - oy[None]) // 4,
        0,
        plan.wh_words,
    )
    wr_hi = jnp.clip(
        (jnp.floor(ymax + plan.dip_y).astype(jnp.int32) + int(tap_hi)
         - oy[None]) // 4
        + 1,
        0,
        plan.wh_words,
    )
    wr_hi = jnp.maximum(wr_hi, wr_lo)
    # Schedule entries carry exact word-row STARTS (trip_rows-row trips
    # at wr_lo, wr_lo+trip_rows, ...), not aligned block indices: a span
    # one short of two trips then costs ONE trip. Visiting rows outside
    # [wr_lo, wr_hi) is harmless (row weights match by value and
    # out-of-section taps are masked); visiting a row TWICE would double
    # its contribution, so the start chain is shifted down — never
    # re-chunked — when its last trip would run past the window.
    tr = plan.trip_rows
    nblk = jnp.maximum((wr_hi - wr_lo + tr - 1) // tr, 0)
    blo = jnp.minimum(wr_lo, plan.wh_words - tr * nblk)  # (S, ny, nx)
    cum = jnp.cumsum(nblk, axis=0)  # inclusive prefix counts
    total = cum[-1]
    # Flatten the per-section block ranges into a per-tile SCHEDULE: a
    # contiguous list of (block, section) entries the kernel walks with a
    # single fori_loop (loop setups cost ~0.1 us each; per-trip decode from
    # SMEM is nearly free, unlike recomputing the section split per trip).
    slots = plan.slots
    js = jnp.arange(slots, dtype=jnp.int32).reshape(slots, 1, 1, 1)
    cum_excl = jnp.concatenate(
        [jnp.zeros_like(cum[:1]), cum[:-1]], axis=0
    )  # exclusive prefix per section, (S, ny, nx)
    in_sec = (js >= cum_excl[None]) & (js < cum[None])  # (slots, S, ny, nx)
    sel = lambda a: jnp.sum(jnp.where(in_sec, a[None], 0), axis=1)
    sec_of = sel(
        jnp.broadcast_to(
            jnp.arange(nsec, dtype=jnp.int32).reshape(nsec, 1, 1), cum.shape
        )
    )
    prefix = sel(cum_excl)
    blo_of = sel(blo)
    entry = (blo_of + tr * (js[:, 0] - prefix)) | (
        sec_of << plan.entry_bits_w
    )
    # Pad beyond the schedule with DEAD entries (w8=0, phantom section):
    # grouped-trip kernels visit pad entries on short totals and their
    # gathers mask to zero for every pixel.
    dead = nsec << plan.entry_bits_w
    entry = jnp.where(js[:, 0] < total[None], entry, dead)
    # Pack entries several per int32 word (entry_bits_w + entry_bits_s
    # bits each): SMEM prefetch space is ~1MB and batched 4K schedules
    # would not fit uncompressed.
    epw = plan.entries_per_word
    bits = plan.entry_bits_w + plan.entry_bits_s
    pad = plan.slot_words * epw - slots
    if pad:
        # Word-alignment padding must ALSO be dead entries: a grouped
        # loop with the predicated tail disabled can walk past `slots`,
        # and a zero word decodes to (w8=0, section 0) — a live entry
        # that would double-count section 0's first rows.
        entry = jnp.concatenate(
            [entry, jnp.full((pad, mrows, 128), dead, jnp.int32)], axis=0
        )
    entry = entry.reshape(plan.slot_words, epw, mrows, 128)
    shifts = (jnp.arange(epw, dtype=jnp.int32) * bits).reshape(1, epw, 1, 1)
    words_ = jnp.sum(entry << shifts, axis=1)  # (slot_words, mrows, 128)
    # Both metas are FLAT 1D prefetch arrays: SMEM pads the trailing dim
    # of prefetch operands to 128 words, which for per-row 2D layouts
    # wasted ~6x the SMEM budget on 4K batches. meta1 packs the window
    # origin (word row + strip) AND the schedule count; meta2 is the
    # packed schedule words, tile-major.
    shift = plan.meta1_bits_oyw + plan.meta1_bits_strip
    meta1 = oyw | ((ox // 128) << plan.meta1_bits_oyw)
    if plan.mip_max:
        meta1 = meta1 | (
            flat(jnp.asarray(plan.levels.astype(np.int32))) << shift
        )
        shift += plan.meta1_bits_level
    meta1 = meta1 | (total << shift)
    meta2 = (
        words_.reshape(plan.slot_words, n_pad)
        .T[:n_t]
        .reshape(n_t * plan.slot_words)
    )
    return meta1.reshape(n_pad)[:n_t], meta2


def _atan(x: jax.Array) -> jax.Array:
    """float32 arctangent via odd minimax polynomial (Mosaic has no atan).

    Max error ~2e-7 on the reduced range; source-coordinate error after
    multiplying by the focal length is < 1e-3 px — far below the bilinear
    tolerance. Range-reduces |x| > 1 through atan(x) = pi/2 - atan(1/x).
    """
    ax = jnp.abs(x)
    inv = ax > 1.0
    z = jnp.where(inv, 1.0 / jnp.maximum(ax, 1e-30), ax)
    t = z * z
    # Coefficients of the classic degree-15 odd minimax fit on [0, 1].
    p = -0.0040540580
    p = p * t + 0.0218612288
    p = p * t + -0.0559098861
    p = p * t + 0.0964200441
    p = p * t + -0.1390853351
    p = p * t + 0.1994653599
    p = p * t + -0.3332985605
    p = p * t + 0.9999993329
    r = z * p
    r = jnp.where(inv, (math.pi / 2) - r, r)
    return jnp.where(x < 0, -r, r)


def _make_kernel(plan: WarpPlan, out_camera: Camera, in_camera: Camera,
                 batched: bool = False, border: float = 0.0,
                 out_u8: bool = False, rs: bool = False):
    """``rs``: rolling-shutter mode — the rotation prefetch array carries
    ONE rotation PER OUTPUT TILE ROW (flat (ny*9,) f32; (t*ny*9,) framed),
    the per-scanline camera pose quantized to 8-row tiles (at 4K that is
    ~0.3% of the readout window — far below visibility)."""
    ww = plan.ww
    nsec = plan.sections
    nslots = plan.slots
    wh_words = plan.wh_words
    in_h, in_w = plan.in_h, plan.in_w
    ny, nx = plan.grid

    # Intrinsics as trace-time floats (camera is fixed for a clip).
    ofx, ofy = float(out_camera.fx), float(out_camera.fy)
    ocx, ocy = float(out_camera.cx), float(out_camera.cy)
    ifx, ify = float(in_camera.fx), float(in_camera.fy)
    icx, icy = float(in_camera.cx), float(in_camera.cy)
    in_fisheye = in_camera.model == CameraModel.FISHEYE
    k1, k2, k3, k4 = [float(v) for v in np.asarray(in_camera.dist)]
    # Non-rectilinear OUTPUT projections (--projection fisheye/equirect,
    # the v360 reprojection modes): the output unprojection needs
    # tan/sin/cos, which Mosaic lacks — instead the builder pipelines a
    # PRECOMPUTED per-pixel ray grid (exact f64 host math, static for the
    # clip; only the rotation changes per frame) as an extra (3, 8, 128)
    # VMEM block per tile, and the kernel applies the full 3x3 rotation.
    ray_grid = out_camera.model != CameraModel.RECTILINEAR

    nplanes = 2 if batched == "uv" else 1
    # Tap-weight polynomials resolve at kernel-BUILD time (they evaluate
    # the XLA oracle's jnp weight functions — running that inside the
    # Pallas trace would splice foreign eager ops into the kernel).
    tap_coeffs = _tap_weight_coeffs(plan.interp) if plan.taps == 4 else None

    def kernel(*refs):
        # "band" mode (spatial/TP sharding) prepends a dynamic tile-row
        # offset scalar: the shard's band start in tile rows.
        if batched == "band":
            off_ref, rot_ref, meta1_ref, meta2_ref, in_hbm, *rest = refs
        else:
            rot_ref, meta1_ref, meta2_ref, in_hbm, *rest = refs
        if ray_grid:
            rays_ref, out_ref, win, sem = rest
        else:
            out_ref, win, sem = rest
        # NOTE: a double-buffered variant (prefetch the next tile's window
        # during compute) was measured SLOWER on v5e (both the original
        # parity-select-on-values form and a slot-indexed-scratch form).
        # Single buffer, DMA started before the map math.
        if batched == "uv":
            # BOTH chroma planes of one frame per grid step: the planes
            # share the rotation, metas, map math, and schedule walk —
            # only the gathered data differs. Versus the "planes" grid
            # (one plane per step) this halves the per-tile scalar and
            # map work and fuses the two planes' windows into the same
            # schedule walk (measured ~25% faster on the chroma pass).
            ty = pl.program_id(0)
            tx = pl.program_id(1)
            gidx = ty * nx + tx
        elif batched == "band":
            # Spatial (TP) sharding: this program covers tile rows
            # [off, off + ny_band) of the full grid. Metas/windows/map
            # math use the GLOBAL tile row; output blocks and the dbuf
            # step parity use the local one. Bands are ceil(ny/nshards):
            # the clamp makes overflow tiles of the last shard recompute
            # the final row (sliced away by the caller) instead of
            # reading metadata out of bounds.
            tyl = pl.program_id(0)
            tx = pl.program_id(1)
            ty = jnp.minimum(tyl + off_ref[0], ny - 1)
            gidx = ty * nx + tx
        elif batched:
            # "frames": leading grid dim is frames with per-frame rotation
            # and (frame-folded) metas. "planes": leading dim is planes of
            # ONE frame sharing one rotation and one set of metas (U+V in
            # one dispatch).
            ti = pl.program_id(0)
            ty = pl.program_id(1)
            tx = pl.program_id(2)
            gidx = (ti * ny + ty) * nx + tx
        else:
            ty = pl.program_id(0)
            tx = pl.program_id(1)
            gidx = ty * nx + tx
        # Flat step index in EXECUTION order (equals gidx except in band
        # mode, where the grid is the local band but metas are global).
        step_idx = (tyl * nx + tx) if batched == "band" else gidx

        b_oyw = plan.meta1_bits_oyw
        b_strip = plan.meta1_bits_strip

        def tile_meta(g):
            # Metas are FLAT 1D SMEM arrays indexed by global tile id
            # (2D prefetch layouts pad rows to 128 words and blow SMEM).
            if batched in ("planes", "uv"):
                # Planes of one frame share metas: fold out the plane idx
                # ("planes": leading grid dim; "uv": leading input dim).
                midx = jax.lax.rem(g, ny * nx) if batched == "planes" else g
                src = in_hbm.at[g // (ny * nx)] if batched == "planes" else in_hbm
            elif batched and batched != "band":
                midx = g
                src = in_hbm.at[g // (ny * nx)]
            else:  # single-frame and "band" (global flat metas, one frame)
                midx = g
                src = in_hbm
            m1_ = meta1_ref[midx]
            shift = b_oyw + b_strip
            if plan.mip_max:
                lvl = (m1_ >> shift) & 3  # this tile's mip level
                shift += plan.meta1_bits_level
                if batched != "uv":  # uv applies the level per plane
                    src = src.at[lvl]
            else:
                lvl = 0
            return (
                m1_ & ((1 << b_oyw) - 1),  # word-row origin (word-granular)
                (m1_ >> b_oyw) & ((1 << b_strip) - 1),  # strip index
                m1_ >> shift,  # schedule entry count
                midx,
                lvl,
                src,
            )

        oyw, cs, total, midx, lvl, src = tile_meta(gidx)

        def window_copies(g, win_slot, sem_slot):
            """DMA descriptors for tile g's window into the given slots."""
            oyw_, cs_, _t, _m, lvl_, src_ = tile_meta(g)
            out = []
            if batched == "uv":
                # One DMA per plane into the stacked window; sem is a
                # per-plane DMA semaphore array.
                for p in range(2):
                    sp = src_.at[p]
                    if plan.mip_max:
                        sp = sp.at[lvl_]
                    win_p = (
                        win_slot.at[p, pl.ds(0, nsec)]
                        if plan.trip_group > 1
                        else win_slot.at[p]
                    )
                    out.append(pltpu.make_async_copy(
                        sp.at[pl.ds(cs_, nsec), pl.ds(oyw_, wh_words), :],
                        win_p,
                        sem_slot.at[p],
                    ))
            else:
                tgt = (
                    win_slot.at[pl.ds(0, nsec)]
                    if plan.trip_group > 1
                    else win_slot
                )
                out.append(pltpu.make_async_copy(
                    src_.at[pl.ds(cs_, nsec), pl.ds(oyw_, wh_words), :],
                    tgt,
                    sem_slot,
                ))
            return out

        if "no_dma" in plan.diag:
            # Diagnostic: no window copies at all — gathers read stale
            # VMEM (wrong pixels); times the pure vector+loop path.
            win_view = win.at[0] if plan.dbuf else win
            copies = []
        elif plan.dbuf:
            # Double-buffered window pipeline: tile g's window was
            # started at step g-1; start g+1's into the other slot, then
            # wait for g's. Hides the DMA latency (~450 ns/tile, over
            # half the kernel) behind the previous tile's compute. gidx
            # is the FLAT grid step in every mode, so g+1 is always the
            # next step's tile (crossing frame/plane boundaries too).
            nsteps = 1
            for d in range(
                3 if (batched and batched not in ("uv", "band")) else 2
            ):
                nsteps *= pl.num_programs(d)
            depth = plan.dbuf_depth
            slot = jax.lax.rem(step_idx, depth)

            def _clamped(g):
                # Tiles are globally contiguous; band mode clamps at the
                # global grid end (the last shard's overflow tiles sit
                # where g+k would run past the metas).
                return jnp.minimum(g, ny * nx - 1) if batched == "band" else g

            @pl.when(step_idx == 0)
            def _():
                # Prologue: start this tile's copy plus depth-2 tiles of
                # lookahead (slots 0..depth-2).
                for k in range(depth - 1):
                    @pl.when(jnp.asarray(k, jnp.int32) < nsteps)
                    def _(k=k):
                        for c in window_copies(
                            _clamped(gidx + k), win.at[k], sem.at[k]
                        ):
                            c.start()

            # Steady state: issue the copy depth-1 tiles ahead, then wait
            # on this tile's (started depth-1 steps ago).
            nxt = _clamped(gidx + (depth - 1))
            nxt_slot = jax.lax.rem(step_idx + (depth - 1), depth)

            @pl.when(step_idx + (depth - 1) < nsteps)
            def _():
                for c in window_copies(
                    nxt, win.at[nxt_slot], sem.at[nxt_slot]
                ):
                    c.start()

            win_view = win.at[slot]
            copies = window_copies(gidx, win_view, sem.at[slot])
        else:
            win_view = win
            copies = window_copies(gidx, win, sem)
            for c in copies:
                c.start()

        # --- map computation (the createMap math), in-register ------------
        if rs:
            # Per-TILE-ROW rotation (rolling shutter). In band mode `ty`
            # is already the GLOBAL tile row.
            if batched and batched not in ("planes", "uv", "band"):
                rbase = (ti * ny + ty) * 9
            else:
                rbase = ty * 9
            r = [rot_ref[rbase + i] for i in range(9)]
        elif batched and batched not in ("planes", "uv", "band"):
            r = [rot_ref[ti, i] for i in range(9)]
        else:
            r = [rot_ref[i] for i in range(9)]
        if ray_grid:
            gx = rays_ref[0]
            gy = rays_ref[1]
            gz = rays_ref[2]
            vx = r[0] * gx + r[1] * gy + r[2] * gz
            vy = r[3] * gx + r[4] * gy + r[5] * gz
            vz = r[6] * gx + r[7] * gy + r[8] * gz
            inv_z = 1.0 / jnp.maximum(vz, 1e-6)  # behind rays masked below
        else:
            ys = (ty * TILE_H + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)).astype(jnp.float32)
            xs = (tx * TILE_W + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)).astype(jnp.float32)
            rx = (xs - ocx) / ofx
            ry = (ys - ocy) / ofy
            vx = r[0] * rx + r[1] * ry + r[2]
            vy = r[3] * rx + r[4] * ry + r[5]
            vz = r[6] * rx + r[7] * ry + r[8]
            inv_z = 1.0 / vz
        a = vx * inv_z
        b = vy * inv_z
        if in_fisheye:
            rr = jnp.sqrt(a * a + b * b)
            theta = _atan(rr)
            if any(abs(k) > 0 for k in (k1, k2, k3, k4)):
                t2 = theta * theta
                theta = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
            scale = jnp.where(rr > 1e-8, theta / jnp.maximum(rr, 1e-8), 1.0)
            sx = ifx * a * scale + icx
            sy = ify * b * scale + icy
        else:
            sx = ifx * a + icx
            sy = ify * b + icy

        # cv::remap BORDER_CONSTANT semantics: pixels whose tap
        # neighborhood partially overlaps the image blend the inside
        # taps toward the plane's border value — outside taps vanish
        # from the section gather (the window is clamped inside the
        # zero-padded image) and the border-weight deficit term below
        # adds border*missing_weight back, so non-zero borders (chroma's
        # neutral 128) don't fringe. Fully-outside pixels (and
        # behind-camera rays) are masked to the border outright. 4-tap
        # modes reach one pixel further, so a one-pixel-wider band of
        # sources still touches the image.
        tpad = 1.0 if plan.taps == 4 else 0.0
        valid = (
            (sx > -1.0 - tpad) & (sx < in_w + tpad)
            & (sy > -1.0 - tpad) & (sy < in_h + tpad)
            & (vz > 1e-6)
        )

        if plan.mip_max:
            # Per-tile mip: sample the level-l plane at scaled coords
            # (validity above stays in full-res pixels). Levels > 0 are
            # stored shifted by one edge-replicated pixel (+1 here).
            sl = jnp.exp2(-lvl.astype(jnp.float32))
            off = jnp.where(lvl > 0, 1.0, 0.0)
            sx = (sx + 0.5) * sl - 0.5 + off
            sy = (sy + 0.5) * sl - 0.5 + off

        sxr = sx - (cs * 128).astype(jnp.float32)
        syr = sy - (oyw * 4).astype(jnp.float32)
        ix0 = jnp.floor(sxr).astype(jnp.int32)
        fx = sxr - jnp.floor(sxr)
        # Vertical taps, resolved per pixel once: tap row t lives at byte
        # (t & 3) of word row (t >> 2) (two's complement makes both exact
        # for the negative t of invalid pixels, and q < 0 never matches a
        # loop row). Variable per-lane shifts extract exactly the bytes
        # that matter instead of weighting all four.
        ty0 = jnp.floor(syr).astype(jnp.int32)
        fy = syr - jnp.floor(syr)
        if plan.taps == 4:
            # 4-tap modes (bicubic/lanczos): per-tap weight polynomials
            # in the fractional offset, evaluated once per tile (Horner;
            # exact for Keys, ~1e-7 fit for the lanczos windowed sinc).
            def _horner(c, t):
                acc = jnp.full(t.shape, c[0], jnp.float32)
                for cv in c[1:]:
                    acc = acc * t + jnp.float32(cv)
                return acc

            wxs4 = [_horner(c, fx) for c in tap_coeffs]
            wys4 = [_horner(c, fy) for c in tap_coeffs]
            qs4 = [(ty0 + j) >> 2 for j in (-1, 0, 1, 2)]
            shs4 = [((ty0 + j) & 3) << 3 for j in (-1, 0, 1, 2)]
        else:
            one_m_fx = 1.0 - fx
            q0 = ty0 >> 2
            q1 = (ty0 + 1) >> 2
            sh0 = (ty0 & 3) << 3
            sh1 = ((ty0 + 1) & 3) << 3
            wy0 = 1.0 - fy

        if border:
            # Neutral-border blending (chroma planes, border=128): taps
            # outside the window were masked to ZERO in the gathers, so a
            # partially-outside pixel blends toward 0 — a green fringe at
            # warp edges. Add back the missing taps' weight times the
            # border value, matching the XLA oracle's centered-on-128
            # sampling (pipeline/render.py chroma path). In-window
            # out-of-image taps already read the staging pad fill (128
            # for chroma, ``_pack_rows`` pad_value), so only the window
            # bound is tested. Luma (border=0) skips this: zero taps ARE
            # its border.
            if plan.taps == 4:
                xtaps = zip((-1, 0, 1, 2), wxs4)
                ytaps = zip((-1, 0, 1, 2), wys4)
            else:
                xtaps = zip((0, 1), (one_m_fx, fx))
                ytaps = zip((0, 1), (wy0, fy))
            wx_in = sum(
                w * ((ix0 + o >= 0) & (ix0 + o < nsec * 128)).astype(
                    jnp.float32)
                for o, w in xtaps)
            wy_in = sum(
                w * ((ty0 + o >= 0) & (ty0 + o < wh_words * 4)).astype(
                    jnp.float32)
                for o, w in ytaps)
            border_deficit = border * (1.0 - wx_in * wy_in)
        else:
            border_deficit = None

        for c in copies:
            c.wait()

        # Single loop over the tile's precomputed (block, section)
        # SCHEDULE from SMEM. Each 128-column window section iterates only
        # ITS OWN active word-row range (from the origin pass): the map's
        # x-curvature makes the tile-union span ~2x any single section's,
        # and untouched sections contribute zero entries. One fori_loop,
        # not one per section — loop *setup* costs ~0.1 us each on this
        # core, which at 4K tile counts was 1.4 ms/frame — and per-trip
        # decode is one SMEM word the scalar core prefetches ahead of the
        # vector pipe. Contributions distribute exactly: a tap lives in
        # one section (gathers mask the rest) and one word row (a0/a1 mask
        # the rest); alignment rows visited outside a section's range
        # carry zero a-weights for every pixel whose x-taps live there.
        # Trip starts are word-granular (the VMEM slice start is dynamic
        # and unaligned; Mosaic lowers it with a shift network once per
        # trip); the static 8-row unroll keeps ILP high.
        bits_w = plan.entry_bits_w
        bits = bits_w + plan.entry_bits_s
        epw_shift = plan.entries_per_word.bit_length() - 1
        epw_mask = plan.entries_per_word - 1
        mbase = midx * plan.slot_words

        def visit_entry(e, accs, slot):
            base = 2 * nplanes * slot
            w8 = e & ((1 << bits_w) - 1)  # word-row start (word-granular)
            sec = (e >> bits_w) & ((1 << plan.entry_bits_s) - 1)
            if nplanes == 2:
                blkvs = [
                    win_view[p, sec, pl.ds(w8, plan.trip_rows), :]
                    for p in range(2)
                ]
            else:
                blkvs = [win_view[sec, pl.ds(w8, plan.trip_rows), :]]
            local = ix0 - sec * 128
            # Gather indices and out-of-section masks are loop-invariant
            # across the 8 rows: hoist them (4 VPU ops/row saved).
            m0 = local.astype(jnp.uint32) < jnp.uint32(128)
            m1 = (local + 1).astype(jnp.uint32) < jnp.uint32(128)
            lidx0 = local & 127
            lidx1 = (local + 1) & 127
            out = list(accs)
            for rr_ in range(plan.trip_rows):
                # Vertical taps via per-pixel byte extraction: tap t
                # contributes wy0 when its word row q0 is this row, tap
                # t+1 contributes fy when q1 is (75% of the time the same
                # word, both handled in one visit). The horizontal blend
                # factors (one_m_fx / fx) are constant across rows, so the
                # left/right taps accumulate separately and blend once
                # after the loop. Row weights are shared across planes.
                row = w8 + rr_
                a0 = jnp.where(q0 == row, wy0, 0.0)
                a1 = jnp.where(q1 == row, fy, 0.0)
                for p in range(nplanes):
                    seg = jnp.broadcast_to(
                        blkvs[p][rr_ : rr_ + 1, :], (TILE_H, TILE_W)
                    )
                    g0 = jnp.where(
                        m0, jnp.take_along_axis(seg, lidx0, axis=1), 0
                    )
                    g1 = jnp.where(
                        m1, jnp.take_along_axis(seg, lidx1, axis=1), 0
                    )
                    v00 = ((g0 >> sh0) & 0xFF).astype(jnp.float32)
                    v01 = ((g0 >> sh1) & 0xFF).astype(jnp.float32)
                    v10 = ((g1 >> sh0) & 0xFF).astype(jnp.float32)
                    v11 = ((g1 >> sh1) & 0xFF).astype(jnp.float32)
                    k = base + 2 * p
                    out[k] = out[k] + (a0 * v00 + a1 * v01)
                    out[k + 1] = out[k + 1] + (a0 * v10 + a1 * v11)
            return tuple(out)

        def visit_entry4(e, accs, slot):
            # 4-tap variant: four horizontal gathers per word-row visit
            # (taps ix0-1..ix0+2) accumulating into one accumulator per
            # horizontal tap; the four vertical taps' bytes are extracted
            # per gather and combined with the per-row tap weights
            # (a_j != 0 only when tap j's word row is this row). The
            # horizontal polynomial weights blend the four accumulators
            # once after the loop.
            base = 4 * nplanes * slot
            w8 = e & ((1 << bits_w) - 1)
            sec = (e >> bits_w) & ((1 << plan.entry_bits_s) - 1)
            if nplanes == 2:
                blkvs = [
                    win_view[p, sec, pl.ds(w8, plan.trip_rows), :]
                    for p in range(2)
                ]
            else:
                blkvs = [win_view[sec, pl.ds(w8, plan.trip_rows), :]]
            local = ix0 - sec * 128
            ms = []
            lidxs = []
            for hof in (-1, 0, 1, 2):
                lh = local + hof
                ms.append(lh.astype(jnp.uint32) < jnp.uint32(128))
                lidxs.append(lh & 127)
            out = list(accs)
            for rr_ in range(plan.trip_rows):
                row = w8 + rr_
                avs = [
                    jnp.where(qs4[j] == row, wys4[j], 0.0) for j in range(4)
                ]
                for p in range(nplanes):
                    seg = jnp.broadcast_to(
                        blkvs[p][rr_ : rr_ + 1, :], (TILE_H, TILE_W)
                    )
                    for hi in range(4):
                        g = jnp.where(
                            ms[hi],
                            jnp.take_along_axis(seg, lidxs[hi], axis=1),
                            0,
                        )
                        val = (
                            avs[0] * ((g >> shs4[0]) & 0xFF).astype(jnp.float32)
                            + avs[1] * ((g >> shs4[1]) & 0xFF).astype(jnp.float32)
                            + avs[2] * ((g >> shs4[2]) & 0xFF).astype(jnp.float32)
                            + avs[3] * ((g >> shs4[3]) & 0xFF).astype(jnp.float32)
                        )
                        k = base + 4 * p + hi
                        out[k] = out[k] + val
            return tuple(out)

        if plan.taps == 4:
            visit_entry = visit_entry4  # noqa: F811

        def entry_at(i):
            word = meta2_ref[mbase + (i >> epw_shift)]
            return word >> ((i & epw_mask) * bits)

        group = max(1, plan.trip_group)
        # The uv kernel already carries 4 accumulators (2 planes x
        # left/right) — plenty of FMA-chain parallelism; splitting would
        # double register pressure for no measured gain. 4-tap modes
        # carry 4 accumulators per plane for the same reason.
        n_pairs = (
            2
            if (plan.split_acc and group > 1 and nplanes == 1
                and plan.taps == 2)
            else 1
        )
        ntap = plan.taps

        def body(i, accs):
            # `group` entries per iteration amortize the loop's
            # per-iteration overhead (~110 cycles measured — rivals a
            # trip's vector work). With split_acc, alternating entries
            # feed independent accumulator pairs to halve the loop's FMA
            # dependency chain.
            for j in range(group):
                accs = visit_entry(
                    entry_at(group * i + j) if group > 1 else entry_at(i),
                    accs,
                    j % n_pairs,
                )
            return accs

        zero = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        init = tuple(zero for _ in range(ntap * nplanes * n_pairs))
        if "no_walk" in plan.diag:
            # Diagnostic: skip the schedule walk entirely — times the
            # DMA + map-math + output path (output is all borders).
            accs = init
        elif group > 1 and plan.pred_tail:
            # FULL groups in the loop; the up-to-(group-1) leftover
            # entries run under scalar lax.cond guards. A not-taken
            # guard costs a scalar branch; a DEAD pad entry would cost
            # a whole trip's vector work.
            nfull = total // group
            accs = jax.lax.fori_loop(0, nfull, body, init)
            base = nfull * group
            for j in range(group - 1):
                accs = jax.lax.cond(
                    base + j < total,
                    lambda a, jj=j: visit_entry(
                        entry_at(base + jj), a, jj % n_pairs
                    ),
                    lambda a: a,
                    accs,
                )
        else:
            # Tail iterations visit DEAD pad entries (phantom section
            # -> gathers fully masked).
            nloop = (total + group - 1) // group if group > 1 else total
            accs = jax.lax.fori_loop(0, nloop, body, init)
        stride = ntap * nplanes
        results = []
        for p in range(nplanes):
            if ntap == 4:
                acc = (
                    wxs4[0] * accs[4 * p]
                    + wxs4[1] * accs[4 * p + 1]
                    + wxs4[2] * accs[4 * p + 2]
                    + wxs4[3] * accs[4 * p + 3]
                )
            else:
                acc_l, acc_r = accs[2 * p], accs[2 * p + 1]
                if n_pairs == 2:
                    acc_l = acc_l + accs[stride + 2 * p]
                    acc_r = acc_r + accs[stride + 2 * p + 1]
                acc = one_m_fx * acc_l + fx * acc_r
            if border_deficit is not None:
                acc = acc + border_deficit
            result = jnp.where(valid, acc, border)
            if out_u8:
                # Emit video bytes directly: quarters the output DMA and
                # removes the separate XLA rounding pass in the encode
                # loop. Mosaic has no f32->u8 cast; round through int32.
                # 4-tap kernels overshoot [0, 255] (bicubic/lanczos
                # ringing) and must clamp before the byte cast; exact
                # bilinear cannot overshoot, keep its path untouched.
                if plan.taps == 4:
                    result = jnp.clip(result, 0.0, 255.0)
                result = jnp.round(result).astype(jnp.int32).astype(
                    jnp.uint8
                )
            results.append(result)
        if batched == "uv":
            out_ref[...] = jnp.stack(results)
        elif batched and batched != "band":
            out_ref[...] = results[0][None]
        else:  # single-frame and "band": 2D (TILE_H, TILE_W) blocks
            out_ref[...] = results[0]

    return kernel


def box_downsample(frame: jax.Array, level: int) -> jax.Array:
    """``level`` rounds of 2x2 box averaging (the mip prefilter).

    Odd trailing rows/columns are edge-replicated so averages never pull
    toward a pad constant. Returns float32 for ``level > 0`` (the pack
    rounds to bytes); passes the input through untouched for level 0.
    """
    if level <= 0:
        return frame
    f = frame.astype(jnp.float32)
    for _ in range(level):
        h, w = f.shape
        if h % 2 or w % 2:
            f = jnp.pad(f, ((0, h % 2), (0, w % 2)), mode="edge")
        f = jax.lax.reduce_window(
            f, 0.0, jax.lax.add, (2, 2), (2, 2), "VALID"
        ) * 0.25
    return f


def mip_camera(cam: Camera, level: int) -> Camera:
    """Camera of ``cam``'s plane after ``level`` rounds of 2x2 box
    downsampling (dims follow :func:`box_downsample`'s edge-padded ceil)."""
    if level <= 0:
        return cam
    w, h = cam.width, cam.height
    for _ in range(level):
        w = (w + 1) // 2
        h = (h + 1) // 2
    s = 0.5 ** level
    return Camera.make(
        float(cam.fx) * s,
        float(cam.fy) * s,
        (float(cam.cx) + 0.5) * s - 0.5,
        (float(cam.cy) + 0.5) * s - 0.5,
        w,
        h,
        cam.model,
        dist=cam.dist,
    )


def mip_prefilter_level(
    out_camera: Camera,
    in_camera: Camera,
    out_size: Tuple[int, int],
    max_levels: int = 2,
) -> int:
    """Highest mip level that cannot blur ANY output pixel.

    The warp map's Jacobian at each output pixel gives the local source
    stretch; sampling from mip level L is lossless wherever the smallest
    singular value stays >= 2^L (every output direction still spans at
    least one source pixel at that level). The level is chosen from the
    MINIMUM over in-image pixels, so mixed fields (fisheye centres that
    magnify while edges minify) never prefilter — only genuinely
    minifying configurations (e.g. 4K input rendered to 1080p) do, where
    plain bilinear both aliases and pays window rows proportional to the
    scale. The reference's ``cv::remap INTER_LINEAR`` (and ffmpeg's
    scalers at default flags) alias in that regime; this is why the
    prefilter is opt-in (``--prefilter auto``) — the PSNR-vs-oracle gate
    compares against the aliasing reference.
    """
    cmap = _warp_map_np(out_camera, in_camera, np.eye(3), out_size)
    sx, sy = cmap[..., 0], cmap[..., 1]
    valid = (
        (sx >= 0) & (sx < in_camera.width)
        & (sy >= 0) & (sy < in_camera.height)
    )
    if not valid.any():
        return 0
    a = np.gradient(sx, axis=1)
    b = np.gradient(sx, axis=0)
    c = np.gradient(sy, axis=1)
    d = np.gradient(sy, axis=0)
    e = a * a + b * b + c * c + d * d
    det = a * d - b * c
    disc = np.sqrt(np.maximum(e * e - 4.0 * det * det, 0.0))
    smin = np.sqrt(np.maximum((e - disc) * 0.5, 0.0))
    s = float(smin[valid].min())
    level = 0
    while level < max_levels and s >= 2.0:
        s /= 2.0
        level += 1
    return level


def _camera_key(cam: Camera):
    return (
        float(cam.fx),
        float(cam.fy),
        float(cam.cx),
        float(cam.cy),
        tuple(float(v) for v in np.asarray(cam.dist)),
        cam.width,
        cam.height,
        cam.model,
    )


def _camera_from_key(key) -> Camera:
    """Camera with NUMPY leaf fields: safe to build/close over inside
    shard_map / jit traces (np literals stay concrete; jnp constants
    created inside a trace become tracers, and closed-over jax Arrays get
    lifted to tracers). The builders run at trace time when wrapped in an
    outer jit or shard_map, so this must never touch jnp."""
    fx, fy, cx, cy, dist, w, h, model = key
    return Camera(
        fx=np.float32(fx), fy=np.float32(fy),
        cx=np.float32(cx), cy=np.float32(cy),
        dist=np.asarray(dist, np.float32),
        width=w, height=h, model=model,
    )


_camera_from_key_np = _camera_from_key


def _pack_kernel_body(nsec: int, rows: int):
    def kernel(in_ref, out_ref):
        x = in_ref[...]  # (rows, W_pad) uint8
        for s in range(nsec):
            seg = jax.lax.slice(x, (0, s * 128), (rows, (s + 1) * 128))
            # pltpu.bitcast of a (rows, 128) uint8 tile to int32 packs 4
            # consecutive sublanes into each word's bytes little-endian —
            # exactly the quad-row word layout (verified vs the arithmetic
            # pack). This makes the pack a pure VMEM relayout at copy speed.
            out_ref[s] = pltpu.bitcast(seg, jnp.int32)
    return kernel


@functools.lru_cache(maxsize=32)
def _pack_call(in_h_pad: int, in_w_pad: int):
    nsec = in_w_pad // 128
    # Rows per grid step: bigger blocks amortize per-step overhead (the
    # pack is step-count-bound, not bandwidth-bound; 256-row blocks of a
    # 4K frame are ~1 MB of VMEM in + 1 MB out).
    rows = next(r for r in (256, 128, 64, 32) if in_h_pad % r == 0)
    return pl.pallas_call(
        _pack_kernel_body(nsec, rows),
        grid=(in_h_pad // rows,),
        in_specs=[
            pl.BlockSpec(
                (rows, in_w_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (nsec, rows // 4, 128), lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (nsec, in_h_pad // 4, 128), jnp.int32
        ),
    )


def pack_frame_words(frame: jax.Array, in_h: int, in_w: int,
                     pad_value: int = 0, use_kernel: bool = False):
    """(H, W) image -> padded quad-row word array, strip-major int32.

    Output layout (W'/128, H'/4, 128): word [s, r, l] packs rows
    4r..4r+3 of column 128s+l little-endian. A tile's window is then one
    3D DMA of `sections` vertically-stacked 128-lane strips, and the warp
    kernel addresses any (section, word-row block) pair by sublane offset
    alone. ``pad_value`` fills the alignment padding (128 for chroma
    planes so out-of-image bilinear taps blend toward neutral, not green).

    ``use_kernel`` selects the Pallas bitcast pack (a copy-speed VMEM
    relayout; TPU only). The XLA fallback (strided slices + shifts +
    strip transpose) is ~10x slower on chip but runs anywhere and is the
    interpret-mode/CPU reference.
    """
    in_h_pad = _round_up(in_h, 32)
    in_w_pad = _round_up(in_w, 128)
    if use_kernel:
        if jnp.issubdtype(frame.dtype, jnp.uint8):
            f8 = frame
        elif jnp.issubdtype(frame.dtype, jnp.integer):
            f8 = frame.astype(jnp.uint8)
        else:
            f8 = jnp.clip(
                jnp.round(frame.astype(jnp.float32)), 0.0, 255.0
            ).astype(jnp.uint8)
        if (in_h_pad, in_w_pad) != f8.shape:
            f8 = jnp.pad(
                f8,
                ((0, in_h_pad - f8.shape[0]), (0, in_w_pad - f8.shape[1])),
                constant_values=pad_value,
            )
        return _pack_call(in_h_pad, in_w_pad)(f8)
    if jnp.issubdtype(frame.dtype, jnp.integer):
        f = frame.astype(jnp.int32)  # already byte-valued: no rounding pass
    else:
        f = jnp.clip(jnp.round(frame.astype(jnp.float32)), 0.0, 255.0).astype(
            jnp.int32
        )
    if (in_h_pad, in_w_pad) != f.shape:
        f = jnp.pad(
            f,
            ((0, in_h_pad - f.shape[0]), (0, in_w_pad - f.shape[1])),
            constant_values=pad_value,
        )
    q = f.reshape(in_h_pad // 4, 4, in_w_pad)
    words = q[:, 0] | (q[:, 1] << 8) | (q[:, 2] << 16) | (q[:, 3] << 24)
    return words.reshape(in_h_pad // 4, in_w_pad // 128, 128).transpose(
        1, 0, 2
    )


def pack_frame_words_mip(frame: jax.Array, plan: WarpPlan,
                         pad_value: int = 0, use_kernel: bool = False):
    """Pack the input AND its mip chain for a per-tile-level plan.

    Returns (mip_max+1, sections0, wh_rows0, 128): every level's packed
    words padded to the LEVEL-0 padded geometry so the kernel addresses
    any level with the same window arithmetic. Levels > 0 carry one
    border-valued pixel on EVERY side (and the level coordinate
    transform shifts by +1): a full-res coordinate at the image edge
    maps to level coordinate -0.25, whose lower bilinear tap must read
    the border value (cv::remap BORDER_CONSTANT semantics) instead of
    falling off the plane and silently losing its weight.
    """
    levels = [frame]
    f = frame
    for _ in range(plan.mip_max):
        f = box_downsample(f, 1)
        levels.append(jnp.pad(f, ((1, 1), (1, 1)),
                              constant_values=float(pad_value)))
    return jnp.stack([
        pack_frame_words(p, plan.in_h, plan.in_w, pad_value=pad_value,
                         use_kernel=use_kernel)
        for p in levels
    ])


def _pack_input(frame: jax.Array, plan: WarpPlan, mip: int,
                pad_value: int, use_kernel: bool):
    """Input packing for a builder: per-tile mip stack, global
    pre-downsample, or the plain single-plane pack."""
    if plan.mip_max:
        assert mip == 0, "global mip and per-tile mip do not compose"
        return pack_frame_words_mip(frame, plan, pad_value=pad_value,
                                    use_kernel=use_kernel)
    return pack_frame_words(box_downsample(frame, mip), plan.in_h,
                            plan.in_w, pad_value=pad_value,
                            use_kernel=use_kernel)


def _ray_grid_np(out_key, out_h: int, out_w: int) -> np.ndarray:
    """(3, out_h, out_w) f32 output-ray field for non-rectilinear output
    models (tan/sin/cos evaluated exactly on host; static per clip)."""
    cam = _camera_from_key(out_key)
    ys, xs = np.mgrid[0:out_h, 0:out_w].astype(np.float64)
    rays = np.moveaxis(_unproject_np(cam, ys, xs), -1, 0)
    rays = np.nan_to_num(rays, nan=0.0, posinf=0.0, neginf=0.0)
    return np.ascontiguousarray(rays.astype(np.float32))


# A run uses 1-2 grids (luma + chroma camera); a 4K grid is ~100 MB of
# HBM, so keep the cache tight and only on the device side (the host
# array is transient).
@functools.lru_cache(maxsize=4)
def _ray_grid_dev(out_key, out_h: int, out_w: int):
    return jax.device_put(_ray_grid_np(out_key, out_h, out_w))


def _ray_in_spec(plan: WarpPlan, lead_dims: int):
    """BlockSpec for the pipelined per-tile ray block. ``lead_dims`` is
    the number of leading grid dims before (ty, tx) — rays are shared
    across frames/planes, so the index map ignores them."""
    if lead_dims:
        idx = lambda ti, ty, tx, *pf: (0, ty, tx)  # noqa: E731
    else:
        idx = lambda ty, tx, *pf: (0, ty, tx)  # noqa: E731
    return pl.BlockSpec((3, TILE_H, TILE_W), idx, memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=64)
def _build_warp_fn(plan: WarpPlan, out_key, in_key, interpret: bool,
                   border: float = 0.0, mip: int = 0, rs: bool = False):
    out_camera = _camera_from_key(out_key)
    in_camera = _camera_from_key(in_key)
    kernel = _make_kernel(plan, out_camera, in_camera, border=border, rs=rs)
    ny, nx = plan.grid
    ray_grid = out_camera.model != CameraModel.RECTILINEAR

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    if ray_grid:
        in_specs.append(_ray_in_spec(plan, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ny, nx),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (TILE_H, TILE_W),
            # index_map also receives the scalar-prefetch refs; ignore them.
            lambda ty, tx, *prefetch: (ty, tx),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=warp_scratch_shapes(plan),
    )
    call = pl.pallas_call(
        kernel,
        # Logical output is the exact crop: pallas masks the partial
        # edge blocks, which removes the (lane-unaligned, surprisingly
        # expensive ~0.7 ms/frame at 4K) crop-slice relayout entirely.
        out_shape=jax.ShapeDtypeStruct(
            (plan.crop_h, plan.crop_w), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )

    @jax.jit
    def run(frame: jax.Array, rotation: jax.Array, *rays) -> jax.Array:
        meta1, meta2 = _tile_origins(plan, out_camera, in_camera,
                                     rotation.astype(jnp.float32))
        rot9 = jnp.reshape(rotation.astype(jnp.float32), (-1,))
        words = _pack_input(frame, plan, mip, int(border),
                            not interpret)
        return call(rot9, meta1, meta2, words, *rays)

    if ray_grid:
        rays_dev = _ray_grid_dev(out_key, plan.out_h, plan.out_w)
        return lambda frame, rotation: run(frame, rotation, rays_dev)
    return run


@functools.lru_cache(maxsize=64)
def _build_warp_batch_fn(plan: WarpPlan, out_key, in_key, t: int,
                         interpret: bool, border: float = 0.0):
    """Batched variant: grid (T, ny, nx), per-frame rotations and origins.

    Amortizes dispatch + the origin pass across a small frame batch; used
    by the benchmark and any batched caller. Kernel body is shared with the
    single-frame path via an extra leading frame index.
    """
    out_camera = _camera_from_key(out_key)
    in_camera = _camera_from_key(in_key)
    kernel = _make_kernel(plan, out_camera, in_camera, batched=True,
                          border=border)
    ny, nx = plan.grid
    ray_grid = out_camera.model != CameraModel.RECTILINEAR

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    if ray_grid:
        in_specs.append(_ray_in_spec(plan, 1))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t, ny, nx),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, TILE_H, TILE_W),
            lambda ti, ty, tx, *pf: (ti, ty, tx),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=warp_scratch_shapes(plan),
    )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (t, plan.crop_h, plan.crop_w), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )

    def origins(rotations):
        m1, m2 = jax.vmap(
            lambda r: _tile_origins(plan, out_camera, in_camera, r)
        )(rotations)
        # Fold the frame axis into rows: 3D prefetch arrays pad their
        # trailing dims in SMEM and overflow it at 4K batch sizes.
        return (
            m1.reshape(t * ny * nx),
            m2.reshape(t * ny * nx * plan.slot_words),
        )
    pack = jax.vmap(
        lambda f: _pack_input(f, plan, 0, int(border), not interpret)
    )

    @jax.jit
    def run(frames: jax.Array, rotations: jax.Array, *rays) -> jax.Array:
        meta1, meta2 = origins(rotations)
        rot9 = jnp.reshape(rotations.astype(jnp.float32), (t, 9))
        words = pack(frames)
        return call(rot9, meta1, meta2, words, *rays)

    if ray_grid:
        rays_dev = _ray_grid_dev(out_key, plan.out_h, plan.out_w)
        return lambda frames, rotations: run(frames, rotations, rays_dev)
    return run


def warp_frames_pallas(
    frames: jax.Array,  # (T, H, W)
    rotations: jax.Array,  # (T, 3, 3)
    plan: WarpPlan,
    out_camera: Camera,
    in_camera: Camera,
    interpret: bool = False,
    border: float = 0.0,
    max_t: int | None = None,
) -> jax.Array:
    """Warp a batch of frames with per-frame rotations; (T, crop_h, crop_w)."""
    t = frames.shape[0]
    assert frames.shape[1:] == (plan.in_h, plan.in_w), frames.shape
    # The whole batch's tile metadata is prefetched into SMEM (~1 MB):
    # cap the per-dispatch frame count so it fits (at 4K luma that is
    # ~80 KB/frame of schedule words) and chunk larger batches. The YUV
    # hot path sidesteps this with per-frame 2D grids; this float path
    # keeps the simpler 3D grid. ``max_t`` overrides the cap (tests).
    ny, nx = plan.grid
    words_per_frame = ny * nx * (1 + plan.slot_words) + 9
    if max_t is None:
        max_t = max(1, (700_000 // 4) // max(words_per_frame, 1))
    outs = []
    for i in range(0, t, max_t):
        n = min(max_t, t - i)
        fn = _build_warp_batch_fn(
            plan, _camera_key(out_camera), _camera_key(in_camera), n,
            interpret, border,
        )
        outs.append(fn(frames[i:i + n], rotations[i:i + n]))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


@functools.lru_cache(maxsize=64)
def _build_warp_planes_fn(plan: WarpPlan, out_key, in_key, t: int,
                          interpret: bool, border: float = 0.0,
                          mip: int = 0, rs: bool = False):
    """Multi-plane variant: grid (T, ny, nx) with ONE shared rotation and
    one set of tile metas — U and V chroma planes of a frame share the
    map, so warping them in one dispatch halves the per-call overhead."""
    out_camera = _camera_from_key(out_key)
    in_camera = _camera_from_key(in_key)
    kernel = _make_kernel(plan, out_camera, in_camera, batched="planes",
                          border=border, rs=rs)
    ny, nx = plan.grid
    ray_grid = out_camera.model != CameraModel.RECTILINEAR

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    if ray_grid:
        in_specs.append(_ray_in_spec(plan, 1))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t, ny, nx),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, TILE_H, TILE_W),
            lambda ti, ty, tx, *pf: (ti, ty, tx),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=warp_scratch_shapes(plan),
    )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (t, plan.crop_h, plan.crop_w), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )

    @jax.jit
    def run(planes, rotation: jax.Array, *rays):
        meta1, meta2 = _tile_origins(plan, out_camera, in_camera,
                                     rotation.astype(jnp.float32))
        rot9 = jnp.reshape(rotation.astype(jnp.float32), (-1,))
        # Stack INSIDE the jit: an eager per-frame jnp.stack costs ~1 ms
        # of dispatch on the remote backend.
        words = jnp.stack(
            [_pack_input(f, plan, mip, int(border), not interpret)
             for f in planes]
        )
        out = call(rot9, meta1, meta2, words, *rays)
        return tuple(out[i] for i in range(t))

    if ray_grid:
        rays_dev = _ray_grid_dev(out_key, plan.out_h, plan.out_w)
        return lambda planes, rotation: run(planes, rotation, rays_dev)
    return run


def warp_planes_pallas(
    planes,  # sequence of T (H, W) planes of ONE frame (same camera pair)
    rotation: jax.Array,  # (3, 3)
    plan: WarpPlan,
    out_camera: Camera,
    in_camera: Camera,
    interpret: bool = False,
    border: float = 0.0,
    mip: int = 0,
):
    """Warp T same-geometry planes with one rotation in one dispatch."""
    t = len(planes)
    if mip == 0:
        for f in planes:
            assert f.shape == (plan.in_h, plan.in_w), (f.shape, plan)
    fn = _build_warp_planes_fn(
        plan, _camera_key(out_camera), _camera_key(in_camera), t, interpret,
        border, mip, rs=(jnp.ndim(rotation) == 3),
    )
    return fn(tuple(planes), rotation)


def _chroma_row_rotations(rot_y: jax.Array, nyc: int) -> jax.Array:
    """Chroma tile-row rotations from luma tile-row rotations.

    Chroma tile row j covers luma tile rows 2j..2j+1; using row 2j
    quantizes the scanline pose by 16 luma rows (~0.5% of the readout
    window at 4K — invisible)."""
    nyy = rot_y.shape[-3]
    idx = jnp.clip(2 * jnp.arange(nyc), 0, nyy - 1)
    return rot_y[..., idx, :, :]


@functools.lru_cache(maxsize=16)
def _build_warp_yuv_fn(plan_y: WarpPlan, out_key_y, in_key_y,
                       plan_c: WarpPlan, out_key_c, in_key_c,
                       interpret: bool, mip: int = 0, rs: bool = False):
    """ONE jitted dispatch per frame: pack Y/U/V, both origin passes, the
    luma kernel, the 2-plane chroma kernel, uint8 outputs.

    Replaces three host dispatches (luma warp, chroma warp, uint8 cast) in
    the encode hot loop; the kernels emit video bytes directly.
    ``rs``: rolling-shutter mode — rotation is (ny_luma_tiles, 3, 3).
    """
    out_cam_y = _camera_from_key(out_key_y)
    in_cam_y = _camera_from_key(in_key_y)
    out_cam_c = _camera_from_key(out_key_c)
    in_cam_c = _camera_from_key(in_key_c)

    ray_grid = out_cam_y.model != CameraModel.RECTILINEAR
    kernel_y = _make_kernel(plan_y, out_cam_y, in_cam_y, out_u8=True, rs=rs)
    ny, nx = plan_y.grid
    in_specs_y = [pl.BlockSpec(memory_space=pl.ANY)]
    if ray_grid:
        in_specs_y.append(_ray_in_spec(plan_y, 0))
    call_y = pl.pallas_call(
        kernel_y,
        out_shape=jax.ShapeDtypeStruct(
            (plan_y.crop_h, plan_y.crop_w), jnp.uint8
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(ny, nx),
            in_specs=in_specs_y,
            out_specs=pl.BlockSpec(
                (TILE_H, TILE_W),
                lambda ty, tx, *pf: (ty, tx),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=warp_scratch_shapes(plan_y),
        ),
        interpret=interpret,
    )

    kernel_c = _make_kernel(plan_c, out_cam_c, in_cam_c, batched="uv",
                            border=128.0, out_u8=True, rs=rs)
    nyc, nxc = plan_c.grid
    in_specs_c = [pl.BlockSpec(memory_space=pl.ANY)]
    if ray_grid:
        in_specs_c.append(_ray_in_spec(plan_c, 0))
    call_c = pl.pallas_call(
        kernel_c,
        out_shape=jax.ShapeDtypeStruct(
            (2, plan_c.crop_h, plan_c.crop_w), jnp.uint8
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nyc, nxc),
            in_specs=in_specs_c,
            out_specs=pl.BlockSpec(
                (2, TILE_H, TILE_W),
                lambda ty, tx, *pf: (0, ty, tx),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=warp_scratch_shapes(plan_c, "uv"),
        ),
        interpret=interpret,
    )

    use_kernel = not interpret

    @jax.jit
    def run(y, u, v, rotation, *rays):
        rot_y = rotation.astype(jnp.float32)
        rot_c = _chroma_row_rotations(rot_y, nyc) if rs else rot_y
        rot9y = jnp.reshape(rot_y, (-1,))
        rot9c = jnp.reshape(rot_c, (-1,))
        m1y, m2y = _tile_origins(plan_y, out_cam_y, in_cam_y, rot_y)
        words_y = _pack_input(y, plan_y, mip, 0, use_kernel)
        wy = call_y(rot9y, m1y, m2y, words_y, *rays[:1])
        m1c, m2c = _tile_origins(plan_c, out_cam_c, in_cam_c, rot_c)
        words_uv = jnp.stack([
            _pack_input(p, plan_c, mip, 128, use_kernel)
            for p in (u, v)
        ])
        wc = call_c(rot9c, m1c, m2c, words_uv, *rays[1:])
        return (wy, wc[0], wc[1])

    if ray_grid:
        rays_y = _ray_grid_dev(out_key_y, plan_y.out_h, plan_y.out_w)
        rays_c = _ray_grid_dev(out_key_c, plan_c.out_h, plan_c.out_w)
        return lambda y, u, v, rotation: run(y, u, v, rotation,
                                             rays_y, rays_c)
    return run


def warp_yuv_pallas(
    y: jax.Array,
    u: jax.Array,
    v: jax.Array,
    rotation: jax.Array,
    plan_y: WarpPlan,
    out_camera: Camera,
    in_camera: Camera,
    plan_c: WarpPlan,
    out_camera_c: Camera,
    in_camera_c: Camera,
    interpret: bool = False,
    mip: int = 0,
):
    """Warp a full YUV 4:2:0 frame in one dispatch; returns uint8 planes.

    ``mip > 0`` box-downsamples the inputs that many levels inside the
    dispatch (the opt-in minification prefilter); the cameras and plans
    must already describe the DOWNSAMPLED planes (:func:`mip_camera`).
    """
    fn = _build_warp_yuv_fn(
        plan_y, _camera_key(out_camera), _camera_key(in_camera),
        plan_c, _camera_key(out_camera_c), _camera_key(in_camera_c),
        interpret, mip, rs=(jnp.ndim(rotation) == 3),
    )
    return fn(y, u, v, rotation)


@functools.lru_cache(maxsize=16)
def _build_warp_yuv_batch_fn(plan_y: WarpPlan, out_key_y, in_key_y,
                             plan_c: WarpPlan, out_key_c, in_key_c,
                             t: int, interpret: bool, mip: int = 0,
                             rs: bool = False):
    """T frames per dispatch: all packs, origin passes, and per-frame
    kernels in ONE jitted call.

    Amortizes per-dispatch host overhead (~0.35 ms on a tunneled backend)
    and lets the kernels pipeline back-to-back on device. Each frame runs
    the SINGLE-frame (ny, nx)-grid kernels: a combined (T, ny, nx) grid
    with (1, 8, 128) out blocks measured ~0.75 ms/frame SLOWER than T
    2D-grid invocations in the same program (the leading grid dim's
    per-step out-block handling is pure overhead). Inputs arrive as
    per-frame tuples (device arrays); chroma planes of a frame still
    share one dispatch (the "planes" kernel) and one meta set.
    """
    out_cam_y = _camera_from_key(out_key_y)
    in_cam_y = _camera_from_key(in_key_y)
    out_cam_c = _camera_from_key(out_key_c)
    in_cam_c = _camera_from_key(in_key_c)

    ray_grid = out_cam_y.model != CameraModel.RECTILINEAR
    kernel_y = _make_kernel(plan_y, out_cam_y, in_cam_y, out_u8=True, rs=rs)
    nyy, nxy = plan_y.grid
    in_specs_y = [pl.BlockSpec(memory_space=pl.ANY)]
    if ray_grid:
        in_specs_y.append(_ray_in_spec(plan_y, 0))
    call_y = pl.pallas_call(
        kernel_y,
        out_shape=jax.ShapeDtypeStruct(
            (plan_y.crop_h, plan_y.crop_w), jnp.uint8
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nyy, nxy),
            in_specs=in_specs_y,
            out_specs=pl.BlockSpec(
                (TILE_H, TILE_W),
                lambda ty, tx, *pf: (ty, tx),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=warp_scratch_shapes(plan_y),
        ),
        interpret=interpret,
    )
    kernel_c = _make_kernel(plan_c, out_cam_c, in_cam_c, batched="uv",
                            border=128.0, out_u8=True, rs=rs)
    nyc, nxc = plan_c.grid
    in_specs_c = [pl.BlockSpec(memory_space=pl.ANY)]
    if ray_grid:
        in_specs_c.append(_ray_in_spec(plan_c, 0))
    call_c = pl.pallas_call(
        kernel_c,
        out_shape=jax.ShapeDtypeStruct(
            (2, plan_c.crop_h, plan_c.crop_w), jnp.uint8
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nyc, nxc),
            in_specs=in_specs_c,
            out_specs=pl.BlockSpec(
                (2, TILE_H, TILE_W),
                lambda ty, tx, *pf: (0, ty, tx),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=warp_scratch_shapes(plan_c, "uv"),
        ),
        interpret=interpret,
    )
    use_kernel = not interpret

    @jax.jit
    def run(ys, us, vs, rotations, *rays):
        rots = rotations.astype(jnp.float32)  # (t,3,3) or rs (t,nyy,3,3)
        rots_c = _chroma_row_rotations(rots, nyc) if rs else rots
        rot9y = rots.reshape(t, -1)
        rot9c = rots_c.reshape(t, -1)
        m1y, m2y = jax.vmap(
            lambda r: _tile_origins(plan_y, out_cam_y, in_cam_y, r)
        )(rots)
        m1c, m2c = jax.vmap(
            lambda r: _tile_origins(plan_c, out_cam_c, in_cam_c, r)
        )(rots_c)
        out = []
        for i in range(t):
            words_y = _pack_input(ys[i], plan_y, mip, 0, use_kernel)
            wy = call_y(rot9y[i], m1y[i], m2y[i], words_y, *rays[:1])
            words_uv = jnp.stack([
                _pack_input(p, plan_c, mip, 128, use_kernel)
                for p in (us[i], vs[i])
            ])
            wc = call_c(rot9c[i], m1c[i], m2c[i], words_uv, *rays[1:])
            out.append((wy, wc[0], wc[1]))
        return out

    if ray_grid:
        rays_y = _ray_grid_dev(out_key_y, plan_y.out_h, plan_y.out_w)
        rays_c = _ray_grid_dev(out_key_c, plan_c.out_h, plan_c.out_w)
        return lambda ys, us, vs, rotations: run(ys, us, vs, rotations,
                                                 rays_y, rays_c)
    return run


def warp_yuv_batch_pallas(
    ys, us, vs,  # tuples of T same-shape device arrays
    rotations: jax.Array,  # (T, 3, 3)
    plan_y: WarpPlan,
    out_camera: Camera,
    in_camera: Camera,
    plan_c: WarpPlan,
    out_camera_c: Camera,
    in_camera_c: Camera,
    interpret: bool = False,
    mip: int = 0,
):
    """Warp T YUV 4:2:0 frames in one dispatch; list of uint8 plane triples."""
    t = len(ys)
    fn = _build_warp_yuv_batch_fn(
        plan_y, _camera_key(out_camera), _camera_key(in_camera),
        plan_c, _camera_key(out_camera_c), _camera_key(in_camera_c),
        t, interpret, mip, rs=(jnp.ndim(rotations) == 4),
    )
    return fn(tuple(ys), tuple(us), tuple(vs), rotations)


@functools.lru_cache(maxsize=16)
def _build_warp_band_fn(plan: WarpPlan, out_key, in_key, nshards: int,
                        interpret: bool, border: float = 0.0):
    """Spatial (TP) variant: ONE program warps a horizontal band of the
    output grid, selected by a dynamic tile-row offset (scalar prefetch).
    Every shard runs the same executable with its own offset — the full
    tile metadata is computed per shard (cheap) and indexed globally."""
    out_camera = _camera_from_key(out_key)
    in_camera = _camera_from_key(in_key)
    kernel = _make_kernel(plan, out_camera, in_camera, batched="band",
                          border=border)
    ny, nx = plan.grid
    ny_band = -(-ny // nshards)  # ceil: last shard's overflow tiles clamp
    ray_grid = out_camera.model != CameraModel.RECTILINEAR

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    if ray_grid:
        in_specs.append(pl.BlockSpec(
            (3, TILE_H, TILE_W),
            # Same clamp as the kernel's global tile row (overflow tiles
            # of a ceil-divided last band re-fetch the final row).
            lambda tyl, tx, off, *pf: (
                0, jnp.minimum(tyl + off[0], ny - 1), tx
            ),
            memory_space=pltpu.VMEM,
        ))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # (tile-row offset, rot9, meta1, meta2)
        grid=(ny_band, nx),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (TILE_H, TILE_W),
            lambda tyl, tx, *pf: (tyl, tx),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=warp_scratch_shapes(plan),
    )
    call = pl.pallas_call(
        kernel,
        # Full band rows (no vertical crop inside a shard — the caller
        # crops the concatenated output); width masked to the crop.
        out_shape=jax.ShapeDtypeStruct(
            (ny_band * TILE_H, plan.crop_w), jnp.float32
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )

    @jax.jit
    def run(frame: jax.Array, rotation: jax.Array, tile_row_off, *rays):
        meta1, meta2 = _tile_origins(plan, out_camera, in_camera, rotation)
        rot9 = jnp.reshape(rotation.astype(jnp.float32), (9,))
        words = _pack_input(frame, plan, 0, int(border), not interpret)
        off = jnp.reshape(tile_row_off.astype(jnp.int32), (1,))
        return call(off, rot9, meta1, meta2, words, *rays)

    if ray_grid:
        rays_dev = _ray_grid_dev(out_key, plan.out_h, plan.out_w)
        return lambda frame, rotation, off: run(frame, rotation, off,
                                                rays_dev)
    return run


def warp_frame_band_pallas(
    frame: jax.Array,
    rotation: jax.Array,
    plan: WarpPlan,
    out_camera: Camera,
    in_camera: Camera,
    nshards: int,
    tile_row_off,
    interpret: bool = False,
    border: float = 0.0,
) -> jax.Array:
    """Warp output tile rows [off, off + ny/nshards) of one frame —
    the per-shard body of the spatially sharded warp."""
    fn = _build_warp_band_fn(
        plan, _camera_key(out_camera), _camera_key(in_camera), nshards,
        interpret, border,
    )
    return fn(frame, rotation, jnp.asarray(tile_row_off))


def warp_frame_pallas(
    frame: jax.Array,
    rotation: jax.Array,
    plan: WarpPlan,
    out_camera: Camera,
    in_camera: Camera,
    interpret: bool = False,
    border: float = 0.0,
    mip: int = 0,
) -> jax.Array:
    """Warp one (H, W) frame (uint8-valued). Returns (crop_h, crop_w) f32.

    ``rotation`` is the 3x3 applied to output rays (same convention as
    ``compute_warp_map`` and ``opencv/FrameSourceWarp.cpp:291-299``).
    ``border`` fills fully-outside pixels AND the image padding, so chroma
    planes warp with border=128 to keep out-of-image regions neutral
    (cv::remap BORDER_CONSTANT with a per-plane border value). Taps beyond
    the window at the top/left image edge still blend toward 0 (a <=1 px
    deviation, invisible in crop_borders configs which never sample it).

    ``mip > 0`` box-downsamples the frame that many levels inside the
    dispatch; ``plan``/``in_camera`` must describe the downsampled plane.
    """
    if mip == 0:
        assert frame.shape == (plan.in_h, plan.in_w), (frame.shape, plan)
    fn = _build_warp_fn(
        plan, _camera_key(out_camera), _camera_key(in_camera), interpret,
        border, mip, rs=(jnp.ndim(rotation) == 3),
    )
    return fn(frame, rotation)

"""Fused stabilize+undistort warp as a Pallas TPU kernel.

Replaces the reference's per-frame hot path — the ``createMap`` OpenCL kernel
(``opencv/createMap.cl:1-51``, re-run every frame because the rotation changes,
``opencv/FrameSourceWarp.cpp:272-314``) followed by ``cv::remap`` — with ONE
kernel that never materializes the map in HBM: map coordinates are computed
in-register per output tile and immediately consumed by an exact bilinear
gather.

TPU-native design
-----------------
Remap is a scattered gather, which TPUs have no native instruction for over a
full HBM image. The kernel exploits the warp's *smoothness*:

1. The output is processed in (8, 128) tiles. For each tile, the source
   pixels live in a small axis-aligned window whose per-tile origin is
   computed per frame by a cheap XLA pass over tile-corner coordinates
   (rotations between frames only shift the windows; their static size is
   chosen by the host-side planner from the cameras + a correction bound).
2. The window (static shape ``(wh, ww)``) is DMA'd HBM -> VMEM per tile.
3. Bilinear sampling runs as a loop over the window's ``wh`` rows: the two
   horizontal taps are fetched with Mosaic's *lane-axis dynamic gather*
   (``jnp.take_along_axis(..., axis=1)`` on (8, 128) operands — the only
   gather shape the TPU supports natively), using per-128-column sections
   with masked select when ``ww > 128``. The vertical hat weight
   ``max(0, 1 - |sy - row|)`` zeroes all but the two relevant rows, so the
   accumulation is exact 2x2 bilinear, bit-matching the XLA oracle to float
   rounding.

Out-of-image sources produce 0 (cv::remap BORDER_CONSTANT semantics).
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
    wh: int  # window height (rows DMA'd per tile)
    ww: int  # window width; multiple of 128
    in_h: int
    in_w: int
    # Safety margins subtracted from the corner-based per-tile origin
    # estimate, measured by the planner (interior map curvature can dip
    # below the tile-corner minimum).
    margin_x: int = 3
    margin_y: int = 3

    @property
    def grid(self) -> Tuple[int, int]:
        return (self.out_h // TILE_H, self.out_w // TILE_W)

    @property
    def sections(self) -> int:
        return self.ww // 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _warp_map_np(out_camera: Camera, in_camera: Camera, rot: np.ndarray, out_size):
    """NumPy twin of :func:`compute_warp_map` for host-side planning.

    The planner probes several rotations at full output resolution; doing
    that eagerly through JAX on a remote TPU backend is dispatch-bound, so
    the plan is computed entirely on host.
    """
    h, w = out_size
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    rx = (xs - float(out_camera.cx)) / float(out_camera.fx)
    ry = (ys - float(out_camera.cy)) / float(out_camera.fy)
    rays = np.stack([rx, ry, np.ones_like(rx)], axis=-1)
    rot = np.asarray(rot, np.float64)
    v = rays @ rot.T
    a = v[..., 0] / v[..., 2]
    b = v[..., 1] / v[..., 2]
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


def plan_warp(
    out_camera: Camera,
    in_camera: Camera,
    max_correction_deg: float = 6.0,
    out_size: Tuple[int, int] | None = None,
) -> WarpPlan:
    """Choose static window sizes by probing the map over worst-case rotations.

    Evaluates the warp map on a coarse grid for a set of extreme rotations
    (attitude already folded into ``out_camera`` usage is the caller's concern;
    ``max_correction_deg`` bounds the per-frame stabilization correction) and
    measures the maximum source extent of any (8, 128) output tile.
    """
    if out_size is None:
        out_size = (out_camera.height, out_camera.width)
    crop_h, crop_w = out_size
    out_h = _round_up(crop_h, TILE_H)
    out_w = _round_up(crop_w, TILE_W)

    ang = math.radians(max_correction_deg)
    probes = [np.eye(3)]
    for axis in ([ang, 0, 0], [0, ang, 0], [0, 0, ang],
                 [-ang, 0, 0], [0, -ang, 0], [0, 0, -ang],
                 [ang / 1.7, ang / 1.7, ang / 1.7]):
        probes.append(_rodrigues_np(np.asarray(axis, np.float64)))

    ny, nx = out_h // TILE_H, out_w // TILE_W
    max_dx = 0.0
    max_dy = 0.0
    dip_x = 0.0  # how far the interior min dips below the corner min
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
        max_dx = max(max_dx, float((bx.max(axis=(1, 3)) - tmin_x).max()))
        max_dy = max(max_dy, float((tmax_y - tmin_y).max()))
        # Sampled bounds on the same sub-tile grid _tile_origins uses; the
        # dip is how far the true extremum escapes the sampled one.
        sw = np.lib.stride_tricks.sliding_window_view
        sgx = sx[::SUB_Y, ::SUB_X]
        sgy = sy[::SUB_Y, ::SUB_X]
        smin_x = sw(sgx, (3, 5))[::2, ::4].min(axis=(2, 3))
        smin_y = sw(sgy, (3, 5))[::2, ::4].min(axis=(2, 3))
        smax_y = sw(sgy, (3, 5))[::2, ::4].max(axis=(2, 3))
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

    margin_x = int(math.ceil(dip_x)) + 3
    margin_y = int(math.ceil(dip_y)) + 3
    # Window must cover: margin below the corner min, the tile's true source
    # extent, +2 for the upper bilinear tap, and the (8, 128) alignment
    # rounding of the origins.
    wh = _round_up(int(math.ceil(max_dy)) + margin_y + 4 + 8, 8)
    ww = _round_up(int(math.ceil(max_dx)) + margin_x + 4 + 128, 128)
    # The frame is zero-padded up to the (8, 128) grid before the kernel
    # (zero padding reproduces the BORDER_CONSTANT edge exactly), so the
    # window may cover the padded extent but no more.
    wh = min(wh, _round_up(in_camera.height, 8))
    ww = min(ww, _round_up(in_camera.width, 128))
    return WarpPlan(
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
    )


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


def _tile_bounds_grid(
    plan: WarpPlan,
    out_camera: Camera,
    in_camera: Camera,
    rotation: jax.Array,
):
    """Per-tile (min, max) source bounds via a dense sampled map."""
    ny, nx = plan.grid
    ys = jnp.arange(2 * ny + 1, dtype=jnp.float32) * SUB_Y
    xs = jnp.arange(4 * nx + 1, dtype=jnp.float32) * SUB_X
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
    rays = out_camera.unproject(grid)
    rotated = jnp.einsum(
        "ij,hwj->hwi", rotation.astype(jnp.float32), rays,
        precision=jax.lax.Precision.HIGHEST,
    )
    src = in_camera.project(rotated)  # (2ny+1, 4nx+1, 2)
    # Clamp wild out-of-image coordinates (see plan_warp) before bounding.
    sx = jnp.clip(src[..., 0], -8.0, plan.in_w + 8.0)
    sy = jnp.clip(src[..., 1], -8.0, plan.in_h + 8.0)

    def per_tile(arr, op, init):
        return jax.lax.reduce_window(
            arr, init, op, window_dimensions=(3, 5), window_strides=(2, 4),
            padding="VALID",
        )

    min_x = per_tile(sx, jax.lax.min, jnp.inf)
    max_x = per_tile(sx, jax.lax.max, -jnp.inf)
    min_y = per_tile(sy, jax.lax.min, jnp.inf)
    max_y = per_tile(sy, jax.lax.max, -jnp.inf)
    return min_x, max_x, min_y, max_y


def _tile_origins(
    plan: WarpPlan,
    out_camera: Camera,
    in_camera: Camera,
    rotation: jax.Array,
):
    """Per-tile window origins + active row range for one frame (XLA pass)."""
    min_x, _, min_y, max_y = _tile_bounds_grid(plan, out_camera, in_camera, rotation)
    ox = jnp.floor(min_x - plan.margin_x).astype(jnp.int32)
    oy = jnp.floor(min_y - plan.margin_y).astype(jnp.int32)
    # HBM->VMEM DMA slices must start on the (8, 128) tile grid; round the
    # origins down (the plan adds the alignment loss to the window size).
    in_h_pad = _round_up(plan.in_h, 8)
    in_w_pad = _round_up(plan.in_w, 128)
    ox = (jnp.clip(ox, 0, max(in_w_pad - plan.ww, 0)) // 128) * 128
    oy = (jnp.clip(oy, 0, max(in_h_pad - plan.wh, 0)) // 8) * 8
    # Row range of the window that can carry nonzero vertical weight: tiles
    # in low-curvature regions span far fewer than ``wh`` rows, and the
    # kernel's row loop runs only over [0, d_hi).
    d_hi = jnp.ceil(max_y + plan.margin_y).astype(jnp.int32) - oy + 2
    d_hi = jnp.clip(d_hi, 0, plan.wh)
    return oy, ox, d_hi


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


def _gather_row(seg_rows, idx):
    """Gather ``row[idx]`` where idx may span multiple 128-wide sections.

    ``seg_rows``: list of (8, 128) arrays (the window row broadcast per
    section); ``idx``: (8, 128) int32 into the concatenated row.
    """
    out = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    for s, seg in enumerate(seg_rows):
        local = idx - s * 128
        inside = (local >= 0) & (local < 128)
        g = jnp.take_along_axis(seg, jnp.clip(local, 0, 127), axis=1)
        out = jnp.where(inside, g, out)
    return out


def _make_kernel(plan: WarpPlan, out_camera: Camera, in_camera: Camera):
    wh, ww = plan.wh, plan.ww
    nsec = plan.sections
    in_h, in_w = plan.in_h, plan.in_w

    # Intrinsics as trace-time floats (camera is fixed for a clip).
    ofx, ofy = float(out_camera.fx), float(out_camera.fy)
    ocx, ocy = float(out_camera.cx), float(out_camera.cy)
    ifx, ify = float(in_camera.fx), float(in_camera.fy)
    icx, icy = float(in_camera.cx), float(in_camera.cy)
    in_fisheye = in_camera.model == CameraModel.FISHEYE
    k1, k2, k3, k4 = [float(v) for v in np.asarray(in_camera.dist)]

    def kernel(rot_ref, oy_ref, ox_ref, dhi_ref, in_hbm, out_ref, win, sem):
        ty = pl.program_id(0)
        tx = pl.program_id(1)
        oy = pl.multiple_of(oy_ref[ty, tx], 8)
        ox = pl.multiple_of(ox_ref[ty, tx], 128)

        copy = pltpu.make_async_copy(
            in_hbm.at[pl.ds(oy, wh), pl.ds(ox, ww)], win, sem
        )
        copy.start()

        # --- map computation (the createMap math), in-register ------------
        ys = (ty * TILE_H + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)).astype(jnp.float32)
        xs = (tx * TILE_W + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)).astype(jnp.float32)
        rx = (xs - ocx) / ofx
        ry = (ys - ocy) / ofy
        # rotate (r00..r22 from SMEM)
        r = [rot_ref[i] for i in range(9)]
        vx = r[0] * rx + r[1] * ry + r[2]
        vy = r[3] * rx + r[4] * ry + r[5]
        vz = r[6] * rx + r[7] * ry + r[8]
        inv_z = 1.0 / vz
        a = vx * inv_z
        b = vy * inv_z
        if in_fisheye:
            r2 = a * a + b * b
            rr = jnp.sqrt(r2)
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

        # cv::remap BORDER_CONSTANT semantics: pixels whose 2x2 neighborhood
        # partially overlaps the image blend the inside taps with zeros. The
        # window is clamped inside the image, so taps outside it vanish from
        # the section gather automatically; only fully-outside pixels (and
        # behind-camera rays) need explicit masking.
        valid = (
            (sx > -1.0) & (sx < in_w + 0.0) & (sy > -1.0) & (sy < in_h + 0.0)
            & (vz > 1e-6)
        )

        sxr = sx - ox.astype(jnp.float32)
        syr = sy - oy.astype(jnp.float32)
        ix0 = jnp.floor(sxr).astype(jnp.int32)
        fx = sxr - jnp.floor(sxr)

        copy.wait()

        # Only rows [0, d_hi) of the window can carry nonzero vertical
        # weight for this tile; the prefetch pass computed the tile's span.
        # Mosaic requires sublane-aligned dynamic loads, so iterate over
        # aligned 8-row blocks with a static inner unroll.
        d_hi = dhi_ref[ty, tx]
        n_blocks = (d_hi + 7) // 8

        def block_body(i, acc):
            d8 = pl.multiple_of(i * 8, 8)
            blocks = [
                win[pl.ds(d8, 8), pl.ds(s * 128, 128)] for s in range(nsec)
            ]
            base = d8.astype(jnp.float32)
            for r in range(8):
                # Vertical hat weight: nonzero only for 2 bracketing rows.
                wy = jnp.maximum(1.0 - jnp.abs(syr - (base + float(r))), 0.0)
                segs = [
                    jnp.broadcast_to(b[r : r + 1, :], (TILE_H, TILE_W))
                    for b in blocks
                ]
                v0 = _gather_row(segs, ix0)
                v1 = _gather_row(segs, ix0 + 1)
                acc = acc + wy * (v0 * (1.0 - fx) + v1 * fx)
            return acc

        acc = jax.lax.fori_loop(
            0, n_blocks, block_body, jnp.zeros((TILE_H, TILE_W), jnp.float32)
        )
        out_ref[...] = jnp.where(valid, acc, 0.0)

    return kernel


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
    fx, fy, cx, cy, dist, w, h, model = key
    return Camera.make(fx, fy, cx, cy, w, h, model, dist=jnp.asarray(dist))


@functools.lru_cache(maxsize=64)
def _build_warp_fn(plan: WarpPlan, out_key, in_key, interpret: bool):
    out_camera = _camera_from_key(out_key)
    in_camera = _camera_from_key(in_key)
    kernel = _make_kernel(plan, out_camera, in_camera)
    ny, nx = plan.grid

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ny, nx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (TILE_H, TILE_W),
            # index_map also receives the scalar-prefetch refs; ignore them.
            lambda ty, tx, *prefetch: (ty, tx),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((plan.wh, plan.ww), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((plan.out_h, plan.out_w), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )

    in_h_pad = _round_up(plan.in_h, 8)
    in_w_pad = _round_up(plan.in_w, 128)

    @jax.jit
    def run(frame: jax.Array, rotation: jax.Array) -> jax.Array:
        oy, ox, d_hi = _tile_origins(plan, out_camera, in_camera, rotation)
        rot9 = jnp.reshape(rotation.astype(jnp.float32), (9,))
        frame = frame.astype(jnp.float32)
        if (in_h_pad, in_w_pad) != frame.shape:
            frame = jnp.pad(
                frame,
                ((0, in_h_pad - frame.shape[0]), (0, in_w_pad - frame.shape[1])),
            )
        out = call(rot9, oy, ox, d_hi, frame)
        return out[: plan.crop_h, : plan.crop_w]

    return run


def warp_frame_pallas(
    frame: jax.Array,
    rotation: jax.Array,
    plan: WarpPlan,
    out_camera: Camera,
    in_camera: Camera,
    interpret: bool = False,
) -> jax.Array:
    """Warp one (H, W) float32 frame. Returns (crop_h, crop_w) float32.

    ``rotation`` is the 3x3 applied to output rays (same convention as
    ``compute_warp_map`` and ``opencv/FrameSourceWarp.cpp:291-299``).
    """
    assert frame.shape == (plan.in_h, plan.in_w), (frame.shape, plan)
    fn = _build_warp_fn(plan, _camera_key(out_camera), _camera_key(in_camera), interpret)
    return fn(frame, rotation)

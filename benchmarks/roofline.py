"""Roofline for the fused warp kernel: turn "near the bound" into math.

The luma kernel's steady state is ~175 ns per (8, 128) output tile
(docs/KERNEL.md). This script measures the primitive issue rates that
bound it, on the real chip, with stripped Pallas microkernels:

- ``fma``:    chained elementwise multiply-add on an (8, 128) f32 tile —
              the VPU op issue rate (ns per vector op).
- ``gather``: chained ``take_along_axis`` lane gathers over an (8, 128)
              int32 operand + the byte unpack (shift/mask/convert) and
              masked accumulate that the schedule walk performs per word
              row — ns per "row visit".
- ``loop``:   an empty ``fori_loop`` body — per-iteration scalar decode
              overhead (the reason entries walk in trip groups).

Each rate comes from TWO unroll factors (slope = marginal cost, so the
fori/grid overhead cancels). The floor is then assembled from the plan's
own statistics (entries/tile, trip rows) and compared against the
measured per-tile time; the result is written to
``benchmarks/roofline.json`` and the arithmetic belongs in
docs/KERNEL.md.

Run on the chip:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/roofline.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

SHAPE = (8, 128)
# Enough fori iterations that kernel time (ms-scale) dominates the
# remote-tunnel dispatch jitter; rates come from unroll-factor slopes.
OUTER = 100_000


def _time_call(fn, *args, reps=7):
    """Best-of timing with HOST MATERIALIZATION of the result.

    ``block_until_ready`` proved unreliable for small Pallas outputs on
    the remote backend (returned in ~25 us, under the tunnel RTT);
    ``np.asarray`` forces true completion. The fetch constant cancels in
    the unroll-factor slopes used below.
    """
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def _sync(out):
    """Force completion by fetching a tiny slice of the result (a full
    np.asarray would be tunnel-bound; a dependent slice read is not)."""
    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(leaf.ravel()[:8])


def _time_batched(fn, *args, reps=5, depth=2):
    """Best per-dispatch time with `depth` dispatches in flight — the
    encode loop's shape; amortizes the tunnel's per-dispatch latency."""
    _sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(depth * 2)]
        for o in outs:
            _sync(o)
        best = min(best, (time.perf_counter() - t0) / (depth * 2))
    return best


def _fma_kernel(unroll):
    def kernel(x_ref, o_ref):
        x = x_ref[...]

        def body(_, acc):
            for _ in range(unroll):
                acc = acc * 0.999999 + x
            return acc

        o_ref[...] = jax.lax.fori_loop(0, OUTER, body, x)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
    )


def measure_fma():
    # Slope between unroll factors: the dispatch/fetch constant and the
    # fori overhead cancel, leaving the pure chained-FMA rate.
    x = jnp.ones(SHAPE, jnp.float32) * 0.5
    t8 = _time_call(jax.jit(_fma_kernel(8)), x)
    t64 = _time_call(jax.jit(_fma_kernel(64)), x)
    per_op = (t64 - t8) / ((64 - 8) * OUTER)
    return per_op * 1e9


def _gather_kernel(unroll):
    """One 'row visit' of the schedule walk per unroll step: 2 lane
    gathers over a broadcast word row, 2 out-of-section masks, 4 byte
    extractions, 2 weighted accumulates (cf. warp_pallas.py visit_entry).
    """

    def kernel(seg_ref, idx_ref, o_ref):
        lidx0 = idx_ref[...]
        lidx1 = (lidx0 + 1) & 127
        m0 = lidx0.astype(jnp.uint32) < jnp.uint32(128)
        m1 = (lidx0 + 1).astype(jnp.uint32) < jnp.uint32(128)
        wy0 = lidx0.astype(jnp.float32) * 0.001
        fy = 1.0 - wy0

        def body(i, accs):
            a0, a1 = accs
            for u in range(unroll):
                # Dynamic-start ref read + broadcast, the schedule walk's
                # own idiom (warp_pallas.py: win_view[..., pl.ds(w8), :]).
                row = (i * unroll + u) % 8
                seg = jnp.broadcast_to(seg_ref[pl.ds(row, 1), :], SHAPE)
                g0 = jnp.where(m0, jnp.take_along_axis(seg, lidx0, axis=1), 0)
                g1 = jnp.where(m1, jnp.take_along_axis(seg, lidx1, axis=1), 0)
                v00 = ((g0 >> 0) & 0xFF).astype(jnp.float32)
                v01 = ((g0 >> 8) & 0xFF).astype(jnp.float32)
                v10 = ((g1 >> 0) & 0xFF).astype(jnp.float32)
                v11 = ((g1 >> 8) & 0xFF).astype(jnp.float32)
                a0 = a0 + (wy0 * v00 + fy * v01)
                a1 = a1 + (wy0 * v10 + fy * v11)
            return (a0, a1)

        z = jnp.zeros(SHAPE, jnp.float32)
        a0, a1 = jax.lax.fori_loop(0, OUTER, body, (z, z))
        o_ref[...] = a0 + a1

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.float32),
    )


def measure_gather():
    rng = np.random.default_rng(0)
    seg = jnp.asarray(rng.integers(0, 2**31, SHAPE, dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, 128, SHAPE, dtype=np.int32))
    t2 = _time_call(jax.jit(_gather_kernel(2)), seg, idx)
    t8 = _time_call(jax.jit(_gather_kernel(8)), seg, idx)
    per_visit = (t8 - t2) / ((8 - 2) * OUTER)
    return per_visit * 1e9


def measure_plan_stats():
    """The 4K luma plan's schedule statistics + measured per-tile time."""
    from video_annotator_tpu.camera import (
        CameraPreset,
        get_output_camera,
        get_preset_camera,
    )
    from video_annotator_tpu.ops.warp_pallas import (
        plan_warp,
        warp_frame_pallas,
    )
    from video_annotator_tpu import so3

    w, h = 3840, 2880
    in_cam = get_preset_camera(CameraPreset.GOPRO_H4B_WIDE43_MEASURED, (w, h))
    out_cam = get_output_camera(in_cam, crop_borders=True)
    plan = plan_warp(out_cam, in_cam, max_correction_deg=6.0)
    tiles = plan.grid[0] * plan.grid[1]

    from video_annotator_tpu.ops.warp_pallas import warp_frames_pallas

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (h, w), dtype=np.uint8))
    rot = so3.exp(jnp.asarray([0.02, -0.02, 0.01], jnp.float32))
    # Batched like the encode path (amortizes pack/origins + dispatch).
    B = 16
    imgs = jnp.broadcast_to(img, (B, h, w))
    rots = jnp.broadcast_to(rot, (B, 3, 3))
    fn = jax.jit(lambda f, r: warp_frames_pallas(
        f, r, plan, out_cam, in_cam))
    dt = _time_batched(fn, imgs, rots) / B
    # STEADY STATE via the batch-size slope: (t(B=16) - t(B=4)) / 12
    # cancels every per-dispatch constant — host dispatch, tunnel RTT,
    # pack/origin passes issued once per call — leaving the marginal
    # per-frame kernel time. This is the figure docs/KERNEL.md quotes;
    # the raw ns_per_tile_measured above keeps the whole-dispatch view
    # and varies with tunnel health (VERDICT r2 item 3a recorded a
    # degraded-session 1162 ns there while the doc said ~520).
    B_small = 4
    fn_s = jax.jit(lambda f, r: warp_frames_pallas(
        f, r, plan, out_cam, in_cam))
    dt_small = _time_batched(
        fn_s, jnp.broadcast_to(img, (B_small, h, w)),
        jnp.broadcast_to(rot, (B_small, 3, 3)))
    dt_steady = (_time_batched(fn, imgs, rots) - dt_small) / (B - B_small)
    # Single-frame dispatch for comparison. NOTE: _time_call
    # materializes the full ~10 MB output on the host, so over the dev
    # tunnel (~30 MB/s) this is ~300-400 ms of TRANSFER, not kernel —
    # the field name says so. On a PCIe host it would read ~5 ms.
    f1 = jax.jit(lambda f, r: warp_frame_pallas(
        f, r, plan, out_cam, in_cam))
    dt1 = _time_call(lambda: f1(img, rot))
    # Rough schedule size: entries/tile from the plan's slot occupancy is
    # content-dependent; docs/KERNEL.md's measured average is ~3.7
    # entries with trip_rows=8 word rows each.
    return {
        "tiles": int(tiles),
        "grid": [int(g) for g in plan.grid],
        "trip_rows": int(plan.trip_rows),
        "luma_ms_measured": round(dt * 1e3, 3),
        "luma_ms_steady_state": round(dt_steady * 1e3, 3),
        "luma_ms_single_dispatch_plus_host_fetch": round(dt1 * 1e3, 3),
        "ns_per_tile_measured": round(dt / tiles * 1e9, 1),
        "ns_per_tile_steady_state": round(dt_steady / tiles * 1e9, 1),
    }


def main():
    out = {}
    out["vpu_fma_chain_ns_per_op"] = round(measure_fma(), 3)
    out["row_visit_ns"] = round(measure_gather(), 2)
    out.update(measure_plan_stats())

    # Vector floor: entries/tile * trip_rows row visits at the measured
    # visit rate + one fori iteration per trip group of 4 entries
    # (~110 cycles scalar decode, docs/KERNEL.md) + map math + grid step.
    entries = 3.7  # measured average, docs/KERNEL.md
    visits = entries * out["trip_rows"]
    vector_floor = (
        visits * out["row_visit_ns"]
        + (entries / 4.0) * 117.0  # fori decode, ~110 cy @ 0.94 GHz
        + 95.0  # in-register map math, component-stripped (KERNEL.md)
        + 2.1  # grid overhead ns/step (KERNEL.md)
    )
    # DMA floor: the window copy is ~450 ns/tile of LATENCY (48 KB is
    # only ~60 ns of HBM bandwidth) and the double buffer hides at most
    # one tile's compute of it.
    dma_latency = 450.0
    dma_floor = max(60.0, dma_latency - vector_floor)
    out["vector_floor_ns_per_tile"] = round(vector_floor, 1)
    out["dma_latency_ns_per_tile"] = dma_latency
    out["floor_ns_per_tile"] = round(max(vector_floor, dma_latency), 1)
    # Headroom is judged against the STEADY-STATE rate (dispatch-free
    # slope); the raw-dispatch variant stays for context.
    out["headroom_vs_floor_pct"] = round(
        100.0 * (1.0 - out["floor_ns_per_tile"]
                 / out["ns_per_tile_steady_state"]), 1)
    out["headroom_vs_floor_raw_dispatch_pct"] = round(
        100.0 * (1.0 - out["floor_ns_per_tile"]
                 / out["ns_per_tile_measured"]), 1)
    out["headroom_if_dma_hidden_pct"] = round(
        100.0 * (1.0 - vector_floor / out["ns_per_tile_steady_state"]), 1)
    from provenance import stamp

    stamp(out)
    print(json.dumps(out, indent=2))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "roofline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()

"""Side-by-side comparison grids (the ``--compare`` feature).

The reference renders N stabilizers into one tiled video by building N
parallel ffmpeg sub-graphs and compositing with ``overlay_opencl``
(``getComparisonPipeline``, ``src/render.ts:1052-1223``; grid solver at
``src/render.ts:1013-1050``). Natively this is simpler and cheaper: the
motion analysis runs ONCE, each mode derives its corrections from the same
trajectory, and tiles are assembled on device with array ops.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from video_annotator_tpu.io.video import VideoMeta, open_reader, open_writer
from video_annotator_tpu.pipeline.profiler import StageProfiler
from video_annotator_tpu.pipeline.render import (
    FrameWarper,
    RenderOptions,
    analyse,
    build_cameras,
    compute_corrections,
)


def comparison_grid_size(n: int, cell_aspect: float = 4 / 3) -> tuple[int, int]:
    """(rows, cols) minimizing empty cells, then squareness — the policy of
    the reference's grid solver (``src/render.ts:1013-1050``)."""
    best = None
    for cols in range(1, n + 1):
        rows = -(-n // cols)
        waste = rows * cols - n
        # prefer wider-than-tall layouts for typical video aspect
        skew = abs(cols / max(rows, 1) - 1.5)
        key = (waste, skew)
        if best is None or key < best[0]:
            best = (key, (rows, cols))
    return best[1]


def render_compare(
    source: str,
    dest: str,
    modes: Sequence[str],
    options: RenderOptions,
    profiler: StageProfiler | None = None,
) -> None:
    """Render each stabilise mode into one tiled output video."""
    prof = profiler or StageProfiler()
    needs_motion = any(m != "none" for m in modes)
    traj = analyse(source, options, prof) if needs_motion else None

    reader = open_reader(source)
    meta = reader.meta
    if traj is None:
        from video_annotator_tpu.pipeline.trajectory import Trajectory

        n = meta.num_frames or 0
        traj = Trajectory(np.zeros((n, 3)), "so3", meta.fps, meta.width, meta.height, source)

    in_cam, out_cam = build_cameras(meta, options)
    warper = FrameWarper(in_cam, out_cam, options.max_correction_deg,
                         prefilter=options.prefilter == "auto")
    per_mode = []
    for m in modes:
        o = dataclasses.replace(options, stabilise=m)
        per_mode.append(compute_corrections(traj, o))

    rows, cols = comparison_grid_size(len(modes))
    cell_h = warper.out_h - warper.out_h % 2
    cell_w = warper.out_w - warper.out_w % 2
    out_meta = VideoMeta(cell_w * cols, cell_h * rows, meta.fps, traj.num_frames)
    writer = open_writer(None if options.no_output else dest, out_meta,
                         encoder=options.encoder)

    def tile(planes_list, scale):
        h, w = cell_h // scale, cell_w // scale
        canvas = np.zeros((h * rows, w * cols), np.uint8)
        for i, p in enumerate(planes_list):
            r, c = divmod(i, cols)
            canvas[r * h : (r + 1) * h, c * w : (c + 1) * w] = np.clip(
                np.round(np.asarray(p[:h, :w])), 0, 255
            ).astype(np.uint8)
        return canvas

    first = 0
    t = 0
    for y, u, v in prof.wrap_iter("decode", iter(reader)):
        if t >= traj.num_frames:
            break
        ys, us, vs = [], [], []
        with prof.stage("warp"):
            yj = jnp.asarray(y, jnp.float32)
            uj = jnp.asarray(u, jnp.float32)
            vj = jnp.asarray(v, jnp.float32)
            for corr in per_mode:
                rot = jnp.asarray(corr[t], jnp.float32)
                wy, wu, wv = warper(yj, uj, vj, rot)
                ys.append(wy)
                us.append(wu)
                vs.append(wv)
        with prof.stage("encode"):
            writer.write((tile(ys, 1), tile(us, 2), tile(vs, 2)))
        t += 1
    writer.close()
    reader.close()
    if options.verbose:
        print(prof.report())

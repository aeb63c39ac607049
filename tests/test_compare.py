"""Comparison grid (the reference's --compare / dewobble_test.sh "comp"
mode, ``src/render.ts:1013-1223``): grid solver policy + end-to-end tiled
render on the CPU path."""

import numpy as np

from video_annotator_tpu.io.y4m import Y4MReader
from video_annotator_tpu.pipeline.compare import (
    comparison_grid_size,
    render_compare,
)
from video_annotator_tpu.pipeline.render import RenderOptions


def test_comparison_grid_size_policy():
    # No wasted cells when n factors nicely; wider-than-tall preferred.
    assert comparison_grid_size(1) == (1, 1)
    assert comparison_grid_size(2) == (1, 2)
    assert comparison_grid_size(4) == (2, 2)
    rows, cols = comparison_grid_size(3)
    assert rows * cols == 3
    rows, cols = comparison_grid_size(6)
    assert rows * cols == 6 and cols >= rows


def test_render_compare_end_to_end(tmp_path):
    src = "synthetic://shaky?w=192&h=144&n=8&fps=30&seed=4&shake=0.004"
    dest = str(tmp_path / "cmp.y4m")
    options = RenderOptions(stabilise_radius=3, preset=None, input_dfov=120.0)
    modes = ["none", "smooth"]
    render_compare(src, dest, modes, options)

    frames = [planes for planes in Y4MReader(dest)]
    assert len(frames) == 8
    y, u, v = frames[0]
    rows, cols = comparison_grid_size(len(modes))
    # Grid canvas: cell dims x grid layout; chroma half-res.
    assert y.shape[0] % rows == 0 and y.shape[1] % cols == 0
    assert u.shape == (y.shape[0] // 2, y.shape[1] // 2)
    # The two cells must differ (stabilized vs raw) but share content:
    h, w = y.shape[0] // rows, y.shape[1] // cols
    cell0 = y[:h, :w].astype(np.float32)
    cell1 = y[:h, w : 2 * w].astype(np.float32) if cols > 1 else y[h:, :w].astype(np.float32)
    assert np.abs(cell0 - cell1).mean() > 0.1  # not identical frames
    # Both cells carry real image content (not blank).
    assert cell0.std() > 5 and cell1.std() > 5


def test_render_compare_family_grid(tmp_path):
    """The reference's 4-way comp grid (dewobble_test.sh:47-62):
    dewobble-none / dewobble-sg / vidstab / deshake_opencl in one video."""
    src = "synthetic://shaky?w=192&h=144&n=6&fps=30&seed=5&shake=0.005"
    dest = str(tmp_path / "comp4.y4m")
    options = RenderOptions(stabilise_radius=2, preset=None, input_dfov=120.0)
    modes = ["none", "smooth", "vidstab", "deshake"]
    render_compare(src, dest, modes, options)

    frames = [planes for planes in Y4MReader(dest)]
    assert len(frames) == 6
    y, u, v = frames[2]
    rows, cols = comparison_grid_size(4)
    assert (rows, cols) == (2, 2)
    h, w = y.shape[0] // rows, y.shape[1] // cols
    cells = [
        y[r * h:(r + 1) * h, c * w:(c + 1) * w].astype(np.float32)
        for r in range(rows) for c in range(cols)
    ]
    # Every family rendered real content into its cell.
    for i, cell in enumerate(cells):
        assert cell.std() > 5, f"cell {i} blank"


def test_parse_mode_lock_suffix():
    import pytest

    from video_annotator_tpu.pipeline.compare import _parse_mode

    assert _parse_mode("horizon") == ("rotation", "none", True)
    assert _parse_mode("smooth+lock") == ("rotation", "smooth", True)
    assert _parse_mode("none") == ("rotation", "none", False)
    assert _parse_mode("vidstab:fixed") == ("similarity", "fixed", False)
    with pytest.raises(ValueError, match="lock"):
        _parse_mode("vidstab+lock")
    with pytest.raises(ValueError):
        _parse_mode("smooth+shiny")


def test_render_compare_horizon_cell(tmp_path):
    """A 'horizon' cell (gravity roll leveling) differs from the raw cell."""
    src = "synthetic://shaky?w=192&h=144&n=6&fps=30&seed=6&shake=0.006"
    dest = str(tmp_path / "hz.y4m")
    options = RenderOptions(stabilise_radius=2, preset=None, input_dfov=120.0)
    render_compare(src, dest, ["none", "horizon"], options)

    frames = [planes for planes in Y4MReader(dest)]
    assert len(frames) == 6
    y = frames[-1][0]
    rows, cols = comparison_grid_size(2)
    h, w = y.shape[0] // rows, y.shape[1] // cols
    cell0 = y[:h, :w].astype(np.float32)
    cell1 = y[:h, w:].astype(np.float32)
    assert np.abs(cell0 - cell1).mean() > 0.05  # leveling changed the cell
    assert cell0.std() > 5 and cell1.std() > 5


def test_render_compare_honors_trim(tmp_path):
    src = "synthetic://shaky?w=192&h=144&n=12&fps=30&seed=7&shake=0.004"
    dest = str(tmp_path / "trim.y4m")
    options = RenderOptions(stabilise_radius=2, preset=None, input_dfov=120.0,
                            start=0.2, duration=0.2)  # frames 6..11
    render_compare(src, dest, ["none", "smooth"], options)
    frames = [p for p in Y4MReader(dest)]
    assert len(frames) == 6, len(frames)


def test_compare_chroma_padding_neutral(tmp_path):
    """Cells smaller than the grid cell (deshake warps at INPUT size while
    the rotation cell auto-fits larger) pad with NEUTRAL chroma (128), not
    0 — zero-chroma padding renders saturated green bands."""
    src = "synthetic://shaky?w=192&h=144&n=4&fps=30&seed=4&shake=0.004"
    dest = str(tmp_path / "cmp.y4m")
    options = RenderOptions(stabilise_radius=2, preset=None, input_dfov=120.0)
    render_compare(src, dest, ["smooth", "deshake"], options)
    y, u, v = next(iter(Y4MReader(dest)))
    # Padding pixels exist (cell sizes differ) and are neutral: no pixel
    # of the chroma planes may sit at hard zero.
    assert u.min() > 0 and v.min() > 0


def test_compare_cell_labels(tmp_path):
    """Cells carry their mode name by default (white-on-outline text in
    the top-left); --no-cell-labels restores the reference's unlabeled
    grid exactly."""
    src = "synthetic://shaky?w=192&h=144&n=2&fps=30&seed=4&shake=0.004"
    options = RenderOptions(stabilise_radius=2, preset=None, input_dfov=120.0)
    modes = ["none", "smooth"]
    labeled = str(tmp_path / "lab.y4m")
    plain = str(tmp_path / "plain.y4m")
    render_compare(src, labeled, modes, options)
    render_compare(src, plain, modes,
                   __import__("dataclasses").replace(options,
                                                     cell_labels=False))
    (ly, lu, lv), (py, pu, pv) = (next(iter(Y4MReader(labeled))),
                                  next(iter(Y4MReader(plain))))
    rows, cols = comparison_grid_size(len(modes))
    ch, cw = ly.shape[0] // rows, ly.shape[1] // cols
    # Chroma untouched (labels are luma-only = colorless text).
    assert np.array_equal(lu, pu) and np.array_equal(lv, pv)
    diff = ly.astype(np.int16) - py.astype(np.int16)
    for i in range(len(modes)):
        r, c = divmod(i, cols)
        cell = diff[r * ch : (r + 1) * ch, c * cw : (c + 1) * cw]
        # the label lives in the cell's top-left quadrant only
        assert np.abs(cell[: ch // 2, : cw // 2]).max() > 60, f"cell {i}"
        assert np.abs(cell[ch // 2 :, :]).max() == 0, f"cell {i} bottom"
        assert np.abs(cell[:, cw // 2 :]).max() == 0, f"cell {i} right"


def test_render_compare_all_none_honors_trim(tmp_path):
    """All-'none' grids take the placeholder-trajectory path (no motion
    analysis runs); the placeholder must cover only the TRIM WINDOW —
    sizing it to the whole clip rendered --start..EOF and wrote a wrong
    frame count into the header."""
    import pytest

    src = "synthetic://shaky?w=192&h=144&n=12&fps=30&seed=7&shake=0.004"
    dest = str(tmp_path / "trimnone.y4m")
    options = RenderOptions(stabilise_radius=2, preset=None,
                            input_dfov=120.0, start=0.2, duration=0.2)
    render_compare(src, dest, ["none"], options)
    assert len(list(Y4MReader(dest))) == 6


def test_render_compare_frame_rate(tmp_path):
    """--frame-rate retimes compare grids like every other render path
    (same frames, new fps header)."""
    from fractions import Fraction

    src = "synthetic://shaky?w=192&h=144&n=4&fps=30&seed=7&shake=0.004"
    dest = str(tmp_path / "fr.y4m")
    options = RenderOptions(stabilise_radius=2, preset=None,
                            input_dfov=120.0, frame_rate=15.0)
    render_compare(src, dest, ["none", "smooth"], options)
    r = Y4MReader(dest)
    assert r.header.fps == Fraction(15, 1)
    assert sum(1 for _ in r) == 4


def test_parse_mode_rejects_bad_stabilise():
    """A typo'd ':stabilise' suffix must raise for 2D families too (they
    have no later validation layer, unlike rotation cells)."""
    import pytest

    from video_annotator_tpu.pipeline.compare import _parse_mode

    assert _parse_mode("vidstab:fixed") == ("similarity", "fixed", False)
    with pytest.raises(ValueError, match="fixd"):
        _parse_mode("vidstab:fixd")


def test_render_compare_rejects_rolling_shutter(tmp_path):
    import pytest

    options = RenderOptions(stabilise_radius=2, preset=None,
                            input_dfov=120.0, rolling_shutter=1.0)
    with pytest.raises(ValueError, match="rolling-shutter"):
        render_compare("synthetic://shaky?w=96&h=64&n=2", str(tmp_path / "x.y4m"),
                       ["none"], options)

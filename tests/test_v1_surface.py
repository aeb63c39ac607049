"""v1.0 surface freeze: docs stay in sync with the parser; the README
quickstart commands run verbatim-shaped on a fresh checkout.

The reference's user surface is ``src/cli.ts:28-178``; ours is frozen at
v1.0 (docs/MIGRATION.md "Stable surface & environment knobs"). These
tests make the freeze enforceable: every render option must be
documented, and the quickstart's render/compare/probe flow must work
end to end with default options.
"""

import json
import os

import numpy as np

from video_annotator_tpu.cli import build_parser, main

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Spelling variants / argparse artifacts that need no doc row of their own.
_DOC_EXEMPT = {
    "--help",
    "--stabilize",  # alias of --stabilise (documented)
    "-h2",  # argparse-safe alias of -h (documented as -h2/--height)
}


def _render_parser():
    p = build_parser()
    for a in p._subparsers._group_actions[0].choices.items():  # noqa: SLF001
        if a[0] == "render":
            return a[1]
    raise AssertionError("no render subparser")


def test_migration_documents_every_render_option():
    """docs/MIGRATION.md's option tables cover the full --help surface
    (the v1.0 freeze claims they are kept in sync by this test)."""
    with open(os.path.join(REPO, "docs", "MIGRATION.md")) as f:
        doc = f.read()
    missing = []
    for action in _render_parser()._actions:  # noqa: SLF001
        for opt in action.option_strings:
            if not opt.startswith("--") or opt in _DOC_EXEMPT:
                continue
            if opt not in doc:
                missing.append(opt)
    assert not missing, f"undocumented render options: {missing}"


def test_env_knobs_documented():
    """Every VAT_* env var read by the package appears in the
    MIGRATION.md knob table (the deprecation-policy surface)."""
    import re
    import subprocess

    out = subprocess.run(
        ["grep", "-rhno", r"VAT_[A-Z_]\+", "video_annotator_tpu"],
        capture_output=True, text=True, cwd=REPO,
    ).stdout
    knobs = sorted({m for m in re.findall(r"VAT_[A-Z_]+", out)})
    with open(os.path.join(REPO, "docs", "MIGRATION.md")) as f:
        doc = f.read()
    missing = [k for k in knobs if k not in doc]
    assert not missing, f"undocumented env knobs: {missing}"


def test_readme_quickstart_smoke(tmp_path):
    """The quickstart flow with STOCK options (auto analysis mode — the
    round-4 default flip): render --stabilise smooth, a compare grid,
    and probe, on a small synthetic clip."""
    src = "synthetic://shaky?w=192&h=144&n=12&seed=3&shake=0.004"
    out = str(tmp_path / "out.y4m")
    assert main(["render", src, out, "--stabilise", "smooth",
                 "--stabilise-radius", "4"]) == 0
    assert os.path.getsize(out) > 0

    grid = str(tmp_path / "grid.y4m")
    assert main(["compare", src, grid, "--compare", "none,smooth",
                 "--stabilise-radius", "4"]) == 0
    assert os.path.getsize(grid) > 0

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["probe", out]) == 0
    meta = json.loads(buf.getvalue())
    assert meta["video"]["num_frames"] == 12

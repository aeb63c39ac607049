"""Provenance stamps for committed benchmark artifacts.

Every benchmark emitter (`run.py`, `roofline.py`, `soak.py`,
`fidelity.py`, `quality.py`, `host_feed.py`) stamps its JSON with the
nearest git SHA at capture time (usually ``<sha>-dirty`` — artifacts
are necessarily captured BEFORE the commit that lands them, so the
stamp identifies the capture session and its base tree, not a
bit-reproducible checkout), the capture timestamp, and the jax
backend. The actual no-silent-drift guarantee is
`tests/test_artifacts.py`, which pins README's quoted figures to the
committed artifact values; the stamp answers "when/on what backend/
around which commit was this measured" — the questions the
reference's print-and-lose Profiler (``opencv/Profiler.cpp:25-34``)
could never answer.
"""

from __future__ import annotations

import os
import subprocess
import time


def git_sha() -> str:
    try:
        out = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=10)
        sha = out.stdout.strip()
        if out.returncode == 0 and sha:
            dirty = subprocess.run(
                ["git", "status", "--porcelain"],
                cwd=os.path.dirname(os.path.abspath(__file__)),
                capture_output=True, text=True, timeout=10)
            if dirty.returncode == 0 and dirty.stdout.strip():
                sha += "-dirty"
            return sha
    except Exception:
        pass
    return "unknown"


def stamp(record: dict, backend: str | None = None) -> dict:
    """Add {git_sha, captured_at_utc, backend} in place and return it.

    `backend` defaults to the active jax backend; pass an explicit
    string for host-only benchmarks that never import jax.
    """
    if backend is None:
        try:
            import jax

            backend = jax.default_backend()
        except Exception:
            backend = "none"
    record["git_sha"] = git_sha()
    record["captured_at_utc"] = time.strftime(
        "%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    record["backend"] = backend
    return record

"""Persisted motion trajectories — the two-phase checkpoint.

The reference checkpoints motion analysis as a ``.trf`` file written by
``vidstabdetect`` and consumed by ``vidstabtransform``
(``src/render.ts:349-359,568``), letting ``--encode-only`` /
``--analyse-only`` resume without re-analysis (``src/render.ts:1387-1399``).
Here the analogue is the estimated per-frame motion trajectory, stored as an
``.npz`` next to the destination file. Each stabilizer family has its own
parameterization:

- ``so3``: (T, 3) rotation vectors (the rotation/dewobble family);
- ``similarity``: (T, 4) = (dx, dy, angle, log_scale) (vidstab family);
- ``translation``: (T, 2) = (dx, dy) (deshake family).
"""

from __future__ import annotations

import dataclasses
from fractions import Fraction
from typing import Optional

import numpy as np

from video_annotator_tpu import so3

FORMAT_VERSION = 2

KIND_DIMS = {"so3": 3, "similarity": 4, "translation": 2}


@dataclasses.dataclass
class Trajectory:
    """Per-frame accumulated motion parameters + probe metadata."""

    params: np.ndarray  # (T, K) float64, accumulated motion at frame t
    kind: str = "so3"
    fps: Fraction = Fraction(30, 1)
    width: int = 0
    height: int = 0
    source: str = ""
    # World "up" in frame-0 camera coords (unit 3-vector), estimated from
    # the GPMF ACCL stream when available — enables --horizon-lock.
    up0: Optional[np.ndarray] = None

    def __post_init__(self):
        if self.kind not in KIND_DIMS:
            raise ValueError(f"unknown trajectory kind {self.kind!r}")

    @property
    def num_frames(self) -> int:
        return int(self.params.shape[0])

    @property
    def rotvecs(self) -> np.ndarray:
        assert self.kind == "so3", self.kind
        return self.params

    def rotations(self) -> np.ndarray:
        import jax.numpy as jnp

        assert self.kind == "so3", self.kind
        return np.asarray(so3.exp(jnp.asarray(self.params, jnp.float32)))

    def save(self, path: str):
        extra = {}
        if self.up0 is not None:
            extra["up0"] = np.asarray(self.up0, np.float64)
        np.savez(
            path,
            version=FORMAT_VERSION,
            kind=self.kind,
            params=self.params,
            fps_num=self.fps.numerator,
            fps_den=self.fps.denominator,
            width=self.width,
            height=self.height,
            source=self.source,
            **extra,
        )

    @staticmethod
    def load(path: str) -> "Trajectory":
        with np.load(path, allow_pickle=False) as z:
            version = int(z["version"])
            if version == 1:
                params = z["rotvecs"]
                kind = "so3"
            elif version == FORMAT_VERSION:
                params = z["params"]
                kind = str(z["kind"])
            else:
                raise ValueError(f"unsupported trajectory version {version}")
            return Trajectory(
                params=params,
                kind=kind,
                fps=Fraction(int(z["fps_num"]), int(z["fps_den"])),
                width=int(z["width"]),
                height=int(z["height"]),
                source=str(z["source"]),
                up0=z["up0"] if "up0" in z.files else None,
            )


def trajectory_path(dest: str) -> str:
    """``<dest>.traj.npz`` — like vidstab's ``<dest>.trf``
    (``src/render.ts:353``)."""
    return dest + ".traj.npz"

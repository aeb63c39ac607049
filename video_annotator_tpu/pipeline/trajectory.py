"""Persisted camera trajectories — the two-phase checkpoint.

The reference checkpoints motion analysis as a ``.trf`` file written by
``vidstabdetect`` and consumed by ``vidstabtransform``
(``src/render.ts:349-359,568``), letting ``--encode-only`` /
``--analyse-only`` resume without re-analysis (``src/render.ts:1387-1399``).
Here the analogue is the estimated per-frame camera rotation trajectory,
stored as rotation vectors in an ``.npz`` next to the destination file.
"""

from __future__ import annotations

import dataclasses
from fractions import Fraction

import numpy as np

from video_annotator_tpu import so3

FORMAT_VERSION = 1


@dataclasses.dataclass
class Trajectory:
    """Per-frame accumulated camera rotations + probe metadata."""

    rotvecs: np.ndarray  # (T, 3) float64, frame t's accumulated rotation
    fps: Fraction = Fraction(30, 1)
    width: int = 0
    height: int = 0
    source: str = ""

    @property
    def num_frames(self) -> int:
        return int(self.rotvecs.shape[0])

    def rotations(self) -> np.ndarray:
        import jax.numpy as jnp

        return np.asarray(so3.exp(jnp.asarray(self.rotvecs, jnp.float32)))

    def save(self, path: str):
        np.savez(
            path,
            version=FORMAT_VERSION,
            rotvecs=self.rotvecs,
            fps_num=self.fps.numerator,
            fps_den=self.fps.denominator,
            width=self.width,
            height=self.height,
            source=self.source,
        )

    @staticmethod
    def load(path: str) -> "Trajectory":
        with np.load(path, allow_pickle=False) as z:
            if int(z["version"]) != FORMAT_VERSION:
                raise ValueError(f"unsupported trajectory version {z['version']}")
            return Trajectory(
                rotvecs=z["rotvecs"],
                fps=Fraction(int(z["fps_num"]), int(z["fps_den"])),
                width=int(z["width"]),
                height=int(z["height"]),
                source=str(z["source"]),
            )


def trajectory_path(dest: str) -> str:
    """``<dest>.traj.npz`` — like vidstab's ``<dest>.trf``
    (``src/render.ts:353``)."""
    return dest + ".traj.npz"

"""Synthetic ground-truth video: a rotating fisheye camera in a static world.

The reference's only ground-truth mechanism is the Kalman demo's synthetic
rotating point (``opencv/kalman/kalman.cpp:30-99``). This generalizes it to
full video: frames are renders of a procedural spherical texture through the
fisheye camera model at a known rotation trajectory, so every stage
(tracking, rotation estimation, smoothing, warping) can be validated against
exact truth — and the benchmark suite gets deterministic footage without
shipping video files.

URI form: ``synthetic://shaky?w=640&h=480&n=120&fps=30&seed=0&shake=0.004``
"""

from __future__ import annotations

import dataclasses
from fractions import Fraction
from typing import Iterator, Tuple
from urllib.parse import parse_qs, urlparse

import jax
import jax.numpy as jnp
import numpy as np

from video_annotator_tpu import so3
from video_annotator_tpu.camera import Camera, CameraPreset, get_preset_camera
from video_annotator_tpu.io.video import VideoMeta


def _world_luma(d: jax.Array) -> jax.Array:
    """Procedural texture on the unit sphere, rich in trackable gradients."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    r = jnp.sqrt(x * x + z * z) + 1e-9
    lon = jnp.arctan2(x, z)
    lat = jnp.arctan2(y, r)
    v = (
        0.35 * jnp.sin(lon * 21.0) * jnp.sin(lat * 23.0)
        + 0.25 * jnp.sin(lon * 57.0 + 1.3) * jnp.cos(lat * 49.0)
        + 0.2 * jnp.sin(lon * 9.0 - lat * 11.0)
        + 0.2 * jnp.sin(jnp.sin(lon * 33.0) * 5.0 + lat * 77.0)
    )
    return jnp.clip(v * 0.5 + 0.5, 0.0, 1.0) * 205.0 + 25.0


def _world_chroma(d: jax.Array) -> Tuple[jax.Array, jax.Array]:
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    lon = jnp.arctan2(x, z)
    lat = jnp.arctan2(y, jnp.sqrt(x * x + z * z) + 1e-9)
    u = 128.0 + 40.0 * jnp.sin(lon * 3.0)
    v = 128.0 + 40.0 * jnp.sin(lat * 5.0)
    return u, v


def render_frame(camera: Camera, rotation: jax.Array):
    """Render (y, u, v) planes seen by ``camera`` rotated by ``rotation``."""

    def dirs(cam: Camera, h, w):
        ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        rays = cam.unproject(jnp.stack([xs, ys], axis=-1))
        rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
        return jnp.einsum("ij,hwj->hwi", rotation, rays,
                          precision=jax.lax.Precision.HIGHEST)

    h, w = camera.height, camera.width
    y = _world_luma(dirs(camera, h, w))
    half = Camera(
        fx=camera.fx * 0.5, fy=camera.fy * 0.5,
        cx=(camera.cx + 0.5) * 0.5 - 0.5, cy=(camera.cy + 0.5) * 0.5 - 0.5,
        dist=camera.dist, width=w // 2, height=h // 2, model=camera.model,
    )
    u, v = _world_chroma(dirs(half, h // 2, w // 2))
    to8 = lambda a: jnp.clip(a, 0, 255).astype(jnp.uint8)
    return to8(y), to8(u), to8(v)


@dataclasses.dataclass
class SyntheticCamera:
    """Config + trajectory for synthetic footage."""

    width: int = 640
    height: int = 480
    num_frames: int = 120
    fps: Fraction = Fraction(30, 1)
    seed: int = 0
    shake: float = 0.004  # rad rms per-frame jitter
    pan: float = 0.002  # rad/frame smooth pan rate
    preset: CameraPreset = CameraPreset.GOPRO_H4B_WIDE43_MEASURED

    def camera(self) -> Camera:
        return get_preset_camera(self.preset, (self.width, self.height))

    def rotation_vectors(self) -> np.ndarray:
        """(T, 3) ground-truth camera rotation vectors (smooth + jitter)."""
        t = np.arange(self.num_frames)
        smooth = np.stack(
            [
                self.pan * t,
                0.5 * self.pan * np.sin(t / 37.0) * 37.0 * 0.05,
                0.02 * np.sin(t / 53.0),
            ],
            axis=-1,
        )
        rng = np.random.default_rng(self.seed)
        # Band-limited jitter: white noise smoothed a little, like hand shake.
        noise = rng.normal(size=(self.num_frames + 4, 3)) * self.shake
        kernel = np.array([0.25, 0.5, 0.25])
        jitter = np.stack(
            [np.convolve(noise[:, i], kernel, mode="same") for i in range(3)],
            axis=-1,
        )[2:-2] * 3.0
        return (smooth + jitter).astype(np.float32)

    def rotations(self) -> np.ndarray:
        return np.asarray(so3.exp(jnp.asarray(self.rotation_vectors())))


class SyntheticSource:
    """Reader-compatible synthetic stream (see ``io/video.py``)."""

    def __init__(self, config: SyntheticCamera):
        self.config = config
        self.meta = VideoMeta(
            config.width, config.height, config.fps, config.num_frames
        )
        self._render = jax.jit(
            lambda rot: render_frame(config.camera(), rot)
        )

    @staticmethod
    def from_uri(uri: str) -> "SyntheticSource":
        parsed = urlparse(uri)
        q = {k: v[-1] for k, v in parse_qs(parsed.query).items()}
        cfg = SyntheticCamera(
            width=int(q.get("w", 640)),
            height=int(q.get("h", 480)),
            num_frames=int(q.get("n", 120)),
            fps=Fraction(int(q.get("fps", 30)), 1),
            seed=int(q.get("seed", 0)),
            shake=float(q.get("shake", 0.004)),
            pan=float(q.get("pan", 0.002)),
        )
        return SyntheticSource(cfg)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        rots = self.config.rotations()
        for t in range(self.config.num_frames):
            y, u, v = self._render(jnp.asarray(rots[t]))
            yield np.asarray(y), np.asarray(u), np.asarray(v)

    def close(self):
        pass

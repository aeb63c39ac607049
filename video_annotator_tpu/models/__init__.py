"""Stabilizer model families.

The reference offers four FFmpeg filter backends behind ``--filter``
(``src/cli.ts:74-78``): ``dewobble`` (camera-rotation model on SO(3) —
the default and the one its native C++ engine implements), ``vidstab``
(2D similarity trajectory, two-pass), ``deshake`` and ``deshake_opencl``
(global-translation block matching). Each family here is a native
implementation sharing the analyse/encode pipeline:

- :mod:`rotation <video_annotator_tpu.models.rotation>` — SO(3) tracking +
  fisheye-aware warp (flagship; lives mostly in ``pipeline/render.py``);
- :mod:`similarity <video_annotator_tpu.models.similarity>` — vidstab
  equivalent;
- :mod:`deshake <video_annotator_tpu.models.deshake>` — phase-correlation
  translation with blurred-edge fill (the deshake_opencl edge treatment).
"""

FILTER_ALIASES = {
    "dewobble": "rotation",
    "rotation": "rotation",
    "vidstab": "similarity",
    "similarity": "similarity",
    "deshake": "deshake",
    "deshake_opencl": "deshake",
}

"""Device-mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def _factor(n: int, k: int) -> Tuple[int, ...]:
    """Split n devices into k axes, largest axis first."""
    dims = [1] * k
    i = 0
    rem = n
    # greedy: peel factors of 2 (TPU slices are powers of two), then rest
    f = 2
    while rem > 1:
        while rem % f == 0:
            dims[i % k] *= f
            rem //= f
            i += 1
        f += 1
    return tuple(sorted(dims, reverse=True))


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data", "time", "space"),
) -> Mesh:
    """A mesh over the first ``n_devices`` devices.

    Axis sizes are factored automatically: 8 devices -> (2, 2, 2);
    4 -> (2, 2, 1); 1 -> (1, 1, 1).
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    dims = _factor(len(devs), len(axis_names))
    arr = np.asarray(devs).reshape(dims)
    return Mesh(arr, axis_names=tuple(axis_names))

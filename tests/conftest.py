"""Test configuration: force CPU with a virtual 8-device mesh.

No TPU is available in CI; multi-device sharding tests use the standard JAX
fake-cluster trick (``--xla_force_host_platform_device_count``). Must run
before the first ``import jax`` in any test module.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

"""Test configuration: force CPU with a virtual 8-device mesh.

No TPU is available in CI; multi-device sharding tests use the standard JAX
fake-cluster trick. NOTE: this environment's axon ``sitecustomize`` imports
jax at interpreter start and registers the remote TPU, so env vars set here
are too late — the platform must be forced through ``jax.config``. Even
then the registration itself has already contacted the device tunnel;
prefer launching pytest with ``env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu`` so a busy or
wedged tunnel cannot slow or hang CPU-only test runs.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

"""Test harness: run on CPU with 8 virtual devices so multi-chip sharding
code (shard_map + halo exchange) is exercised in CI without TPUs.

Note: the environment's sitecustomize registers the ``axon`` TPU-tunnel PJRT
plugin and force-sets ``jax_platforms=axon`` at interpreter startup (before
any conftest runs), so a plain ``JAX_PLATFORMS`` setdefault is not enough —
we override the config here, before JAX initializes any backend.  Set
``FLUIDSIM_TEST_TPU=1`` to deliberately run the test suite on the real chip.
"""

import os

if not os.environ.get("FLUIDSIM_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu"

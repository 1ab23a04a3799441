"""Test configuration: force CPU with an 8-device virtual mesh.

Multi-chip sharding is validated on virtual CPU devices
(``xla_force_host_platform_device_count``) since the CI box has at most one
real TPU chip.  NOTE: ``JAX_PLATFORM_NAME`` (not ``JAX_PLATFORMS``) is what
overrides the axon TPU plugin in this image.
"""

import os

# Both variables must be forced: the axon TPU plugin environment exports
# JAX_PLATFORMS=axon, which would override JAX_PLATFORM_NAME and put the
# whole test suite on the (exclusive, possibly busy) TPU chip.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# The axon plugin can force jax_platforms at import time, overriding the env
# var above — pin it back to CPU at the config level (wins over the plugin).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# Persistent compile cache: the test matrix compiles many small convs.
jax.config.update("jax_compilation_cache_dir", "/tmp/wdno_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

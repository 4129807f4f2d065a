"""Test config: force an 8-device virtual CPU platform so sharding/pjit tests
run deterministically (float32) without TPU hardware. Must run before any test
module imports jax."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# Some environments register an experimental TPU plugin that overrides
# JAX_PLATFORMS; pin the default backend explicitly.
jax.config.update("jax_platform_name", "cpu")

# Persistent compilation cache: the suite is compile-bound on one CPU core
# (~13 min cold); cached reruns skip recompiling unchanged jit programs.
from mmdyn_tpu.utils.compile_cache import maybe_enable  # noqa: E402

maybe_enable("/tmp/mmdyn_xla_cache_tests")

"""Test harness config: run everything on a virtual 8-device CPU mesh.

This image's sitecustomize force-registers a remote TPU backend and sets
``jax_platforms="axon,cpu"`` at interpreter start (overriding JAX_PLATFORMS),
so we must re-override via jax.config AFTER import, and set XLA_FLAGS before
the first backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache: the suite is compile-dominated (the app
# e2e + multihost tests alone recompile ~8 min of identical programs every
# run); cached executables cut a repeat full run dramatically (measured
# 34.6s -> 6.2s for the fused rcgan-u cycle compile).  Reloading same-host
# AOT results logs a cosmetic XLA "machine feature +prefer-no-scatter"
# error pair per entry (tuning pseudo-features, not ISA); correctness is
# unchanged — identical executables, same machine.  RCGAN_TEST_XLA_CACHE=0
# opts out (or points elsewhere).
_cache = os.environ.get("RCGAN_TEST_XLA_CACHE", "")
if _cache.strip().lower() not in ("0", "off", "none"):
    from rcgan_tpu.utils.compilation_cache import enable as _enable_xla_cache

    _enable_xla_cache(_cache or os.path.expanduser("~/.cache/rcgan_tpu_xla_cpu_tests"))

assert jax.default_backend() == "cpu", jax.default_backend()

import pytest  # noqa: E402

# Fast tier: unit/oracle modules only (measured ~2.5 min together on a 1-CPU
# box).  E2e apps/train/parallel/eval tests stay in the full tier.
_SMOKE_MODULES = {
    "test_ops", "test_utils", "test_confusion", "test_losses", "test_data",
    "test_native", "test_models",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = getattr(item.module, "__name__", "").rsplit(".", 1)[-1]
        if mod in _SMOKE_MODULES and "slow" not in item.keywords:
            item.add_marker(pytest.mark.smoke)

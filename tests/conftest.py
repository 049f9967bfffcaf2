"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths run in CI without TPU hardware.

Env vars alone are not enough: the runner may preload jax (PYTHONPATH
sitecustomize) with JAX_PLATFORMS pointing at a remote TPU, in which case
the config value was already captured at import time.  jax.config.update
still works here because no backend has been initialized yet at conftest
import time — so force the platform through the config API as well.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
# cache every compilation (default only caches >1s compiles); CI hosts here
# are 2-vCPU, so warm caches matter more than cache-dir size
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

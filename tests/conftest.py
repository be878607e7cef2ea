"""Test setup: force CPU JAX with 8 virtual devices (multi-chip sharding is
validated on a host-device mesh, the standard JAX fake-backend pattern).

jax may already be imported by the interpreter's site hooks, so the platform
is switched via jax.config (still possible before first backend init) rather
than environment variables.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

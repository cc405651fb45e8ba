"""Test configuration: force an 8-device virtual CPU mesh before JAX initializes.

All tests run on CPU with 8 virtual devices so multi-chip sharding (DP/FSDP/TP) is
exercised without TPU hardware (SURVEY.md §4: the fake-backend layer the reference
never had).
"""
import os
import tempfile

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Keep serving/gradio conversation logs out of the repo root during test runs.
os.environ.setdefault("SLIME_LOGDIR", tempfile.mkdtemp(prefix="slime_test_logs_"))
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# In this environment the JAX_PLATFORMS env var is ignored by the installed plugin
# stack; the config API is honored, so set it programmatically too.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


# Persistent XLA compilation cache: on repeat runs the heavy jit compiles
# (8-device train steps, fusion graphs) load from disk instead of recompiling —
# the suite is compile-dominated on small CI boxes. Override with
# SLIME_COMPILE_CACHE=; disable by setting it empty.
_cache = os.environ.get(
    "SLIME_COMPILE_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_compile_cache"))
if _cache:
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    # 0.1s: the suite is thousands of small compiles, not a few big ones —
    # caching the sub-second tail is worth minutes on warm 1-CPU runs.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

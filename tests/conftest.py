"""Test configuration: force an 8-virtual-device CPU platform so sharding and
collective tests run without TPU hardware (SURVEY.md §4's multi-host test
strategy).  Must run before jax is imported anywhere."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Disable the persistent compilation cache for the whole suite (in-process
# CLI tests and CLI subprocesses, which inherit the env): it exists for the
# TPU tunnel's slow remote compiles, and on CPU a cached executable read back
# via backend.deserialize_executable can abort the interpreter — plus sharing
# .jax_cache with a concurrently running TPU job is a read/write race.  See
# utils/cache.py.
os.environ.setdefault("SINNERF_JAX_CACHE_DIR", "off")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; force CPU explicitly so tests use
# the 8 virtual host devices.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

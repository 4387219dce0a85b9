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
# Set unconditionally (not setdefault): an inherited SINNERF_JAX_CACHE_DIR
# would re-enable the cache under pytest — the exact hazard this guards.
os.environ["SINNERF_JAX_CACHE_DIR"] = "off"
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

# ---------------------------------------------------------------------------
# Compile-heavy isolation: a full serial suite accumulates ~200 XLA CPU
# compiles in one process (with torch co-loaded for the golden tests) and
# has segfaulted inside the XLA CPU compiler near the end of collection
# order (observed at a tests/test_train.py jit compile after ~175 green
# tests; every file passes in isolation).  The two compile-heaviest modules
# therefore run in their own subprocesses: the parent suite skips them at
# collection and tests/test_zz_heavy_subprocess.py re-runs each via
# `python -m pytest` with SINNERF_TEST_DIRECT=1.  Naming a heavy file
# explicitly on the command line still runs it in-process.
# ---------------------------------------------------------------------------
HEAVY_TEST_FILES = {"test_train.py", "test_step_parity.py"}


def pytest_ignore_collect(collection_path, config):
    if os.environ.get("SINNERF_TEST_DIRECT"):
        return None
    name = os.path.basename(str(collection_path))
    if name in HEAVY_TEST_FILES:
        named = any(
            os.path.basename(str(a)).split("::")[0] == name
            for a in config.args
        )
        return not named
    return None


def pytest_generate_tests(metafunc):
    # Parametrize test_zz_heavy_subprocess over HEAVY_TEST_FILES via the
    # plugin hook rather than an import: `from tests.conftest import ...`
    # only resolves under `python -m pytest` (cwd on sys.path) — bare
    # `pytest` would abort the whole collection — and it re-executes this
    # module's env/jax.config side effects as a second module instance.
    if "heavy_test_fname" in metafunc.fixturenames:
        metafunc.parametrize("heavy_test_fname", sorted(HEAVY_TEST_FILES))


@pytest.fixture(autouse=True, scope="module")
def _bound_xla_executable_accumulation():
    """Free compiled executables between modules — bounds the in-process
    XLA state the segfault correlates with (cheap: cross-module cache reuse
    is rare, each module compiles its own shapes)."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)

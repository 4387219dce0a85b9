"""Per-file subprocess runner for the compile-heaviest test modules.

A full serial suite run accumulates ~200 XLA CPU jit compiles in one process
(with torch co-loaded by the golden-parity tests) and has twice been observed
to SEGFAULT inside the XLA CPU compiler late in the run — both times at a
``tests/test_train.py`` compile, after 170+ green tests, while every file
passes in isolation.  ``conftest.pytest_ignore_collect`` therefore skips
these modules in the parent process and this file re-runs each in a fresh
interpreter (the "tiny per-file runner" arrangement).  Named ``zz_`` so the
subprocesses run after the parent's own modules have finished their compiles.

Run a heavy file directly (``pytest tests/test_train.py``) and it executes
in-process as usual — the collect-ignore only applies when the file wasn't
named on the command line.
"""

import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# parametrized over conftest.HEAVY_TEST_FILES by conftest.pytest_generate_tests
# (hook, not import: `from tests.conftest import ...` only resolves under
# `python -m pytest` and would re-execute conftest's env side effects)
def test_heavy_file_in_subprocess(heavy_test_fname):
    fname = heavy_test_fname
    env = dict(os.environ)
    env["SINNERF_TEST_DIRECT"] = "1"
    # timeout: test_train.py alone runs ~14 min uncontended; alongside a TPU
    # soak's dispatch loop PLUS an eval leg on this single-core box it was
    # measured >60 min (a 3600 cap spuriously failed an otherwise-green run).
    # The cap exists so a wedged (rather than crashed) XLA compiler fails the
    # suite instead of hanging it — 2.5 h bounds that while absorbing any
    # realistic contention.
    proc = subprocess.run(
        [
            sys.executable, "-m", "pytest",
            os.path.join(REPO_ROOT, "tests", fname),
            "-q", "-p", "no:cacheprovider",
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO_ROOT,
        timeout=9000,
    )
    if proc.returncode != 0:
        raise AssertionError(
            f"{fname} failed in its subprocess (rc={proc.returncode}):\n"
            f"{proc.stdout[-8000:]}\n{proc.stderr[-4000:]}"
        )

"""Profiling and timing harness.

The reference's only profiling is Lightning's built-in profiler gated on
single-GPU (``train.py:59``) plus cuDNN autotune (``train.py:55``).  TPU
equivalents (SURVEY.md §5): ``jax.profiler`` traces viewable in
TensorBoard/XProf, and an on-device chained-iteration timer (host
``block_until_ready`` timing is unreliable over remote-device tunnels where
dispatch is fully async and fetches cost a fixed RTT).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace into ``log_dir`` (open with TensorBoard's
    profile plugin / XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


def time_fn(
    fn: Callable[..., jnp.ndarray],
    *args,
    iters: int = 20,
    repeats: int = 3,
) -> float:
    """Best-of-``repeats`` seconds/iteration for ``fn(*args) -> array``.

    Chains ``iters`` calls on device inside one jitted ``fori_loop`` (each
    iteration consumes a scalar from the last so XLA can neither hoist nor
    DCE the body), then forces a scalar fetch.  Robust to async-dispatch
    backends; fetch RTT amortizes over ``iters``.

    Requires at least one argument, and the first must be a float array (the
    loop-carry perturbation is injected there; on an int array it would cast
    to exactly 0 and the chaining contract would silently break).
    """
    if not args:
        raise ValueError("time_fn needs >=1 array argument to chain through")
    if not jnp.issubdtype(jnp.asarray(args[0]).dtype, jnp.floating):
        raise ValueError(
            f"time_fn's first argument must be a float array (got "
            f"{jnp.asarray(args[0]).dtype}): the loop-carry perturbation "
            f"casts to 0 on integer dtypes, breaking the no-hoist chaining"
        )

    @jax.jit
    def loop(n, *a):
        def body(i, acc):
            # feed the accumulator back into the first argument so the body
            # is loop-carried (not hoistable); 1e-30 leaves numerics intact
            a0 = a[0] + (acc * 1e-30).astype(a[0].dtype)
            out = fn(a0, *a[1:])
            return acc + jnp.sum(out).astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    float(loop(2, *args))  # compile + warmup
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(loop(iters, *args))
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    return best

"""Driver entry-point contract tests (entry compile + multichip dryrun)."""

import jax
import numpy as np
import pytest


def test_entry_compiles_and_runs():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    rgb, depth = out
    assert rgb.shape == (4096, 3) and depth.shape == (4096,)
    assert np.isfinite(np.asarray(rgb)).all()


@pytest.mark.slow
def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_pallas_kernels():
    """The sharded G+D step through the per-ray Pallas train kernels
    (interpret mode) — guards the SPMD x pallas-train combination."""
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(4, "pallas")

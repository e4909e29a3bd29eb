"""Driver contract: entry() compile check + multi-chip dry run in-suite."""

import numpy as np
import pytest

import jax


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (32, 10)
    assert bool(np.isfinite(np.asarray(out)).all())


@pytest.mark.slow
def test_dryrun_multichip_8():
    # slow (~36 s): the driver itself runs dryrun_multichip(8) every
    # round, so the default profile keeps only the cheap entry() check.
    import __graft_entry__ as g

    # conftest provides 8 virtual CPU devices, so the direct impl runs.
    g.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_4():
    import __graft_entry__ as g

    g.dryrun_multichip(4)

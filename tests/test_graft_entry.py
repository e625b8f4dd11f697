"""Guards for the driver entry points (__graft_entry__)."""

import jax
import numpy as np
import pytest

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("n", [1, 2, 8])
def test_dryrun_multichip(n, capsys):
    graft.dryrun_multichip(n)
    assert "dryrun_multichip OK" in capsys.readouterr().out

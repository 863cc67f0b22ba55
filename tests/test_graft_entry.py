"""Driver entry points stay working: single-chip compile check and the
full multi-chip dry run on the virtual CPU mesh."""

import sys

import jax
import numpy as np


def test_entry_compiles_and_runs():
    sys.path.insert(0, '.')
    import __graft_entry__ as g

    fn, args = g.entry()
    E, F = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(E)).all()
    assert F.shape[1] == 27  # 3N for the N=9 flagship


def test_dryrun_multichip():
    sys.path.insert(0, '.')
    import __graft_entry__ as g

    g.dryrun_multichip(8)

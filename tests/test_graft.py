"""Driver-contract checks for __graft_entry__.py."""

import sys
import os

import jax

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    re, im = out
    assert re.shape == (1 << 10,)


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_multichip_4():
    import __graft_entry__ as g

    g.dryrun_multichip(4)

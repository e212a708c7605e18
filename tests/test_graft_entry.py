"""Driver-contract checks for __graft_entry__.py."""

import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 256, 256, 3)


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)

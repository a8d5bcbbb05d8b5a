"""Driver entry points (__graft_entry__.py) stay green in-suite: the driver
runs them out-of-band, but a regression should surface at test time, not at
judging time. Runs on the 8-device virtual CPU mesh like everything else."""

import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).parent.parent))


def test_entry_compiles_single_chip():
    import __graft_entry__ as g

    fn, args = g.entry()
    shapes = jax.eval_shape(fn, *args)
    leaves = jax.tree.leaves(shapes)
    assert leaves, "entry() produced no outputs"
    out = fn(*args)  # actually execute once
    assert all(bool(jax.numpy.isfinite(x).all()) for x in jax.tree.leaves(out))


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # raises on any sharding/compile failure

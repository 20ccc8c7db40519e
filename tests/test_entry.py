"""Driver entry points stay functional: entry() compiles and runs;
dryrun_multichip shards a full train step over the 8-device CPU mesh."""

import sys

import jax
import numpy as np


def test_entry_forward():
    sys.path.insert(0, ".")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.ndim == 4 and np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip():
    sys.path.insert(0, ".")
    import __graft_entry__ as ge

    assert len(jax.devices()) == 8
    ge.dryrun_multichip(8)

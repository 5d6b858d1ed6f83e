"""Driver contract tests: entry() compiles, dryrun_multichip runs on 8 devices."""

import sys

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    d = np.asarray(out)
    assert d.shape == (16,)
    assert set(np.unique(d)).issubset({0, 1, 2, 3})


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2():
    graft.dryrun_multichip(2)


def test_dryrun_multichip_1():
    graft.dryrun_multichip(1)

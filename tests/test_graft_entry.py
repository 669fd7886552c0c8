"""Exercise __graft_entry__ the way the driver does (on the 8-device
CPU mesh from conftest)."""

import sys

import jax
import pytest

sys.path.insert(0, "/root/repo")

import __graft_entry__  # noqa: E402


def test_dryrun_multichip_8():
    __graft_entry__.dryrun_multichip(8)


def test_dryrun_multichip_odd():
    __graft_entry__.dryrun_multichip(3)


@pytest.mark.slow
def test_entry_compiles():
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn).lower(*args).compile()
    assert out is not None

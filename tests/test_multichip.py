"""Multi-chip sharding tests on the 8-device virtual CPU mesh (the TPU
analog of multi-node-without-a-cluster; SURVEY.md §4)."""
import jax
import pytest


def test_eight_virtual_devices():
  assert len(jax.devices()) == 8, 'conftest must force 8 virtual CPU devices'


def test_dryrun_multichip():
  import __graft_entry__ as ge
  ge.dryrun_multichip(8)


def test_entry_compiles():
  import __graft_entry__ as ge
  fn, args = ge.entry()
  out = jax.jit(fn)(*args)
  assert out.shape[0] == args[0].shape[0]

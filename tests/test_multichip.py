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


def test_dp_training_matches_single_device():
  """Trainer-path dp sharding: same seed + batches, dp8 == single device
  (up to reduction-order float noise)."""
  import numpy as np
  import boxlcd_tpu
  from research.nets.autoencoders.bvae import BVAE
  from tests.test_models import tiny_G, fake_batch

  env = boxlcd_tpu.env_map['Dropbox']()
  G1 = tiny_G(wh_ratio=env.G.wh_ratio, lcd_base=env.G.lcd_base, bs=8)
  G2 = tiny_G(wh_ratio=env.G.wh_ratio, lcd_base=env.G.lcd_base, bs=8,
              mesh='dp8')
  a = BVAE(env, G1)
  b = BVAE(env, G2)
  assert b.mesh is not None and b.mesh.shape['dp'] == 8
  batches = [fake_batch(env, G1, B=8, seed=i) for i in range(5)]
  for bt in batches:
    ma = a.train_step(bt)
    mb = b.train_step(bt)
  np.testing.assert_allclose(float(ma['loss/total']), float(mb['loss/total']),
                             rtol=1e-4)
  for x, y in zip(jax.tree_util.tree_leaves(a.params),
                  jax.tree_util.tree_leaves(b.params)):
    np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                               rtol=2e-3, atol=2e-5)


def test_sharded_collect_rollout_matches():
  """fill_barrels' sharded rollout path: dp8 output == unsharded output.

  Integer outputs (lcd, done flags) must match bitwise. Float outputs are
  allowed ULP-level slack: the sharded and unsharded programs are distinct
  XLA compilations whose FMA/fusion choices differ inside the contact
  solver's block-LCP math, which perturbs full_state by ~1 ulp (measured
  1.19e-7 max on 27/1600 elements; lcd and proprio still bit-equal)."""
  import numpy as np
  from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
  import boxlcd_tpu
  from boxlcd_tpu.data.collect import make_rollout_fn

  env = boxlcd_tpu.env_map['Dropbox']()
  fn, T = make_rollout_fn(env, pack_lcd=True)
  keys = jax.random.split(jax.random.PRNGKey(0), 16)
  plain = jax.jit(fn.keys_fn)(keys)
  mesh = Mesh(np.array(jax.devices()).reshape(8, 1), ('dp', 'tp'))
  bshard = NamedSharding(mesh, P('dp'))
  sharded = jax.jit(fn.keys_fn, in_shardings=(bshard,),
                    out_shardings=bshard)(jax.device_put(keys, bshard))
  for k in plain:
    a, b = np.asarray(plain[k]), np.asarray(sharded[k])
    if np.issubdtype(a.dtype, np.floating):
      np.testing.assert_allclose(a, b, atol=3e-7, rtol=0, err_msg=k)
    else:
      np.testing.assert_array_equal(a, b, err_msg=k)

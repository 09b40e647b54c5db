"""Multi-device (dp8) training chain vs single device, end to end.

VERDICT r2 item 5: beyond one-step equality (test_multichip.py), run the
research-CLI train chain — BVAE then FBT on the BVAE's codes — for several
iterations under --mesh=dp8 on the 8-virtual-device CPU mesh, and assert the
resulting models match the single-device chain on a fixed batch. Collection
sharding equality is covered separately (test_multichip.py); tiny barrels
are written directly here to keep the suite fast.
"""
import numpy as np
import jax
import pytest

import boxlcd_tpu
from boxlcd_tpu.data.collect import make_rollout_fn


def _write_tiny_barrels(env, direc, n_eps, seed):
  direc.mkdir(parents=True, exist_ok=True)
  fn, T = make_rollout_fn(env)
  traj = jax.tree_util.tree_map(
      np.asarray, jax.jit(fn, static_argnums=1)(jax.random.PRNGKey(seed),
                                                n_eps))
  traj['lcd'] = traj['lcd'].astype(bool)
  np.savez(direc / f'000-{seed}-{T}.barrel', **traj)


def _train(argv_extra, datadir, logdir, model, total_itr, weightdir=None):
  from research.main import main as rmain
  argv = [
      '--mode=train', f'--model={model}', '--env=Dropbox',
      f'--datadir={datadir}', f'--logdir={logdir}',
      f'--total_itr={total_itr}', '--bs=8', '--log_n=1000',
      '--hidden_size=32', '--nfilter=8', '--vqK=16', '--vqD=8',
      '--n_embed=32', '--n_head=2', '--n_layer=1',
  ] + (['--window=5'] if model == 'BVAE' else ['--window=6']) \
    + ([f'--weightdir={weightdir}'] if weightdir else []) + argv_extra
  rmain(argv)


def _fbt_loss(logdir, batch):
  import flax
  from research.define_config import env_fn
  from research.nets import net_map
  from research.nets._base import Net
  mG = Net.load_config(logdir, 'FBT')
  env = env_fn(mG)()
  model = net_map['FBT'](env, mG)
  model.load(logdir)
  metrics = model.train_step(batch, dry=True)
  return float(metrics['loss/total'])


def test_dp8_train_chain_matches_single_device(tmp_path):
  if len(jax.devices()) < 8:
    pytest.skip('needs the 8-virtual-device CPU mesh')
  env = boxlcd_tpu.env_map['Dropbox']()
  data = tmp_path / 'data'
  _write_tiny_barrels(env, data / 'train', 32, seed=0)
  _write_tiny_barrels(env, data / 'test', 16, seed=1)

  for tag, extra in (('dp8', ['--mesh=dp8']), ('single', [])):
    _train(extra, data, tmp_path / tag / 'bvae', 'BVAE', 8)
    _train(extra, data, tmp_path / tag / 'fbt', 'FBT', 6,
           weightdir=tmp_path / tag / 'bvae')

  # fixed comparison batch straight from the dataset
  from boxlcd_tpu.data.dataset import RolloutDataset
  ds = RolloutDataset(data / 'train', window=6, seed=7)
  batch = {k: np.asarray(v) for k, v in
           next(iter(ds.batches(8))).items()}
  l_dp = _fbt_loss(tmp_path / 'dp8' / 'fbt', batch)
  l_1 = _fbt_loss(tmp_path / 'single' / 'fbt', batch)
  # identical data order + init; only XLA compilation differs (distinct
  # reductions across the mesh), so losses agree to FP noise after 6+8 iters
  assert np.isfinite(l_dp) and np.isfinite(l_1)
  assert abs(l_dp - l_1) / max(abs(l_1), 1e-6) < 2e-3, (l_dp, l_1)

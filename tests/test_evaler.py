"""Evaler end-to-end: collect a tiny dataset, eval a fresh model with a
frozen arbiter, and check the logger.pkl table has the exact key layout the
paper scripts consume (reference: scripts/script.py:30-42)."""
import pickle

import numpy as np
import pytest

jax = pytest.importorskip('jax')

import boxlcd_tpu
from tests.test_models import tiny_G


@pytest.fixture(scope='module')
def dataset(tmp_path_factory):
  root = tmp_path_factory.mktemp('ds')
  G = tiny_G()
  G.update(env='Dropbox', logdir=root, train_barrels=1, test_barrels=1,
           num_envs=250)
  env = boxlcd_tpu.env_map['Dropbox']()
  from boxlcd_tpu.data.collect import fill_barrels
  key = jax.random.PRNGKey(0)
  key = fill_barrels(env, 1, 'test', G, key)
  fill_barrels(env, 1, 'train', G, key)
  return root, env


def test_evaler_protocol(dataset, tmp_path):
  root, env = dataset
  from research.nets.video_models.fit import FIT
  from research.nets.autoencoders.multistep_arbiter import MultiStepArbiter
  from research.runners.evaler import Evaler

  aG = tiny_G(wh_ratio=env.G.wh_ratio, lcd_base=env.G.lcd_base, window=3)
  arb = MultiStepArbiter(env, aG)
  arb.save_frozen(tmp_path / 'arb')

  G = tiny_G(wh_ratio=env.G.wh_ratio, lcd_base=env.G.lcd_base, window=6,
             prompt_n=2, video_n=8, bs=8, eval_n=16,
             datadir=root, logdir=tmp_path / 'out',
             arbiterdir=tmp_path / 'arb')
  model = FIT(env, G)
  ev = Evaler(model, env, G)
  final = ev.run(reps=2)
  # Dropbox is passive (no proprio), so proprio_log_mse is correctly absent
  assert 'test:p:proprio_log_mse' not in final
  for key in ['test:u:fvd', 'test:p:fvd', 'test:p:ssim', 'test:p:psnr',
              'test:p:cosdist', 'test:p:precision', 'test:p:recall',
              'test:p:f1',
              'test:p:action_log_mse', 'test:p:true_action_log_mse',
              'test:u:action_log_mse', 'train:p:ssim']:
    assert key in final, f'missing {key}: {sorted(final)}'
    m, s = final[key]
    assert np.isfinite(m), f'{key} mean not finite'
  with open(tmp_path / 'out' / 'logger.pkl', 'rb') as f:
    on_disk = pickle.load(f)
  assert on_disk.keys() == final.keys()
  # the per-batch pipeline must stay one jitted dispatch: the eager fallback
  # is ~100x slower over the axon tunnel (PROGRESS.md round-3 eval fixes)
  assert getattr(ev, '_jit_ok', False), 'Evaler fell back to eager stepping'

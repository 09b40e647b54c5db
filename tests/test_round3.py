"""Round-3 feature tests: interactive vizer core (AutoEnv live stepper,
headless fallback)."""
import jax
import numpy as np
import pytest

import boxlcd_tpu

from tests.test_models import tiny_G


@pytest.fixture(scope='module')
def env():
  return boxlcd_tpu.env_map['Dropbox']()


@pytest.fixture(scope='module')
def fbt(env):
  from research.nets.autoencoders.bvae import BVAE
  from research.nets.video_models.fbt import FBT
  G = tiny_G(wh_ratio=env.G.wh_ratio, lcd_base=env.G.lcd_base, window=6)
  bvae = BVAE(env, G)
  return FBT(env, G, bvae=bvae), G


def test_autoenv_live_stepper(env, fbt):
  """AutoEnv primes a real-frame window, then advances truth and model in
  lockstep, sliding the window at its end (reference: vizer.py:22-80)."""
  from research.runners.vizer import AutoEnv
  model, G = fbt
  env.seed(0)
  ae = AutoEnv(model, env, G)
  truth, pred, goal = ae.reset()
  assert truth.shape == (env.lcd_h * 8, env.lcd_w * 8, 3)
  assert goal is None  # plain env: no goal pane
  assert ae.window_batch['lcd'].shape[1] == G.window
  count0 = ae.count
  key = jax.random.PRNGKey(0)
  for i in range(3):
    key, k = jax.random.split(key)
    truth, pred, rew, lrew, goal = ae.step(env.action_space.sample(), k)
  assert truth.shape == pred.shape == (env.lcd_h * 8, env.lcd_w * 8, 3)
  assert ae.tot_count == 3
  # window slid: count saturates at window-2
  assert ae.count == min(count0 + 3, G.window - 2)
  assert np.isfinite(ae.window_batch['lcd']).all()


def test_interactive_vizer_headless_fallback(env, fbt):
  """On a machine without a display, InteractiveVizer must construct and
  defer to the headless replay rather than crash."""
  from research.runners.vizer import InteractiveVizer
  model, G = fbt
  viz = InteractiveVizer(model, env, G)
  assert not viz.have_window  # no GL display in CI
  # run() must delegate to the headless Vizer.run (smoke: 1 rollout)
  import tempfile
  with tempfile.TemporaryDirectory() as d:
    G.logdir = d
    viz.run(n_rollouts=1)

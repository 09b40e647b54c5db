"""Round-2 feature tests: full-checkpoint resume, SAC net variants,
arbiter-based evaluation protocol, gradient action planning."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import boxlcd_tpu

from tests.test_models import tiny_G, fake_batch


@pytest.fixture(scope='module')
def env():
  return boxlcd_tpu.env_map['Dropbox']()


def test_net_resume_bitwise(env, tmp_path):
  """Save at step 4, resume, continue 2 steps == train 6 steps straight
  (opt_state + step + RNG round-trip; SURVEY §5.4)."""
  from research.nets.autoencoders.bvae import BVAE
  G = tiny_G(wh_ratio=env.G.wh_ratio, lcd_base=env.G.lcd_base)
  batches = [fake_batch(env, G, seed=i) for i in range(6)]

  a = BVAE(env, G)
  for i in range(4):
    a.train_step(batches[i])
  assert a.step == 4
  a.save(tmp_path)
  for i in range(4, 6):
    a.train_step(batches[i])

  b = BVAE(env, G)
  b.load(tmp_path)
  assert b.step == 4
  for i in range(4, 6):
    b.train_step(batches[i])

  la = jax.tree_util.tree_leaves(a.params)
  lb = jax.tree_util.tree_leaves(b.params)
  for x, y in zip(la, lb):
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize('net', ['mlp', 'cmlp', 'cnn', 'bvae'])
def test_sac_net_variants(net):
  """cnn/cmlp/bvae actors with goal-image delta features
  (reference: sacnets.py:31-258)."""
  from research.rl.nets import SACNets
  act_dim, H, W, P, Z = 3, 16, 16, 5, 32
  nets = SACNets(act_dim, 'proprio', 'goal:proprio', P, hidden_size=32,
                 net=net, nfilter=8, zdelta=True)
  obs = {'proprio': jnp.zeros((2, P)), 'goal:proprio': jnp.zeros((2, P)),
         'lcd': jnp.zeros((2, H, W)), 'goal:lcd': jnp.zeros((2, H, W)),
         'zstate': jnp.zeros((2, Z)), 'goal:zstate': jnp.zeros((2, Z))}
  key = jax.random.PRNGKey(0)
  params = nets.init(key, obs, jnp.zeros((2, act_dim)), key)
  a, logp = nets.apply(params, obs, key, False, method='actor')
  assert a.shape == (2, act_dim) and np.isfinite(np.asarray(logp)).all()
  assert float(jnp.abs(a).max()) <= 1.0
  q1, q2 = nets.apply(params, obs, a, method='qs')
  assert q1.shape == (2,) and q2.shape == (2,)

  def loss(p):
    aa, lp = nets.apply(p, obs, key, False, method='actor')
    qa, qb = nets.apply(p, obs, aa, method='qs')
    return (lp + qa + qb).mean()

  g = jax.grad(loss)(params)
  assert all(np.isfinite(np.asarray(x)).all()
             for x in jax.tree_util.tree_leaves(g))


def _msarbiter(env, G):
  from research.nets.autoencoders.multistep_arbiter import MultiStepArbiter
  arb = MultiStepArbiter(env, G)
  return {'fn': lambda p, b: arb.forward_frozen(p, b),
          'params': arb.params, 'window': int(G.window),
          'kind': 'MultiStepArbiter'}


def test_video_evaluate_protocol(env):
  """VideoModel.evaluate yields the reference metric set: FVD, P/R/F1,
  action log-MSE (unprompted + prompted + true baseline), feature cosdist,
  burned SSIM/PSNR (reference: evaler.py:137-198, video _base.py:40-157)."""
  from research.nets.video_models.fit import FIT
  G = tiny_G(wh_ratio=env.G.wh_ratio, lcd_base=env.G.lcd_base,
             video_n=8, prompt_n=2)
  model = FIT(env, G)
  arbiter = _msarbiter(env, tiny_G(wh_ratio=env.G.wh_ratio,
                                   lcd_base=env.G.lcd_base, window=4))
  batch = fake_batch(env, G, B=8, T=6)
  m = model.evaluate(None, batch, 0, arbiter=arbiter)
  # Dropbox is passive: the proprio log-MSE metric is correctly absent
  assert 'eval/prompted_proprio_log_mse' not in m
  for k in ['eval/unprompted_fvd', 'eval/unprompted_action_log_mse',
            'eval/unprompted_precision', 'eval/unprompted_recall',
            'eval/unprompted_f1', 'eval/prompted_lcd_ssim',
            'eval/prompted_lcd_psnr',
            'eval/prompted_action_log_mse',
            'eval/prompted_true_action_log_mse', 'eval/prompted_cosdist']:
    assert k in m, f'missing metric {k}'
    assert np.isfinite(m[k]), f'non-finite {k}: {m[k]}'


def test_ae_evaluate_with_arbiter(env):
  """AE evaluate consumes the arbiter it is passed: FID + feature cosdist
  (reference: autoencoders/_base.py:86-132)."""
  from research.nets.autoencoders.bvae import BVAE
  from research.nets.autoencoders.arbiter import ArbiterAE
  G = tiny_G(wh_ratio=env.G.wh_ratio, lcd_base=env.G.lcd_base, video_n=4)
  model = BVAE(env, G)
  arb = ArbiterAE(env, G)
  arbiter = {'fn': lambda p, b: (arb.encode(p, b), None),
             'params': arb.params, 'window': None, 'kind': 'ArbiterAE'}
  batch = fake_batch(env, G, B=8, T=4)
  m = model.evaluate(None, batch, 0, arbiter=arbiter)
  assert 'eval/fid' in m and np.isfinite(m['eval/fid'])
  assert 'eval/cosdist' in m and np.isfinite(m['eval/cosdist'])


def test_vizer_optimize_actions(env):
  """Gradient-based action planning through the model runs, keeps prompt
  actions frozen, and respects bounds (reference: vizer.py:149-170)."""
  from research.nets.video_models.fit import FIT
  from research.runners.vizer import Vizer
  G = tiny_G(wh_ratio=env.G.wh_ratio, lcd_base=env.G.lcd_base, prompt_n=2)
  model = FIT(env, G)
  viz = Vizer(model, env, G)
  batch = fake_batch(env, G, B=1, T=6)
  prompts = {k: v for k, v in batch.items() if k != 'action'}
  a0 = batch['action']
  goal = np.asarray(batch['lcd'][0, -1])
  a1, l0, l1 = viz.optimize_actions(jax.random.PRNGKey(0), a0, prompts, goal,
                                    iters=3, lr=0.5)
  assert np.isfinite(l0) and np.isfinite(l1)
  np.testing.assert_array_equal(np.asarray(a1[:, :2]), np.asarray(a0[:, :2]))
  assert not np.allclose(np.asarray(a1[:, 2:]), np.asarray(a0[:, 2:]))
  assert float(jnp.abs(a1).max()) <= 1.0


def test_fbt_optimize_actions(env):
  from research.nets.autoencoders.bvae import BVAE
  from research.nets.video_models.fbt import FBT
  from research.runners.vizer import Vizer
  G = tiny_G(wh_ratio=env.G.wh_ratio, lcd_base=env.G.lcd_base, prompt_n=2)
  bvae = BVAE(env, G)
  model = FBT(env, G, bvae=bvae)
  viz = Vizer(model, env, G)
  batch = fake_batch(env, G, B=1, T=6)
  prompts = {k: v for k, v in batch.items() if k != 'action'}
  goal = np.asarray(batch['lcd'][0, -1])
  a1, l0, l1 = viz.optimize_actions(jax.random.PRNGKey(0), batch['action'],
                                    prompts, goal, iters=2, lr=0.5)
  assert np.isfinite(l0) and np.isfinite(l1)
  assert float(jnp.abs(a1).max()) <= 1.0

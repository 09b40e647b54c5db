"""RL stack smoke tests: SAC (replay + firehose), PPO, GPT helpers."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def rl_G(tmp, algo, **kw):
  from research.rl.main import parse
  args = [f'--{k}={v}' for k, v in kw.items()]
  G = parse(['--env=Luxo', '--lcd_base=16', '--num_envs=4', '--ep_len=12',
             f'--logdir={tmp}', '--log_n=100000', *args, algo])
  return G


@pytest.mark.parametrize('firehose', [False, True])
def test_sac_updates(tmp_path, firehose):
  from research.rl.sac import SAC
  G = rl_G(tmp_path, 'sac', total_steps=8, start_steps=4, update_after=4,
           update_every=4, bs=8, hidden_size=32)
  sac = SAC(G)
  o = sac.env.reset()
  if firehose:
    a = sac.get_a(o)
    o2, rew, done, info = sac.env.step(a)
    as_jnp = lambda o_: {k: jnp.asarray(v)
                         for k, v in sac._obs_subset(o_).items()}
    batch = {'obs': as_jnp(o), 'act': jnp.asarray(a),
             'rew': jnp.asarray(rew, jnp.float32).reshape(-1),
             'obs2': as_jnp(o2),
             'done': jnp.asarray(done, jnp.float32).reshape(-1)}
    p0 = sac.params
    (sac.params, *_, metrics) = sac._update(
        sac.params, sac.target_params, sac.log_alpha, sac.pi_state,
        sac.q_state, sac.a_state, batch, jax.random.PRNGKey(0))
    assert all(np.isfinite(float(v)) for v in metrics.values())
    diff = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(jnp.abs(x).sum()),
        jax.tree_util.tree_map(lambda a_, b: a_ - b, sac.params, p0), 0.0)
    assert diff > 0, 'update must move the params'
  else:
    sac.run()  # 8 steps: exercises store/sample/update path end to end


def test_sac_update_burst_matches_sequential(tmp_path):
  """The fused lax.scan update block must equal n sequential _update calls
  given the same batches and the same derived keys (run() now dispatches
  one burst per update_every block to amortize the tunnel round trip)."""
  from research.rl.sac import SAC
  G = rl_G(tmp_path, 'sac', bs=8, hidden_size=32)
  sac = SAC(G)
  n, bs = 3, int(G.bs)
  key = jax.random.PRNGKey(7)
  rng = np.random.RandomState(0)
  mk = lambda: {k: jnp.asarray(rng.randn(n, bs, *v.shape[1:]), jnp.float32)
                for k, v in sac.buf.obs.items()}
  batches = {'obs': mk(), 'obs2': mk(),
             'act': jnp.asarray(rng.uniform(-1, 1, (n, bs, sac.buf.act.shape[-1])),
                                jnp.float32),
             'rew': jnp.asarray(rng.randn(n, bs), jnp.float32),
             'done': jnp.zeros((n, bs), jnp.float32)}
  burst = sac._update_burst(sac.params, sac.target_params, sac.log_alpha,
                            sac.pi_state, sac.q_state, sac.a_state, batches,
                            key)
  keys = jax.random.split(key, n)
  seq = (sac.params, sac.target_params, sac.log_alpha, sac.pi_state,
         sac.q_state, sac.a_state)
  for i in range(n):
    batch = jax.tree_util.tree_map(lambda v: v[i], batches)
    *seq, metrics = sac._update(*seq, batch, keys[i])
  for got, want in zip(burst[:6], seq):
    err = jax.tree_util.tree_reduce(
        lambda acc, x: max(acc, float(jnp.abs(x).max())),
        jax.tree_util.tree_map(lambda a_, b: jnp.asarray(a_, jnp.float32)
                               - jnp.asarray(b, jnp.float32), got, want), 0.0)
    assert err < 1e-5, err
  assert all(np.isfinite(float(v)) for v in burst[6].values())


def test_ppo_epoch(tmp_path):
  from research.rl.ppo import PPO
  G = rl_G(tmp_path, 'ppo', steps_per_epoch=48, total_steps=48,
           train_pi_iters=2, train_v_iters=2, bs=16, hidden_size=32)
  PPO(G).run()


def test_gpt_dist_and_zero_params():
  from research.nets.gpt import GPT, GPTDist
  from research.nets.common import zero_params
  B, T, L, C = 2, 3, 5, 4
  module = GPT(in_size=1, block_size=L, n_embed=16, n_head=2, n_layer=1,
               cond=C)
  x = jnp.zeros((B, T, C))
  params = module.init(jax.random.PRNGKey(0), jnp.zeros((B * T, L, 1)),
                       x.reshape(-1, C))
  d = GPTDist(module, params, jax.random.PRNGKey(1), x)
  state = (jax.random.uniform(jax.random.PRNGKey(2), (B, T, L)) > 0.5)
  lp = d.log_prob(state.astype(jnp.float32))
  assert lp.shape == (B * T, L, 1) and bool(jnp.isfinite(lp).all())
  s = d.sample()
  assert s.shape == (B, T, L)
  z = zero_params(params)
  assert jax.tree_util.tree_reduce(
      lambda acc, a: acc + float(jnp.abs(a).sum()), z, 0.0) == 0.0

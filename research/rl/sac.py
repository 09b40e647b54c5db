"""SAC: twin-Q soft actor-critic with learned temperature
(reference: research/rl/sac.py). FIFO replay, polyak targets, timeout-aware
done masking; jitted update step."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from research import utils
from research.rl._base import RLAlgo
from research.rl.buffers import ReplayBuffer
from research.rl.nets import SACNets


class SAC(RLAlgo):
  def __init__(self, G):
    super().__init__(G)
    obs_space = self.obs_space
    act_dim = self.act_space.shape[-1]
    state_size = obs_space[G.state_key].shape[-1]
    net_kind = str(G.get('net', 'mlp'))
    self.net = SACNets(act_dim, G.state_key, self.goal_key, state_size,
                       G.hidden_size, net=net_kind,
                       nfilter=int(G.get('nfilter', 64)),
                       zdelta=bool(G.get('zdelta', 1)))
    # which obs keys the net consumes (reference: sacnets.py:31-158)
    self.net_keys = [G.state_key, self.goal_key]
    if net_kind in ('cmlp', 'cnn'):
      self.net_keys += ['lcd', 'goal:lcd']
    elif net_kind == 'bvae':
      self.net_keys += ['zstate', 'goal:zstate']
    self.key = jax.random.PRNGKey(G.seed)
    def _space_shape(k):
      shp = obs_space[k].shape
      return shp[-2:] if k.endswith('lcd') else shp[-1:]
    dummy_obs = {k: jnp.zeros((1, *_space_shape(k))) for k in self.net_keys}
    self.key, k1 = jax.random.split(self.key)
    self.params = self.net.init(k1, dummy_obs, jnp.zeros((1, act_dim)), k1)
    self.target_params = self.params
    self.log_alpha = jnp.asarray(np.log(G.alpha))
    self.target_ent = -act_dim
    self.pi_opt = optax.adam(G.pi_lr)
    self.q_opt = optax.adam(G.vf_lr)
    self.a_opt = optax.adam(G.alpha_lr)
    self.pi_state = self.pi_opt.init(self.params)
    self.q_state = self.q_opt.init(self.params)
    self.a_state = self.a_opt.init(self.log_alpha)
    obs_shapes = {k: _space_shape(k) for k in self.net_keys}
    obs_dtypes = {k: (bool if k.endswith('lcd') else np.float32)
                  for k in self.net_keys}
    self.buf = ReplayBuffer(obs_shapes, act_dim, int(G.replay_size),
                            obs_dtypes=obs_dtypes)
    self.rng = np.random.RandomState(G.seed)
    self._build()

  def _build(self):
    G, net = self.G, self.net

    def act_fn(params, obs, key, deterministic):
      a, _ = net.apply(params, obs, key, deterministic, method='actor')
      return a

    def q_loss(params, target_params, log_alpha, batch, key):
      alpha = jnp.exp(log_alpha)
      q1, q2 = net.apply(params, batch['obs'], batch['act'], method='qs')
      a2, logp2 = net.apply(target_params, batch['obs2'], key, False,
                            method='actor')
      tq1, tq2 = net.apply(target_params, batch['obs2'], a2, method='qs')
      tq = jnp.minimum(tq1, tq2)
      done = batch['done'] if G.use_done else jnp.zeros_like(batch['done'])
      backup = batch['rew'] + G.gamma * (1 - done) * (tq - alpha * logp2)
      backup = jax.lax.stop_gradient(backup)
      return ((q1 - backup) ** 2).mean() + ((q2 - backup) ** 2).mean(), \
          (q1.mean(), q2.mean())

    def pi_loss(params, log_alpha, batch, key):
      alpha = jnp.exp(log_alpha)
      a, logp = net.apply(params, batch['obs'], key, False, method='actor')
      q1, q2 = net.apply(jax.lax.stop_gradient(params), batch['obs'], a,
                         method='qs')
      q = jnp.minimum(q1, q2)
      return (alpha * logp - q).mean(), logp

    def alpha_loss(log_alpha, logp):
      return -(jnp.exp(log_alpha)
               * jax.lax.stop_gradient(logp + self.target_ent)).mean()

    def update(params, target_params, log_alpha, pi_state, q_state, a_state,
               batch, key):
      k1, k2 = jax.random.split(key)
      (ql, (q1m, q2m)), qg = jax.value_and_grad(q_loss, has_aux=True)(
          params, target_params, log_alpha, batch, k1)
      updates, q_state = self.q_opt.update(qg, q_state, params)
      params = optax.apply_updates(params, updates)
      (pl, logp), pg = jax.value_and_grad(pi_loss, has_aux=True)(
          params, log_alpha, batch, k2)
      updates, pi_state = self.pi_opt.update(pg, pi_state, params)
      params = optax.apply_updates(params, updates)
      if G.learned_alpha:
        al, ag = jax.value_and_grad(alpha_loss)(log_alpha, logp)
        updates, a_state = self.a_opt.update(ag, a_state, log_alpha)
        log_alpha = optax.apply_updates(log_alpha, updates)
      else:
        al = 0.0
      target_params = jax.tree_util.tree_map(
          lambda t, p: G.polyak * t + (1 - G.polyak) * p, target_params,
          params)
      metrics = {'loss/q': ql, 'loss/pi': pl, 'loss/alpha': al,
                 'q1': q1m, 'q2': q2m, 'alpha': jnp.exp(log_alpha),
                 'logp': logp.mean()}
      return params, target_params, log_alpha, pi_state, q_state, a_state, \
          metrics

    def update_burst(params, target_params, log_alpha, pi_state, q_state,
                     a_state, batches, key):
      """The reference's inner `for j in range(update_every)` loop
      (reference: research/rl/sac.py update block) as ONE lax.scan dispatch:
      on the tunnel-attached TPU each jitted call costs a ~20 ms round trip,
      so 500k per-update dispatches dominate wall clock; scanning the whole
      block is semantics-identical (batches are sampled i.i.d. from the same
      buffer state either way) and pays the round trip once per block."""
      n = batches['rew'].shape[0]
      keys = jax.random.split(key, n)

      def body(carry, inp):
        batch, k = inp
        *carry2, metrics = update(*carry, batch, k)
        return tuple(carry2), metrics

      carry, metrics = jax.lax.scan(
          body, (params, target_params, log_alpha, pi_state, q_state,
                 a_state), (batches, keys))
      last = jax.tree_util.tree_map(lambda m: m[-1], metrics)
      return (*carry, last)

    self._act = jax.jit(act_fn, static_argnums=3)
    self._update = jax.jit(update)
    self._update_burst = jax.jit(update_burst)

  def _obs_subset(self, o):
    return {k: np.asarray(o[k], np.float32) for k in self.net_keys}

  def save(self, direc):
    """Checkpoint policy/Q params + opt states (reference: sac.py:337-338)."""
    import pickle
    from pathlib import Path
    import flax
    direc = Path(direc)
    direc.mkdir(parents=True, exist_ok=True)
    blob = {'params': flax.serialization.to_bytes(self.params),
            'target_params': flax.serialization.to_bytes(self.target_params),
            'log_alpha': np.asarray(self.log_alpha),
            'pi_state': flax.serialization.to_bytes(self.pi_state),
            'q_state': flax.serialization.to_bytes(self.q_state),
            'a_state': flax.serialization.to_bytes(self.a_state),
            'key': np.asarray(self.key), 'G': dict(self.G)}
    with open(direc / 'sac.pkl', 'wb') as f:
      pickle.dump(blob, f)
    print('SAVED SAC', direc / 'sac.pkl')

  def load(self, direc):
    import pickle
    from pathlib import Path
    import flax
    with open(Path(direc) / 'sac.pkl', 'rb') as f:
      blob = pickle.load(f)
    self.params = flax.serialization.from_bytes(self.params, blob['params'])
    self.target_params = flax.serialization.from_bytes(
        self.target_params, blob['target_params'])
    self.log_alpha = jnp.asarray(blob['log_alpha'])
    self.pi_state = flax.serialization.from_bytes(self.pi_state,
                                                  blob['pi_state'])
    self.q_state = flax.serialization.from_bytes(self.q_state,
                                                 blob['q_state'])
    self.a_state = flax.serialization.from_bytes(self.a_state,
                                                 blob['a_state'])
    self.key = jnp.asarray(blob['key'])
    print('LOADED SAC', Path(direc) / 'sac.pkl')

  def get_a(self, o, deterministic=False):
    self.key, k = jax.random.split(self.key)
    obs = {k2: jnp.asarray(v) for k2, v in self._obs_subset(o).items()}
    return self._act(self.params, obs, k, deterministic)

  def run_firehose(self):
    """On-policy firehose variant (reference: sac.py:200-240): no replay
    buffer — every iteration steps the big batched env with the current
    policy and SAC-updates on that fresh transition batch directly. Suited
    to the learned env, where thousands of envs live on device and the
    whole act->step->update cycle never leaves the chip."""
    G = self.G
    o = self.env.reset()
    t0 = time.time()
    as_jnp = lambda o_: {k: jnp.asarray(v) for k, v in
                         self._obs_subset(o_).items()}
    for itr in range(1, int(G.total_steps) + 1):
      a = self.get_a(o)
      o2, rew, done, info = self.env.step(a)
      batch = {'obs': as_jnp(o), 'act': jnp.asarray(a),
               'rew': jnp.asarray(rew, jnp.float32).reshape(-1),
               'obs2': as_jnp(o2),
               'done': jnp.asarray(done, jnp.float32).reshape(-1)}
      self.key, k = jax.random.split(self.key)
      (self.params, self.target_params, self.log_alpha, self.pi_state,
       self.q_state, self.a_state, metrics) = self._update(
          self.params, self.target_params, self.log_alpha, self.pi_state,
          self.q_state, self.a_state, batch, k)
      o = o2
      if itr % 200 == 0:  # periodic hard reset (reference: sac.py:214-215)
        o = self.env.reset()
      if itr % max(1, G.log_n // 10) == 0:
        self.logger.update({k2: float(v) for k2, v in metrics.items()})
        self.test_agent(itr)
        if G.lenv:
          self.test_agent(itr, use_lenv=True)
        self.logger['fps'] = itr * G.num_envs / (time.time() - t0)
        utils.dump_logger(self.logger, self.writer, itr, G)
        self.save(G.logdir)

  def run(self):
    G = self.G
    o = self.env.reset()
    ep_ret = np.zeros(G.num_envs)
    ep_len = np.zeros(G.num_envs)
    t0 = time.time()
    for t in range(0, int(G.total_steps), G.num_envs):
      if t < G.start_steps:
        a = np.random.uniform(-1, 1,
                              (G.num_envs, self.act_space.shape[-1]))
      else:
        a = np.asarray(self.get_a(o))
      o2, rew, done, info = self.env.step(a)
      rew, done = np.asarray(rew), np.asarray(done)
      if isinstance(info, list):
        timeout = np.array([i['timeout'] for i in info])
      else:
        timeout = np.asarray(info['timeout'])
      store_done = done & ~timeout  # timeout is not a true terminal
      self.buf.store_n(self._obs_subset(o), a, rew, self._obs_subset(o2),
                       store_done.astype(np.float32))
      ep_ret += rew
      ep_len += 1
      for i in np.nonzero(done)[0]:
        self.logger['EpRet'] = ep_ret[i]
        self.logger['EpLen'] = ep_len[i]
        ep_ret[i] = 0
        ep_len[i] = 0
      o = o2
      if t >= G.update_after and (t // G.num_envs) % \
          max(1, G.update_every // G.num_envs) == 0:
        # one fused dispatch for the whole update_every block (see
        # update_burst); i.i.d. batches are sampled in one host draw
        n = int(G.update_every)
        big = self.buf.sample_batch(self.rng, n * G.bs)
        batches = jax.tree_util.tree_map(
            lambda v: jnp.asarray(v).reshape(n, G.bs, *v.shape[1:]), big)
        self.key, k = jax.random.split(self.key)
        (self.params, self.target_params, self.log_alpha, self.pi_state,
         self.q_state, self.a_state, metrics) = self._update_burst(
            self.params, self.target_params, self.log_alpha, self.pi_state,
            self.q_state, self.a_state, batches, k)
        self.logger.update({k2: float(v) for k2, v in metrics.items()})
      if (t // G.num_envs) % max(1, 4000 // G.num_envs) == 0 and t > 0:
        self.test_agent(t)
        if G.lenv:
          self.test_agent(t, use_lenv=True)
        self.logger['fps'] = t / (time.time() - t0)
        utils.dump_logger(self.logger, self.writer, t, G)
        self.save(G.logdir)

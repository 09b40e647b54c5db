"""PPO: clipped-ratio policy gradient with GAE (reference: research/rl/ppo.py).

Same semantics — per-env paths finished on done, 80 pi iters with target-KL
early stop + 80 v iters per epoch — with jitted update steps and batched
on-device envs.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from research import utils
from research.rl._base import RLAlgo
from research.rl.buffers import PPOBuffer
from research.rl.nets import PPOActorCritic, gaussian_logp


class PPO(RLAlgo):
  def __init__(self, G):
    super().__init__(G)
    obs_space = self.obs_space
    act_dim = self.act_space.shape[-1]
    state_size = obs_space[G.state_key].shape[-1]
    self.ac = PPOActorCritic(act_dim, G.state_key, self.goal_key, state_size,
                             G.hidden_size)
    self.key = jax.random.PRNGKey(G.seed)
    dummy = {G.state_key: jnp.zeros((1, state_size)),
             self.goal_key: jnp.zeros((1, obs_space[self.goal_key].shape[-1]))}
    self.key, k = jax.random.split(self.key)
    self.params = self.ac.init(k, dummy)
    self.pi_opt = optax.adam(G.pi_lr)
    self.v_opt = optax.adam(G.vf_lr)
    self.pi_state = self.pi_opt.init(self.params)
    self.v_state = self.v_opt.init(self.params)

    obs_shapes = {G.state_key: obs_space[G.state_key].shape[-1:],
                  self.goal_key: obs_space[self.goal_key].shape[-1:]}
    self.steps_per_epoch = G.steps_per_epoch // G.num_envs
    self.buf = PPOBuffer(obs_shapes, act_dim, G.num_envs,
                         self.steps_per_epoch, G.gamma, G.lam)
    # --mesh=dpN shards the fused rollout's env batch over an N-device mesh
    # (same layout as Net._init: batch on 'dp', params replicated, traj
    # time-major so its batch axis is axis 1)
    mesh_spec = str(G.get('mesh', '') or '')
    if mesh_spec:
      assert mesh_spec.startswith('dp'), f'unsupported mesh {mesh_spec!r}'
      ndev = int(mesh_spec[2:])
      avail = jax.devices()
      assert len(avail) >= ndev, \
          f'mesh {mesh_spec} needs {ndev} devices, have {len(avail)}'
      assert G.num_envs % ndev == 0, \
          f'num_envs {G.num_envs} must divide over {ndev} devices'
      from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
      self.mesh = Mesh(np.array(avail[:ndev]).reshape(ndev, 1), ('dp', 'tp'))
      self._repl = NamedSharding(self.mesh, P())
      self._bshard = NamedSharding(self.mesh, P('dp'))
      self._tshard = NamedSharding(self.mesh, P(None, 'dp'))  # (T, B, ...)
    else:
      self.mesh = None
    self._build()

  def _build(self):
    G, ac = self.G, self.ac

    def step_fn(params, obs, key):
      mu, std = ac.apply(params, obs, method='policy')
      a = mu + std * jax.random.normal(key, mu.shape)
      logp = gaussian_logp(mu, std, a)
      v = ac.apply(params, obs, method='value')
      return a, v, logp

    def act_fn(params, obs, key, deterministic):
      mu, std = ac.apply(params, obs, method='policy')
      return mu if deterministic else mu + std * jax.random.normal(
          key, mu.shape)

    def pi_loss(params, batch):
      mu, std = ac.apply(params, batch['obs'], method='policy')
      logp = gaussian_logp(mu, std, batch['act'])
      ratio = jnp.exp(logp - batch['logp'])
      clip_adv = jnp.clip(ratio, 1 - G.clip_ratio, 1 + G.clip_ratio) \
          * batch['adv']
      loss = -jnp.minimum(ratio * batch['adv'], clip_adv).mean()
      kl = (batch['logp'] - logp).mean()
      ent = (0.5 * (1 + jnp.log(2 * jnp.pi)) + jnp.log(std)).sum(-1).mean()
      return loss, (kl, ent)

    def v_loss(params, batch):
      v = ac.apply(params, batch['obs'], method='value')
      return ((v - batch['ret']) ** 2).mean()

    def pi_update(params, opt_state, batch):
      (loss, (kl, ent)), grads = jax.value_and_grad(
          pi_loss, has_aux=True)(params, batch)
      updates, opt_state = self.pi_opt.update(grads, opt_state, params)
      return optax.apply_updates(params, updates), opt_state, loss, kl, ent

    def v_update(params, opt_state, batch):
      loss, grads = jax.value_and_grad(v_loss)(params, batch)
      updates, opt_state = self.v_opt.update(grads, opt_state, params)
      return optax.apply_updates(params, updates), opt_state, loss

    self._step = jax.jit(step_fn)
    self._act = jax.jit(act_fn, static_argnums=3)
    self._pi_update = jax.jit(pi_update)
    self._v_update = jax.jit(v_update)

  def _obs_subset(self, o):
    return {self.G.state_key: jnp.asarray(o[self.G.state_key], jnp.float32),
            self.goal_key: jnp.asarray(o[self.goal_key], jnp.float32)}

  def save(self, direc, name='ppo.pkl'):
    """Checkpoint actor-critic + opt states (reference: pponets.py:117-130)."""
    import pickle
    from pathlib import Path
    import flax
    direc = Path(direc)
    direc.mkdir(parents=True, exist_ok=True)
    blob = {'params': flax.serialization.to_bytes(self.params),
            'pi_state': flax.serialization.to_bytes(self.pi_state),
            'v_state': flax.serialization.to_bytes(self.v_state),
            'key': np.asarray(self.key), 'G': dict(self.G),
            'epoch': int(getattr(self, '_epoch', 0)),
            'best_succ': float(getattr(self, '_best_succ', -1.0))}
    with open(direc / name, 'wb') as f:
      pickle.dump(blob, f)
    print('SAVED PPO', direc / name)

  def load(self, direc, name='ppo.pkl'):
    import pickle
    from pathlib import Path
    import flax
    with open(Path(direc) / name, 'rb') as f:
      blob = pickle.load(f)
    self.params = flax.serialization.from_bytes(self.params, blob['params'])
    self.pi_state = flax.serialization.from_bytes(self.pi_state,
                                                  blob['pi_state'])
    self.v_state = flax.serialization.from_bytes(self.v_state,
                                                 blob['v_state'])
    self.key = jnp.asarray(blob['key'])
    self._start_epoch = int(blob.get('epoch', 0)) + 1
    self._best_succ = float(blob.get('best_succ', -1.0))
    print('LOADED PPO', Path(direc) / name,
          f'(resume at epoch {self._start_epoch})')

  def _build_fused(self):
    """One-dispatch epoch rollout: policy + env step + reward scanned on
    device (VecEnv real-env path only). Removes the per-step host round
    trips of the reference's loop (ppo.py:128-148) — the buffer/GAE stay on
    host, fed from one trajectory transfer per epoch."""
    venv = self.env
    env = venv.env
    ac = self.ac
    G = self.G
    from boxlcd_tpu.envs.env import Env as _Env
    gidx = getattr(venv, '_gidx', None)
    goal_mode = venv.goal_mode

    def net_obs(states, goals):
      obs = jax.vmap(lambda s: _Env.observe(env, s))(states)
      d = {G.state_key: obs[G.state_key]}
      if goal_mode == 'cube':
        d[self.goal_key] = goals['full_state'][:, gidx]
      else:
        d[self.goal_key] = goals['proprio']
      return d

    def rollout(params, states, goals, key, steps):
      def body(carry, k):
        states, goals = carry
        k1, k2 = jax.random.split(k)
        o = net_obs(states, goals)
        mu, std = ac.apply(params, o, method='policy')
        a = mu + std * jax.random.normal(k1, mu.shape)
        logp = gaussian_logp(mu, std, a)
        v = ac.apply(params, o, method='value')
        keys = jax.random.split(k2, venv.num_envs)
        states, goals, _, rew, done, _, success, _ = venv._core_step(
            states, goals, a, keys)
        return (states, goals), (o, a, rew, v, logp, done, success)
      (states, goals), traj = jax.lax.scan(body, (states, goals),
                                           jax.random.split(key, steps))
      last_v = ac.apply(params, net_obs(states, goals), method='value')
      return states, goals, traj, last_v

    if self.mesh is not None:
      self._rollout = jax.jit(
          rollout, static_argnums=4,
          in_shardings=(self._repl, self._bshard, self._bshard, self._repl),
          out_shardings=(self._bshard, self._bshard, self._tshard,
                         self._bshard))
    else:
      self._rollout = jax.jit(rollout, static_argnums=4)

  def _run_fused_epoch(self, ep_ret, ep_len):
    """Collect one epoch on device and feed the host GAE buffer."""
    G = self.G
    if self.env.states is None:
      self.env.reset()
    self.key, k = jax.random.split(self.key)

    def attempt():  # dispatch + materialize; commit only after success
      out = self._rollout(self.params, self.env.states, self.env.goals, k,
                          self.steps_per_epoch)
      np.asarray(out[3])  # barrier: all outputs share one executable
      return out
    (self.env.states, self.env.goals, traj, last_v) = utils.retry_transient(
        attempt, label='ppo fused epoch')
    return self._store_traj(traj, last_v, ep_ret, ep_len)

  def _build_fused_lenv(self):
    """One-dispatch dream-epoch rollout: policy + model onestep + body-goal
    reward scanned on device. Mirrors RewardLenv(LearnedEnv) exactly —
    window ring + ptr/slide (reference: learned_env.py:83-96), timeout
    full-reset with fresh real-env prompts, per-row goal resampling on
    success — but with zero per-step host round trips (the stateful dream
    loop costs ~20 ms tunnel RTT per jit dispatch; a 64-step epoch was
    ~330 s, PROGRESS.md round 2)."""
    from boxlcd_tpu.envs.env import Env as _Env
    G = self.G
    renv = self.env                 # RewardLenv
    lenv = renv.lenv                # LearnedEnv
    raw = lenv.raw_env
    model = lenv.model
    ac = self.ac
    W = lenv.window
    B = lenv.num_envs
    bidx = renv._bidx
    temp = float(G.get('lenv_temp', 1.0))
    ep_len = int(G.ep_len)

    POOL = max(4 * B, 256)  # fresh real-env snapshots drawn per epoch

    def sample_obs(k):  # prompts and goals both come from real-env resets
      o = _Env.observe(raw, _Env.reset(raw, k))
      return {'lcd': o['lcd'].astype(jnp.float32), 'proprio': o['proprio']}

    def fresh_wb(prompts):
      wb = {'lcd': jnp.zeros((B, W, *raw.observation_space['lcd'].shape)),
            'proprio': jnp.zeros((B, W, max(1, raw.pobs_size))),
            'action': jnp.zeros((B, W, raw.act_size))}
      for kk in ('lcd', 'proprio'):
        wb[kk] = wb[kk].at[:, 0].set(prompts[kk].astype(jnp.float32))
      return wb

    def net_obs(wb, idx, goals):
      pro = jax.lax.dynamic_slice_in_dim(wb['proprio'], idx, 1, axis=1)[:, 0]
      return {G.state_key: pro, self.goal_key: goals['goal:proprio']}, pro

    def rollout(params, mparams, wb, ptr, ep_t, goals, key, steps):
      # per-epoch snapshot pools: real-env resets are too expensive to run
      # (vmapped, twice) inside every scan step; drawing prompts/goals from
      # a POOL-sized fresh sample per epoch is distributionally equivalent
      kp1, kp2, key = jax.random.split(key, 3)
      prompt_pool = jax.vmap(sample_obs)(jax.random.split(kp1, POOL))
      goal_pool = jax.vmap(sample_obs)(jax.random.split(kp2, POOL))

      def body(carry, k):
        wb, ptr, ep_t, goals = carry
        k1, k2, k3, k4 = jax.random.split(k, 4)
        o, _ = net_obs(wb, ptr - 1, goals)
        mu, std = ac.apply(params, o, method='policy')
        a = mu + std * jax.random.normal(k1, mu.shape)
        logp = gaussian_logp(mu, std, a)
        v = ac.apply(params, o, method='value')
        # LearnedEnv.step
        wb = dict(wb)
        wb['action'] = jax.lax.dynamic_update_slice_in_dim(
            wb['action'], a[:, None].astype(wb['action'].dtype), ptr - 1,
            axis=1)
        wb = model.onestep(mparams, wb, ptr, k2, temp)
        npro = jax.lax.dynamic_slice_in_dim(
            wb['proprio'], ptr, 1, axis=1)[:, 0]
        ptr2 = jnp.minimum(ptr + 1, W - 1)
        slide = ptr2 == W - 1
        wb_slid = {kk: jnp.concatenate([vv[:, 1:], jnp.zeros_like(vv[:, :1])],
                                       axis=1) for kk, vv in wb.items()}
        wb = jax.tree_util.tree_map(
            lambda aa, bb: jnp.where(slide, bb, aa), wb, wb_slid)
        ptr2 = jnp.where(slide, ptr2 - 1, ptr2)
        ep_t2 = ep_t + 1
        timeout = ep_t2 >= ep_len                      # scalar (lockstep)
        # RewardLenv body-goal reward
        delta = jnp.abs(goals['goal:proprio'][:, bidx]
                        - npro[:, bidx]).mean(-1)
        goal_done = delta < G.goal_thresh
        tvec = jnp.broadcast_to(timeout, (B,))
        success = goal_done & ~tvec
        rew = (-delta + success) * G.rew_scale
        done = tvec | goal_done
        # autoreset: full reset on (lockstep) timeout; goals on success
        pidx = jax.random.randint(k3, (B,), 0, POOL)
        wb_new = fresh_wb({kk: vv[pidx] for kk, vv in prompt_pool.items()})
        wb = jax.tree_util.tree_map(
            lambda aa, bb: jnp.where(timeout, bb, aa), wb, wb_new)
        ptr2 = jnp.where(timeout, 1, ptr2)
        ep_t2 = jnp.where(timeout, 0, ep_t2)
        gidx = jax.random.randint(k4, (B,), 0, POOL)
        gnew = {'goal:lcd': goal_pool['lcd'][gidx],
                'goal:proprio': goal_pool['proprio'][gidx]}
        gmask = goal_done | tvec
        goals = {kk: jnp.where(gmask.reshape((B,) + (1,) * (vv.ndim - 1)),
                               gnew[kk], vv) for kk, vv in goals.items()}
        return (wb, ptr2, ep_t2, goals), (o, a, rew, v, logp, done, success)

      (wb, ptr, ep_t, goals), traj = jax.lax.scan(
          body, (wb, ptr, ep_t, goals), jax.random.split(key, steps))
      o, _ = net_obs(wb, ptr - 1, goals)
      last_v = ac.apply(params, o, method='value')
      return wb, ptr, ep_t, goals, traj, last_v

    if self.mesh is not None:
      self._lenv_rollout = jax.jit(
          rollout, static_argnums=7,
          in_shardings=(self._repl, self._repl, self._bshard, self._repl,
                        self._repl, self._bshard, self._repl),
          out_shardings=(self._bshard, self._repl, self._repl, self._bshard,
                         self._tshard, self._bshard))
    else:
      self._lenv_rollout = jax.jit(rollout, static_argnums=7)
    self._lenv_state = None

  def _run_fused_lenv_epoch(self, ep_ret, ep_len_acc):
    """Collect one dream epoch on device and feed the host GAE buffer."""
    G = self.G
    if self._lenv_state is None:
      self.env.reset()                      # stateful init for parity
      lenv = self.env.lenv
      self._lenv_state = (lenv.window_batch, jnp.int32(lenv.ptr),
                          jnp.int32(lenv.ep_t),
                          dict(self.env.goal))
    wb, ptr, ep_t, goals = self._lenv_state
    self.key, k = jax.random.split(self.key)

    def attempt():
      out = self._lenv_rollout(
          self.params, self.env.lenv.model.params, wb, ptr, ep_t, goals, k,
          self.steps_per_epoch)
      np.asarray(out[5])  # barrier: all outputs share one executable
      return out
    wb, ptr, ep_t, goals, traj, last_v = utils.retry_transient(
        attempt, label='ppo fused lenv epoch')
    self._lenv_state = (wb, ptr, ep_t, goals)
    return self._store_traj(traj, last_v, ep_ret, ep_len_acc)

  def _store_traj(self, traj, last_v, ep_ret, ep_len):
    """Feed a (T, B) on-device trajectory into the host GAE buffer."""
    G = self.G
    o_t, a_t, rew_t, v_t, logp_t, done_t, succ_t = jax.tree_util.tree_map(
        np.asarray, traj)
    last_v = np.asarray(last_v)
    T = self.steps_per_epoch
    for t in range(T):
      self.buf.store_n({k2: v[t] for k2, v in o_t.items()},
                       a_t[t], rew_t[t], v_t[t], logp_t[t])
      ep_ret += rew_t[t]
      ep_len += 1
      epoch_end = t == T - 1
      for i in range(G.num_envs):
        if done_t[t][i] or epoch_end:
          timeout = ep_len[i] >= G.ep_len
          if done_t[t][i]:
            self.logger['EpRet'] = ep_ret[i]
            self.logger['EpLen'] = ep_len[i]
            self.logger['success_rate'] = float(succ_t[t][i])
            ep_ret[i] = 0
            ep_len[i] = 0
          # bootstrap rule (reference ppo.py:160-173): zero the value only at
          # TRUE terminals (success); timeouts and epoch cuts bootstrap with
          # V(next obs) — for an autoreset venv that next obs is the fresh
          # episode's first state, exactly as the reference's step(o) sees it
          if done_t[t][i] and not timeout:
            last_val = 0.0
          elif t == T - 1:
            last_val = float(last_v[i])
          else:
            last_val = float(v_t[t + 1][i])
          self.buf.finish_path(i, last_val)
    return ep_ret, ep_len

  def get_av(self, o):
    self.key, k = jax.random.split(self.key)
    return self._step(self.params, self._obs_subset(o), k)

  def get_a(self, o, deterministic=False):
    self.key, k = jax.random.split(self.key)
    return self._act(self.params, self._obs_subset(o), k, deterministic)

  def update(self):
    """80 pi iters + 80 v iters on G.bs random minibatches (reference:
    ppo.py:71-105 — the reference samples `bs`-sized minibatches from the
    whole epoch buffer and has its KL early stop commented out; --kl_stop=1
    re-enables the spinup-style stop)."""
    data = self.buf.get()
    batch = {'obs': {k: jnp.asarray(v) for k, v in data['obs'].items()},
             'act': jnp.asarray(data['act']), 'ret': jnp.asarray(data['ret']),
             'adv': jnp.asarray(data['adv']), 'logp': jnp.asarray(data['logp'])}
    nbuf = int(batch['act'].shape[0])
    bs = min(int(self.G.bs), nbuf)
    rng = np.random.RandomState(None)
    def mb():
      if bs >= nbuf:
        return batch
      idxs = jnp.asarray(rng.randint(0, nbuf, bs))
      return jax.tree_util.tree_map(lambda x: x[idxs], batch)
    kl_stop = bool(self.G.get('kl_stop', 0))
    for i in range(self.G.train_pi_iters):
      self.params, self.pi_state, loss, kl, ent = self._pi_update(
          self.params, self.pi_state, mb())
      if kl_stop and float(kl) > 1.5 * self.G.target_kl:
        break
    self.logger['loss/pi'] = float(loss)
    self.logger['kl'] = float(kl)
    self.logger['entropy'] = float(ent)
    self.logger['stop_iter'] = i
    for _ in range(self.G.train_v_iters):
      self.params, self.v_state, vloss = self._v_update(
          self.params, self.v_state, mb())
    self.logger['loss/v'] = float(vloss)

  def _test_and_save(self, epoch):
    """Real-env test + best-checkpoint-by-success saving: ppo.pkl is the
    best-so-far (what eval_policy loads), ppo_last.pkl the rolling one."""
    G = self.G
    succ = self.test_agent(epoch)
    if G.lenv and bool(G.get('lenv_test', 1)):
      # the lenv test host-loops ep_len model forwards over the tunnel
      # (~minutes per cycle); --lenv_test=0 skips it — best-checkpoint
      # selection only needs the REAL test above
      self.test_agent(epoch, use_lenv=True)
    utils.dump_logger(self.logger, self.writer, epoch * G.steps_per_epoch, G)
    if succ >= getattr(self, '_best_succ', -1.0):
      self._best_succ = succ
      self.save(G.logdir)
    self.save(G.logdir, name='ppo_last.pkl')
    return succ

  def run(self):
    G = self.G
    epochs = int(G.total_steps) // G.steps_per_epoch
    fused = (not G.lenv and hasattr(self.env, '_core_step')
             and bool(G.get('fused_rollout', 1)))
    fused_lenv = (G.lenv and bool(G.get('fused_rollout', 1))
                  and self.goal_key == 'goal:proprio'
                  and not G.get('preproc')
                  and hasattr(self.env, 'lenv'))
    if fused:
      self._build_fused()
    if fused_lenv:
      self._build_fused_lenv()
    o = None if fused_lenv else self.env.reset()
    ep_ret = np.zeros(G.num_envs)
    ep_len = np.zeros(G.num_envs)
    # wall-clock-aware convergence stop: --early_stop_succ=S stops training
    # once the REAL-env test success is >= S for --early_stop_n consecutive
    # test cycles (the N=1000 eval_policy protocol remains the headline
    # gate; this only truncates the flat tail of the training curve)
    stop_succ = float(G.get('early_stop_succ', 0.0))
    stop_n = int(G.get('early_stop_n', 4))
    streak = 0
    for epoch in range(getattr(self, '_start_epoch', 0), epochs):
      self._epoch = epoch
      ep_start = time.time()
      if fused or fused_lenv:
        if fused:
          ep_ret, ep_len = self._run_fused_epoch(ep_ret, ep_len)
        else:
          ep_ret, ep_len = self._run_fused_lenv_epoch(ep_ret, ep_len)
        self.update()
        self.logger['dt/epoch'] = time.time() - ep_start
        if epoch % G.test_n == 0:
          succ = self._test_and_save(epoch)
          streak = streak + 1 if (stop_succ and succ >= stop_succ) else 0
          if stop_succ and streak >= stop_n:
            print(f'EARLY STOP: test success >= {stop_succ} for {streak} '
                  f'consecutive tests (epoch {epoch})')
            self.save(G.logdir, name='ppo_last.pkl')
            return
        continue
      for t in range(self.steps_per_epoch):
        a, v, logp = self.get_av(o)
        a_np = np.asarray(a)
        next_o, rew, done, info = self.env.step(a_np)
        rew = np.asarray(rew)
        done = np.asarray(done)
        self.buf.store_n(
            {k: np.asarray(val) for k, val in self._obs_subset(o).items()},
            a_np, rew, np.asarray(v), np.asarray(logp))
        ep_ret += rew
        ep_len += 1
        o = next_o
        epoch_end = t == self.steps_per_epoch - 1
        for i in range(G.num_envs):
          if done[i] or epoch_end:
            timeout = ep_len[i] >= G.ep_len
            if done[i]:
              self.logger['EpRet'] = ep_ret[i]
              self.logger['EpLen'] = ep_len[i]
              ep_ret[i] = 0
              ep_len[i] = 0
            # reference bootstrap rule (ppo.py:160-173): zero only at TRUE
            # terminals; timeouts and epoch cuts bootstrap with V(next obs)
            if done[i] and not timeout:
              last_val = 0.0
            else:
              _, v_i, _ = self.get_av(
                  {k: np.asarray(val)[i:i + 1]
                   for k, val in self._obs_subset(o).items()})
              last_val = float(np.asarray(v_i)[0])
            self.buf.finish_path(i, last_val)
      self.update()
      self.logger['dt/epoch'] = time.time() - ep_start
      if epoch % G.test_n == 0:
        succ = self._test_and_save(epoch)
        streak = streak + 1 if (stop_succ and succ >= stop_succ) else 0
        if stop_succ and streak >= stop_n:
          print(f'EARLY STOP: test success >= {stop_succ} for {streak} '
                f'consecutive tests (epoch {epoch})')
          self.save(G.logdir, name='ppo_last.pkl')
          return
    self.save(G.logdir, name='ppo_last.pkl')

"""VecEnv: batched on-device vector env with functional goal conditioning.

The TPU-native replacement for the reference's one-process-per-env
AsyncVectorEnv (reference: research/wrappers/async_vector_env.py): all worlds
live in one batched WorldState on device; reset/step are jitted vmapped
functions; "IPC" is register traffic. Implements the same surface the
reference RL/collection code relies on:
  - reset(idxs) partial resets with per-env kwargs (async_vector_env.py:131-156)
  - autoreset on done (the vendored gym worker resets on done)
  - goal conditioning fused in (BodyGoal/CubeGoal rewards as jnp,
    reference: body_goal.py:58-88, cube_goal.py:65-89)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from boxlcd_tpu import spaces, utils
from boxlcd_tpu.envs.env import Env


class VecEnv:
  def __init__(self, env, num_envs, G, goal_mode=None, seed=0):
    """env: a boxlcd_tpu Env (functional core used directly).
    goal_mode: None | 'body' | 'cube'."""
    self.env = env
    self.num_envs = num_envs
    self.G = G
    self.goal_mode = goal_mode
    self.key = jax.random.PRNGKey(seed)
    s = env.spec
    if goal_mode == 'body':
      keys = utils.filtlist(env.pobs_keys, '.*(x|y):p')
      self._gidx = jnp.asarray([env.pobs_keys.index(x) for x in keys])
    elif goal_mode == 'cube':
      keys = utils.filtlist(env.obs_keys, 'object.*(x|y):p')
      self._gidx = jnp.asarray([env.obs_keys.index(x) for x in keys])
    self._build()
    self.states = None
    self.goals = None

  # -- spaces ------------------------------------------------------------------
  @property
  def action_space(self):
    return self.env.action_space

  @property
  def observation_space(self):
    sp = dict(self.env.observation_space.spaces)
    if self.goal_mode:
      sp['goal:lcd'] = sp['lcd']
      sp['goal:proprio'] = sp['proprio']
      if self.goal_mode == 'cube':
        sp['goal:object'] = spaces.Box(-1, 1, (2,), np.float32)
        sp['goal:full_state'] = sp['full_state']
    return spaces.Dict(sp)

  # -- jitted cores ---------------------------------------------------------------
  def _build(self):
    env = self.env

    def sample_goal(key):
      """Goal snapshot: fresh reset (body) + settle steps (cube)."""
      st = Env.reset(env, key)
      if self.goal_mode == 'cube':
        def settle(s, _):
          return Env.step(env, s, jnp.zeros(env.act_size))[0], None
        st, _ = jax.lax.scan(settle, st, None, length=10)
      return Env.observe(env, st)

    def reset_some(states, goals, keys, mask):
      """Reset envs where mask; resample their goals too."""
      fresh = jax.vmap(lambda k: Env.reset(env, k))(keys)
      states = jax.tree_util.tree_map(
          lambda a, b: jnp.where(
              mask.reshape(mask.shape + (1,) * (a.ndim - 1)), b, a),
          states, fresh)
      if self.goal_mode:
        gkeys = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
        new_goals = jax.vmap(sample_goal)(gkeys)
        goals = jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                mask.reshape(mask.shape + (1,) * (a.ndim - 1)), b, a),
            goals, new_goals)
      obs = jax.vmap(lambda s: Env.observe(env, s))(states)
      return states, goals, obs

    def comp_rew_done(obs, goals, last_delta):
      if self.goal_mode == 'body':
        delta = jnp.abs(goals['proprio'][:, self._gidx]
                        - obs['proprio'][:, self._gidx]).mean(-1)
        rew = -delta
        success = delta < self.G.goal_thresh
        rew = rew + success
        return rew, success, delta
      if self.goal_mode == 'cube':
        delta = jnp.abs(goals['full_state'][:, self._gidx]
                        - obs['full_state'][:, self._gidx]).mean(-1)
        rew = -delta
        success = delta < 0.05
        rew = rew + success
        return rew, success, delta
      z = jnp.zeros(obs['lcd'].shape[0])
      return z, jnp.zeros_like(z, bool), z

    def step(states, goals, actions, keys):
      def sstep(s, a):
        ns, obs, rew, done, info = Env.step(env, s, a)
        return ns, obs, done
      states, obs, timeout = jax.vmap(sstep)(states, actions)
      rew, success, delta = comp_rew_done(obs, goals, None)
      done = timeout | success if self.goal_mode else timeout
      rew = rew * self.G.get('rew_scale', 1.0) if self.goal_mode else rew
      # autoreset
      states, goals, _ = reset_some(states, goals, keys, done)
      obs2 = jax.vmap(lambda s: Env.observe(env, s))(states)
      out_obs = jax.tree_util.tree_map(
          lambda o, o2: jnp.where(
              done.reshape(done.shape + (1,) * (o.ndim - 1)), o2, o),
          obs, obs2)
      return states, goals, out_obs, rew, done, timeout, success, delta

    self._jit_reset_some = jax.jit(reset_some)
    self._jit_step = jax.jit(step)
    self._sample_goal = sample_goal
    # pure cores for callers that fuse policy+env into one jitted program
    # (e.g. PPO's on-device epoch rollout)
    self._core_step = step
    self._core_reset_some = reset_some

  def _keys(self, n):
    self.key, *ks = jax.random.split(self.key, n + 1)
    return jnp.stack(ks)

  def _attach_goals(self, obs):
    if self.goal_mode:
      obs['goal:lcd'] = self.goals['lcd']
      obs['goal:proprio'] = self.goals['proprio']
      if self.goal_mode == 'cube':
        obs['goal:full_state'] = self.goals['full_state']
        obs['goal:object'] = self.goals['full_state'][:, self._gidx]
    return obs

  def reset(self, idxs=None):
    B = self.num_envs
    if self.states is None or idxs is None:
      mask = jnp.ones(B, bool)
      if self.states is None:
        keys = self._keys(B)
        states = jax.vmap(lambda k: Env.reset(self.env, k))(keys)
        goals = (jax.vmap(self._sample_goal)(self._keys(B))
                 if self.goal_mode else states)  # placeholder when no goals
        self.states, self.goals = states, goals
    else:
      mask = jnp.zeros(B, bool).at[jnp.asarray(idxs)].set(True)
    self.states, self.goals, obs = self._jit_reset_some(
        self.states, self.goals, self._keys(B), mask)
    obs = {k: np.asarray(v) for k, v in obs.items()}
    return self._attach_goals(obs)

  def step(self, actions):
    actions = jnp.asarray(actions, jnp.float32)
    (self.states, self.goals, obs, rew, done, timeout, success,
     delta) = self._jit_step(self.states, self.goals, actions, self._keys(self.num_envs))
    obs = {k: np.asarray(v) for k, v in obs.items()}
    obs = self._attach_goals(obs)
    rew = np.asarray(rew)
    done = np.asarray(done)
    infos = [{'timeout': bool(t), 'success': bool(s), 'delta': float(d)}
             for t, s, d in zip(np.asarray(timeout), np.asarray(success),
                                np.asarray(delta))]
    return obs, rew, done, infos

"""LearnedEnv / RewardLenv: the world model served as a batched environment.

The headline capability (reference: research/wrappers/learned_env.py): RL
agents act inside the learned simulator. A rolling window of (lcd, proprio,
action) lives on device; each step writes the action at the pointer, runs the
model's onestep to predict the next frame, and slides the window when full
(reference: learned_env.py:83-96). RewardLenv adds goal conditioning with
BodyGoal proprio-delta or ObjectLocalizer rewards (reference: :98-222).

All tensors are jnp on device; the hot path (onestep) is jitted per pointer
position via the model's onestep fn.
"""
from __future__ import annotations

import functools
import pickle
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from boxlcd_tpu import spaces, utils
from boxlcd_tpu.envs.env import Env


class LearnedEnv:
  def __init__(self, num_envs, model, G, real_env=None):
    self.num_envs = num_envs
    self.G = G
    self.model = model
    self.real_env = real_env if real_env is not None else model.env
    base = self.real_env
    # unwrap goal wrappers to the raw env for key metadata
    raw = base._env if hasattr(base, '_env') else base
    self.obs_keys = raw.obs_keys
    self.pobs_keys = raw.pobs_keys
    self.raw_env = raw
    self.window = model.G.window
    self.keys = ['lcd', 'proprio']
    lcd_space = raw.observation_space['lcd']
    pro_space = raw.observation_space['proprio']
    self.observation_space = spaces.Dict({
        'lcd': spaces.Box(-1, 1, (num_envs,) + lcd_space.shape, np.float32),
        'proprio': spaces.Box(-1, 1, (num_envs,) + pro_space.shape, np.float32),
    })
    self.action_space = spaces.Box(-1, 1, (num_envs, raw.act_size), np.float32)
    self.key = jax.random.PRNGKey(int(G.get('seed', 0)))
    self._jit_onestep = jax.jit(
        lambda params, batch, i, k, temp: model.onestep(
            params, batch, i, k, temp))
    self._jit_prompt = jax.jit(jax.vmap(
        lambda k: Env.observe(self.raw_env, Env.reset(self.raw_env, k))))

  def _rng(self):
    self.key, k = jax.random.split(self.key)
    return k

  def reset(self, update_window_batch=True):
    """Prompt from real env resets (reference: learned_env.py:54-81)."""
    B, W = self.num_envs, self.window
    prompts = self._jit_prompt(jax.random.split(self._rng(), B))
    raw = self.raw_env
    wb = {
        'lcd': jnp.zeros((B, W, *raw.observation_space['lcd'].shape)),
        'proprio': jnp.zeros((B, W, max(1, raw.pobs_size))),
        'action': jnp.zeros((B, W, raw.act_size)),
    }
    for key in self.keys:
      wb[key] = wb[key].at[:, 0].set(prompts[key].astype(jnp.float32))
    if self.G.get('reset_prompt', 1):
      ptr = 1
    else:
      wb['action'] = jax.random.uniform(self._rng(), wb['action'].shape,
                                        minval=-1, maxval=1)
      for ptr in range(10):
        wb = self._jit_onestep(self.model.params, wb, ptr, self._rng(),
                               self.G.get('lenv_temp', 1.0))
      wb = {k: jnp.concatenate([v[:, 5:], jnp.zeros_like(v)[:, :5]], 1)
            for k, v in wb.items()}
      ptr = 4
    obs = {k: wb[k][:, ptr - 1] for k in self.keys}
    if update_window_batch:
      self.window_batch = wb
      self.ptr = ptr
      self.ep_t = 0
    return obs

  def step(self, act):
    self.ep_t += 1
    wb = self.window_batch
    wb['action'] = wb['action'].at[:, self.ptr - 1].set(jnp.asarray(act))
    wb = self._jit_onestep(self.model.params, wb, self.ptr, self._rng(),
                           self.G.get('lenv_temp', 1.0))
    obs = {k: wb[k][:, self.ptr] for k in self.keys}
    self.ptr = min(1 + self.ptr, self.window - 1)
    if self.ptr == self.window - 1:
      # slide the window ring left by one (reference: learned_env.py:90-93)
      wb = {k: jnp.concatenate([v[:, 1:], jnp.zeros_like(v)[:, :1]], 1)
            for k, v in wb.items()}
      self.ptr -= 1
    self.window_batch = wb
    timeout = jnp.full(self.num_envs, self.ep_t >= self.G.ep_len)
    rew = jnp.zeros(self.num_envs)
    return obs, rew, timeout, {'timeout': timeout}


def load_object_localizer(env, arbiterdir):
  """Frozen ObjectLocalizer as a pure fn (replaces torch.jit.load at
  learned_env.py:113)."""
  cands = sorted(Path(arbiterdir).glob('ObjectLocalizer.frozen.pkl'))
  if not cands:
    return None
  import flax
  from boxlcd_tpu.utils import AttrDict
  from research.nets.autoencoders.object_localizer import ObjectLocalizer
  with open(cands[0], 'rb') as f:
    blob = pickle.load(f)
  model = ObjectLocalizer(env, AttrDict(blob['G']))
  params = flax.serialization.from_bytes(model.params, blob['params'])
  print('LOADED OBJECT LOCALIZER')
  return jax.jit(lambda lcd, proprio: model.localize(params, lcd, proprio))


class RewardLenv:
  """Goals + reward on top of LearnedEnv (reference: learned_env.py:98-222)."""

  def __init__(self, env):
    self.lenv = env
    self.G = env.G
    self.real_env = env.real_env
    self.pobs_keys = env.pobs_keys
    self.obs_keys = env.obs_keys
    keys = utils.filtlist(self.pobs_keys, '.*(x|y):p')
    self._bidx = jnp.asarray([self.pobs_keys.index(x) for x in keys])
    self._is_cube = 'CubeGoal' in type(self.real_env).__name__
    self.obj_loc = None
    if self._is_cube and str(self.G.arbiterdir):
      self.obj_loc = load_object_localizer(env.raw_env, self.G.arbiterdir)
    B = env.num_envs
    self.goal = {
        'goal:lcd': jnp.zeros(env.observation_space['lcd'].shape),
        'goal:proprio': jnp.zeros(env.observation_space['proprio'].shape),
    }
    if self._is_cube:
      self.goal['goal:object'] = jnp.zeros((B, 2))
    self.key = jax.random.PRNGKey(17)

  @property
  def action_space(self):
    return self.lenv.action_space

  @property
  def observation_space(self):
    sp = dict(self.lenv.observation_space.spaces)
    sp['goal:lcd'] = sp['lcd']
    sp['goal:proprio'] = sp['proprio']
    if self._is_cube:
      sp['goal:object'] = spaces.Box(-1, 1, (self.lenv.num_envs, 2),
                                     np.float32)
    return spaces.Dict(sp)

  def _sample_real_goals(self):
    """Goal snapshots from real-env resets (reference: learned_env.py:168-171)."""
    B = self.lenv.num_envs
    self.key, k = jax.random.split(self.key)
    raw = self.lenv.raw_env

    def one(kk):
      obs = Env.observe(raw, Env.reset(raw, kk))
      return obs

    obs = jax.vmap(one)(jax.random.split(k, B))
    out = {'goal:lcd': obs['lcd'].astype(jnp.float32),
           'goal:proprio': obs['proprio']}
    if self._is_cube:
      keys = utils.filtlist(self.obs_keys, 'object.*(x|y):p')
      idxs = jnp.asarray([self.obs_keys.index(x) for x in keys])
      out['goal:object'] = obs['full_state'][:, idxs]
    return out

  def _reset_goals(self, mask):
    if self.G.get('lenv_goals', 0):
      new = {f'goal:{k}': v for k, v in
             self.lenv.reset(update_window_batch=False).items()}
    else:
      new = self._sample_real_goals()
    def mix(n, o):
      m = mask.reshape(mask.shape + (1,) * (n.ndim - 1))
      return jnp.where(m, n, o)
    self.goal = {k: mix(new[k], self.goal[k]) for k in self.goal}

  def reset(self, *args, **kwargs):
    self._reset_goals(jnp.ones(self.lenv.num_envs, bool))
    obs = self.lenv.reset(*args, **kwargs)
    obs.update({k: v for k, v in self.goal.items()})
    self.last_obs = dict(obs)
    return obs

  def comp_rew_done(self, obs, info=None):
    if not self._is_cube:
      delta = jnp.abs(obs['goal:proprio'][..., self._bidx]
                      - obs['proprio'][..., self._bidx]).mean(-1)
      if self.G.get('diff_delt', 0):
        # diff-delta shaping, body goals too (reference: body_goal.py:66-71)
        last_delta = jnp.abs(
            self.last_obs['goal:proprio'][..., self._bidx]
            - self.last_obs['proprio'][..., self._bidx]).mean(-1)
        rew = -0.05 + 10 * (last_delta - delta)
      else:
        rew = -delta
      done = delta < self.G.goal_thresh
    else:
      assert self.obj_loc is not None, 'CubeGoal lenv needs an ObjectLocalizer'
      obj = self.obj_loc(obs['lcd'], obs['proprio'])
      goal = self.obj_loc(obs['goal:lcd'], obs['goal:proprio'])
      delta = jnp.abs(obj - goal).mean(-1)
      if self.G.get('diff_delt', 0):
        last_obj = self.obj_loc(self.last_obs['lcd'],
                                self.last_obs['proprio'])
        last_delta = jnp.abs(last_obj - goal).mean(-1)
        rew = -0.05 + 10 * (last_delta - delta)
      else:
        rew = -delta
      done = delta < self.G.goal_thresh
    return rew, done, delta

  def step(self, act):
    obs, rew, ep_done, info = self.lenv.step(act)
    obs.update({k: v for k, v in self.goal.items()})
    rew, goal_done, delta = self.comp_rew_done(obs, info)
    success = goal_done & ~ep_done
    rew = rew + success
    done = ep_done | goal_done
    rew = rew * self.G.rew_scale
    info = dict(info)
    info['delta'] = delta
    info['success'] = goal_done
    if self.G.get('autoreset', 0):
      if bool(jnp.all(ep_done)):
        obs = self.reset()
      elif bool(jnp.any(goal_done)):
        self._reset_goals(goal_done)
    self.last_obs = dict(obs)
    return obs, rew, done, info

  def render(self, *args, **kwargs):
    return self.lenv.render(*args, **kwargs)

"""PreprocVecEnv: encode observations through a frozen autoencoder, adding
zstate / goal:zstate (reference: research/wrappers/preproc_vec_env.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from boxlcd_tpu import spaces


class PreprocVecEnv:
  """Wraps a vector env (real or learned); obs gain `zstate` (and
  `goal:zstate` when goals are present)."""

  def __init__(self, model, env, G):
    self.model = model
    self._env = env
    self.G = G
    self.z_size = model.z_size
    self._jit_enc = jax.jit(
        lambda lcd, proprio: model.encode(
            model.params, {'lcd': lcd, 'proprio': proprio}, noise=False))

  def __getattr__(self, name):
    return getattr(self._env, name)

  @property
  def num_envs(self):
    return self._env.num_envs

  @property
  def action_space(self):
    return self._env.action_space

  @property
  def observation_space(self):
    sp = dict(self._env.observation_space.spaces)
    sp['zstate'] = spaces.Box(-1, 1, (self.z_size,), np.float32)
    if 'goal:lcd' in sp:
      sp['goal:zstate'] = spaces.Box(-1, 1, (self.z_size,), np.float32)
    return spaces.Dict(sp)

  def _preproc(self, obs):
    lcd = jnp.asarray(obs['lcd'], jnp.float32)
    proprio = jnp.asarray(obs['proprio'], jnp.float32)
    obs['zstate'] = np.asarray(self._jit_enc(lcd, proprio))
    if 'goal:lcd' in obs:
      glcd = jnp.asarray(obs['goal:lcd'], jnp.float32)
      gpro = jnp.asarray(obs['goal:proprio'], jnp.float32)
      obs['goal:zstate'] = np.asarray(self._jit_enc(glcd, gpro))
    return obs

  def reset(self, *args, **kwargs):
    return self._preproc(dict(self._env.reset(*args, **kwargs)))

  def step(self, action):
    obs, rew, done, info = self._env.step(action)
    return self._preproc(dict(obs)), rew, done, info

"""RL networks in flax: PPO Gaussian actor-critic and SAC squashed-Gaussian
actor + twin Q (reference: research/rl/pponets.py, research/rl/sacnets.py)."""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LOG_STD_MAX = 2
LOG_STD_MIN = -20


class BaseMLP(nn.Module):
  out_size: int
  hidden_size: int = 128

  @nn.compact
  def __call__(self, x):
    for _ in range(2):
      x = nn.relu(nn.Dense(self.hidden_size)(x))
    return nn.Dense(self.out_size)(x)


def _obs_input(obs, state_key, goal_key, goal_preproc):
  g = goal_preproc(obs[goal_key])
  return jnp.concatenate([obs[state_key], g], -1)


class PPOActor(nn.Module):
  """Gaussian policy over [state_key, linear(goal)] (reference: pponets.py:36-70)."""
  act_dim: int
  state_key: str
  goal_key: str
  state_size: int
  hidden_size: int = 128

  @nn.compact
  def __call__(self, obs):
    log_std = self.param('log_std',
                         lambda k, s: -0.5 * jnp.ones(s), (self.act_dim,))
    gp = nn.Dense(self.state_size, name='goal_preproc')
    x = jnp.concatenate([obs[self.state_key], gp(obs[self.goal_key])], -1)
    mu = BaseMLP(self.act_dim, self.hidden_size)(x)
    return mu, jnp.exp(log_std)


class PPOCritic(nn.Module):
  state_key: str
  goal_key: str
  state_size: int
  hidden_size: int = 128

  @nn.compact
  def __call__(self, obs):
    gp = nn.Dense(self.state_size, name='goal_preproc')
    x = jnp.concatenate([obs[self.state_key], gp(obs[self.goal_key])], -1)
    return BaseMLP(1, self.hidden_size)(x)[..., 0]


class PPOActorCritic(nn.Module):
  act_dim: int
  state_key: str
  goal_key: str
  state_size: int
  hidden_size: int = 128

  def setup(self):
    self.pi = PPOActor(self.act_dim, self.state_key, self.goal_key,
                       self.state_size, self.hidden_size)
    self.v = PPOCritic(self.state_key, self.goal_key, self.state_size,
                       self.hidden_size)

  def __call__(self, obs):
    mu, std = self.pi(obs)
    return mu, std, self.v(obs)

  def policy(self, obs):
    return self.pi(obs)

  def value(self, obs):
    return self.v(obs)


def gaussian_logp(mu, std, act):
  lp = -0.5 * (((act - mu) / std) ** 2 + 2 * jnp.log(std)
               + jnp.log(2 * jnp.pi))
  return lp.sum(-1)


class SACActor(nn.Module):
  """Squashed-Gaussian actor (reference: sacnets.py:31-70)."""
  act_dim: int
  state_key: str
  goal_key: str
  state_size: int
  hidden_size: int = 128

  @nn.compact
  def __call__(self, obs, key=None, deterministic=False):
    gp = nn.Dense(self.state_size, name='goal_preproc')
    x = jnp.concatenate([obs[self.state_key], gp(obs[self.goal_key])], -1)
    h = nn.relu(nn.Dense(self.hidden_size)(x))
    h = nn.relu(nn.Dense(self.hidden_size)(h))
    mu = nn.Dense(self.act_dim)(h)
    log_std = jnp.clip(nn.Dense(self.act_dim)(h), LOG_STD_MIN, LOG_STD_MAX)
    std = jnp.exp(log_std)
    if deterministic or key is None:
      pre = mu
    else:
      pre = mu + std * jax.random.normal(key, mu.shape)
    logp = gaussian_logp(mu, std, pre)
    # tanh correction (SAC paper appendix)
    logp = logp - (2 * (jnp.log(2.0) - pre
                        - jax.nn.softplus(-2 * pre))).sum(-1)
    return jnp.tanh(pre), logp


class SACQ(nn.Module):
  state_key: str
  goal_key: str
  state_size: int
  hidden_size: int = 128

  @nn.compact
  def __call__(self, obs, act):
    gp = nn.Dense(self.state_size, name='goal_preproc')
    x = jnp.concatenate([obs[self.state_key], gp(obs[self.goal_key]), act], -1)
    return BaseMLP(1, self.hidden_size)(x)[..., 0]


class SACNets(nn.Module):
  act_dim: int
  state_key: str
  goal_key: str
  state_size: int
  hidden_size: int = 128

  def setup(self):
    self.pi = SACActor(self.act_dim, self.state_key, self.goal_key,
                       self.state_size, self.hidden_size)
    self.q1 = SACQ(self.state_key, self.goal_key, self.state_size,
                   self.hidden_size)
    self.q2 = SACQ(self.state_key, self.goal_key, self.state_size,
                   self.hidden_size)

  def __call__(self, obs, act, key):
    a, logp = self.pi(obs, key)
    return a, logp, self.q1(obs, act), self.q2(obs, act)

  def actor(self, obs, key=None, deterministic=False):
    return self.pi(obs, key, deterministic)

  def qs(self, obs, act):
    return self.q1(obs, act), self.q2(obs, act)

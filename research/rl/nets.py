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


class ImgCNN(nn.Module):
  """Conv trunk over a single-channel frame (reference: sacnets.py:31-58)."""
  nfilter: int

  @nn.compact
  def __call__(self, img):
    x = img[..., None]
    x = nn.relu(nn.Conv(self.nfilter, (3, 3), (2, 2))(x))
    x = nn.relu(nn.Conv(self.nfilter, (3, 3), (2, 2))(x))
    x = nn.Conv(self.nfilter, (3, 3), (2, 2))(x)
    return x.reshape(*x.shape[:-3], -1)


class ImgMLP(nn.Module):
  """MLP trunk over a flattened frame (reference: sacnets.py:73-98 BaseCMLP)."""
  hidden_size: int

  @nn.compact
  def __call__(self, img):
    x = img.reshape(*img.shape[:-2], -1)
    x = nn.relu(nn.Dense(self.hidden_size)(x))
    x = nn.relu(nn.Dense(self.hidden_size)(x))
    return nn.Dense(self.hidden_size)(x)


class SACFeatures(nn.Module):
  """obs -> features per `net` variant (reference: sacnets.py:31-127).

  'mlp'  — compact state + goal vector;
  'cmlp' — per-frame MLP over lcd and goal:lcd, goal-delta (g - s) features;
  'cnn'  — conv trunk over lcd and goal:lcd, goal-delta features, plus the
           compact goal and proprio (reference: sacnets.py:63-71);
  'bvae' — frozen-encoder zstate from PreprocVecEnv + compact goal
           (reference: sacnets.py:141-152, working PreprocVecEnv pattern).
  """
  net: str
  state_key: str
  goal_key: str
  hidden_size: int
  nfilter: int = 64
  zdelta: bool = True

  @nn.compact
  def __call__(self, obs):
    if self.net == 'mlp':
      return jnp.concatenate([obs[self.state_key], obs[self.goal_key]], -1)
    if self.net == 'cmlp':
      trunk = ImgMLP(self.hidden_size)
      s, g = trunk(obs['lcd']), trunk(obs['goal:lcd'])
      x = g - s if self.zdelta else jnp.concatenate([s, g], -1)
      return nn.Dense(self.hidden_size)(x)
    if self.net == 'cnn':
      trunk = ImgCNN(self.nfilter)
      s, g = trunk(obs['lcd']), trunk(obs['goal:lcd'])
      x = g - s if self.zdelta else jnp.concatenate([s, g], -1)
      x = jnp.concatenate([x, obs[self.goal_key], obs[self.state_key]], -1)
      h = nn.relu(nn.Dense(self.hidden_size)(x))
      h = nn.relu(nn.Dense(self.hidden_size)(h))
      return nn.Dense(self.hidden_size)(h)
    if self.net == 'bvae':
      x = nn.Dense(self.hidden_size)(obs['zstate'])
      return jnp.concatenate([x, obs[self.goal_key]], -1)
    raise ValueError(f'unknown SAC net variant: {self.net}')


class SACActor(nn.Module):
  """Squashed-Gaussian actor (reference: sacnets.py:160-234)."""
  act_dim: int
  state_key: str
  goal_key: str
  state_size: int
  hidden_size: int = 128
  net: str = 'mlp'
  nfilter: int = 64
  zdelta: bool = True

  @nn.compact
  def __call__(self, obs, key=None, deterministic=False):
    feats = SACFeatures(self.net, self.state_key, self.goal_key,
                        self.hidden_size, self.nfilter, self.zdelta)(obs)
    if self.net == 'mlp':
      h = nn.relu(nn.Dense(self.hidden_size)(feats))
      h = nn.relu(nn.Dense(self.hidden_size)(h))
    else:
      h = nn.relu(nn.Dense(self.hidden_size)(feats))
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
  """Twin-Q head (reference: sacnets.py:115-158)."""
  state_key: str
  goal_key: str
  state_size: int
  hidden_size: int = 128
  net: str = 'mlp'
  nfilter: int = 64
  zdelta: bool = True

  @nn.compact
  def __call__(self, obs, act):
    feats = SACFeatures(self.net, self.state_key, self.goal_key,
                        self.hidden_size, self.nfilter, self.zdelta)(obs)
    if self.net == 'mlp':
      x = jnp.concatenate([feats, act], -1)
      return BaseMLP(1, self.hidden_size)(x)[..., 0]
    xa = nn.Dense(self.hidden_size)(act)
    x = jnp.concatenate([feats, xa], -1)
    h = nn.relu(nn.Dense(self.hidden_size)(x))
    return nn.Dense(1)(h)[..., 0]


class SACNets(nn.Module):
  act_dim: int
  state_key: str
  goal_key: str
  state_size: int
  hidden_size: int = 128
  net: str = 'mlp'
  nfilter: int = 64
  zdelta: bool = True

  def setup(self):
    kw = dict(hidden_size=self.hidden_size, net=self.net,
              nfilter=self.nfilter, zdelta=self.zdelta)
    self.pi = SACActor(self.act_dim, self.state_key, self.goal_key,
                       self.state_size, **kw)
    self.q1 = SACQ(self.state_key, self.goal_key, self.state_size, **kw)
    self.q2 = SACQ(self.state_key, self.goal_key, self.state_size, **kw)

  def __call__(self, obs, act, key):
    a, logp = self.pi(obs, key)
    return a, logp, self.q1(obs, act), self.q2(obs, act)

  def actor(self, obs, key=None, deterministic=False):
    return self.pi(obs, key, deterministic)

  def qs(self, obs, act):
    return self.q1(obs, act), self.q2(obs, act)

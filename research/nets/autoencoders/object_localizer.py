"""ObjectLocalizer: supervised image -> object (x, y) regressor; the learned
reward net for CubeGoal in the learned env (reference:
research/nets/autoencoders/object_localizer.py)."""
from __future__ import annotations

import pickle
from pathlib import Path

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from boxlcd_tpu import utils
from research.nets import dists
from research.nets.autoencoders._base import SingleStepAE
from research.nets.autoencoders.encoders import ConvTrunk, StateEmbed


class ObjLocModule(nn.Module):
  hidden_size: int
  nfilter: int

  def setup(self):
    self.state_embed = StateEmbed(self.hidden_size)
    self.trunk = ConvTrunk(self.hidden_size, self.nfilter, self.hidden_size)
    self.head1 = nn.Dense(self.hidden_size)
    self.head2 = nn.Dense(4)  # mean(2) + log_std(2)

  def __call__(self, lcd, proprio):
    emb = self.state_embed(proprio)
    x = self.trunk(lcd[..., None], emb)
    x = self.head2(nn.relu(self.head1(nn.relu(x))))
    mean, log_std = jnp.split(x, 2, -1)
    return mean, jnp.exp(log_std)


class ObjectLocalizer(SingleStepAE):
  def __init__(self, env, G):
    super().__init__(env, G)
    self.keys = utils.filtlist(env.obs_keys, 'object.*(x|y):p')
    self.idxs = np.array([env.obs_keys.index(x) for x in self.keys])
    self.module = ObjLocModule(G.hidden_size, G.nfilter)
    self._init()

  def init_params(self, key):
    lcd = jnp.zeros((1, self.G.lcd_base, int(self.G.lcd_base * self.G.wh_ratio)))
    return self.module.init(key, lcd, jnp.zeros((1, self.proprio_n)))

  def loss_fn(self, params, batch, rng):
    flat = self.prep(batch)
    mean, std = self.module.apply(params, flat['lcd'], flat['proprio'])
    target = flat['full_state'][..., self.idxs]
    loss = -dists.Normal(mean, std, independent=False).log_prob(target).mean()
    return loss, {'loss': loss}

  def localize(self, params, lcd, proprio):
    mean, _ = self.module.apply(params, lcd, proprio)
    return mean

  def encode(self, params, batch, noise=False, key=None, flatten=True):
    return self.localize(params, batch['lcd'], batch['proprio'])

  def decode(self, params, z):
    raise NotImplementedError('ObjectLocalizer is not generative')

  def sample_z(self, key, n):
    raise NotImplementedError

  def evaluate(self, writer, batch, itr, arbiter=None):
    return {}

  def save_frozen(self, direc):
    direc = Path(direc)
    direc.mkdir(parents=True, exist_ok=True)
    path = direc / f'{self.name}.frozen.pkl'
    blob = {'params': flax.serialization.to_bytes(self.params),
            'G': dict(self.G), 'kind': 'ObjectLocalizer'}
    with open(path, 'wb') as f:
      pickle.dump(blob, f)
    print('SAVED FROZEN OBJECT LOCALIZER', path)

"""ArbiterAE: plain autoencoder whose frozen encoder is the FID feature net
(reference: research/nets/autoencoders/arbiter.py). Instead of a TorchScript
trace, we save encoder params + a pure apply fn spec (see save())."""
from __future__ import annotations

import pickle
from pathlib import Path

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp

from research.nets import dists
from research.nets.autoencoders._base import SingleStepAE
from research.nets.autoencoders.encoders import (ConvTrunk, DeconvTrunk,
                                                 StateEmbed, StateHead)


class ArbiterModule(nn.Module):
  hidden_size: int
  nfilter: int
  z_size: int
  proprio_n: int
  wh_ratio: float

  def setup(self):
    self.state_embed = StateEmbed(self.hidden_size)
    self.trunk = ConvTrunk(self.hidden_size, self.nfilter, self.z_size)
    self.deconv = DeconvTrunk(self.nfilter, self.wh_ratio)
    self.state_head = StateHead(self.hidden_size, self.proprio_n)

  def enc(self, lcd, proprio):
    emb = self.state_embed(proprio)
    return self.trunk(lcd[..., None], emb)

  def dec(self, z):
    return {'lcd': dists.Bernoulli(self.deconv(z)[..., 0]),
            'proprio': dists.Normal(self.state_head(z),
                                    jnp.ones(self.proprio_n))}

  def __call__(self, lcd, proprio):
    return self.dec(self.enc(lcd, proprio))


class ArbiterAE(SingleStepAE):
  def __init__(self, env, G):
    super().__init__(env, G)
    self.z_size = 128
    self.module = ArbiterModule(G.hidden_size, G.nfilter, self.z_size,
                                self.proprio_n, G.wh_ratio)
    self._init()

  def init_params(self, key):
    lcd = jnp.zeros((1, self.G.lcd_base, int(self.G.lcd_base * self.G.wh_ratio)))
    return self.module.init(key, lcd, jnp.zeros((1, self.proprio_n)))

  def loss_fn(self, params, batch, rng):
    flat = self.prep(batch)
    z = self.module.apply(params, flat['lcd'], flat['proprio'], method='enc')
    dec = self.module.apply(params, z, method='dec')
    recon_lcd = -dec['lcd'].log_prob(flat['lcd']).mean()
    recon_proprio = -dec['proprio'].log_prob(flat['proprio']).mean() \
        / self.proprio_n
    loss = recon_lcd + recon_proprio
    return loss, {'loss/recon_total': loss, 'loss/recon_lcd': recon_lcd,
                  'loss/recon_proprio': recon_proprio}

  def encode(self, params, batch, noise=False, key=None, flatten=True):
    return self.module.apply(params, batch['lcd'], batch['proprio'],
                             method='enc')

  def decode(self, params, z):
    return self.module.apply(params, z, method='dec')

  def sample_z(self, key, n):
    return jax.random.normal(key, (n, self.z_size))

  def save(self, direc):
    # reference semantics: saving the arbiter saves the trace (arbiter.py:26)
    super().save(direc)
    self.save_frozen(direc)

  def save_frozen(self, direc):
    """Save the frozen feature extractor (replaces torch.jit.trace at
    arbiter.py:26-31): params + module config, loaded via load_frozen()."""
    direc = Path(direc)
    direc.mkdir(parents=True, exist_ok=True)
    path = direc / f'{self.name}.frozen.pkl'
    blob = {'params': flax.serialization.to_bytes(self.params),
            'G': dict(self.G), 'kind': 'ArbiterAE'}
    with open(path, 'wb') as f:
      pickle.dump(blob, f)
    print('SAVED FROZEN ARBITER', path)

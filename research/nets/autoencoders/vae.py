"""VAE: conv encoder -> Normal(128) -> deconv decoder, beta-KL
(reference: research/nets/autoencoders/vae.py)."""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from research.nets import dists
from research.nets.autoencoders._base import SingleStepAE, flat01
from research.nets.autoencoders.encoders import (ConvTrunk, DeconvTrunk,
                                                 StateEmbed, StateHead)


class VAEModule(nn.Module):
  hidden_size: int
  nfilter: int
  z_size: int
  proprio_n: int
  wh_ratio: float

  def setup(self):
    self.state_embed = StateEmbed(self.hidden_size)
    self.trunk = ConvTrunk(self.hidden_size, self.nfilter, 2 * self.z_size)
    self.deconv = DeconvTrunk(self.nfilter, self.wh_ratio)
    self.state_head = StateHead(self.hidden_size, self.proprio_n)

  def enc(self, lcd, proprio):
    emb = self.state_embed(proprio)
    out = self.trunk(lcd[..., None], emb)
    mu, log_std = jnp.split(out, 2, -1)
    std = jax.nn.softplus(log_std) + 1e-4
    return dists.Normal(mu, std, independent=False)

  def dec(self, z):
    lcd_logits = self.deconv(z)[..., 0]
    state = self.state_head(z)
    return {'lcd': dists.Bernoulli(lcd_logits),
            'proprio': dists.Normal(state, jnp.ones_like(state))}

  def __call__(self, lcd, proprio):
    return self.dec(self.enc(lcd, proprio).mean)


class VAE(SingleStepAE):
  def __init__(self, env, G):
    super().__init__(env, G)
    self.z_size = 128
    self.module = VAEModule(G.hidden_size, G.nfilter, self.z_size,
                            self.proprio_n, G.wh_ratio)
    self._init()

  def init_params(self, key):
    lcd = jnp.zeros((1, self.G.lcd_base, int(self.G.lcd_base * self.G.wh_ratio)))
    return self.module.init(key, lcd, jnp.zeros((1, self.proprio_n)))

  def loss_fn(self, params, batch, rng):
    flat = self.prep(batch)
    post = self.module.apply(params, flat['lcd'], flat['proprio'], method='enc')
    z = post.sample(rng)
    dec = self.module.apply(params, z, method='dec')
    recon_lcd = -dec['lcd'].log_prob(flat['lcd']).mean()
    recon_proprio = -dec['proprio'].log_prob(flat['proprio']).mean() \
        / self.proprio_n
    recon = recon_lcd + recon_proprio
    prior = dists.Normal(jnp.zeros_like(post.mean), jnp.ones_like(post.std),
                         independent=False)
    kl = post.kl(prior).mean()
    loss = recon + self.G.beta * kl
    return loss, {'loss/vae_loss': loss, 'loss/kl': kl,
                  'loss/recon_total': recon, 'loss/recon_lcd': recon_lcd,
                  'loss/recon_proprio': recon_proprio}

  def encode(self, params, batch, noise=False, key=None, flatten=True):
    lcd, proprio = batch['lcd'], batch['proprio']
    shape = lcd.shape
    if lcd.ndim == 4:
      lcd, proprio = flat01(lcd), flat01(proprio)
    post = self.module.apply(params, lcd, proprio, method='enc')
    z = post.sample(key) if noise and key is not None else post.mean
    if len(shape) == 4:
      z = z.reshape(shape[0], shape[1], -1)
    return z

  def decode(self, params, z):
    return self.module.apply(params, z, method='dec')

  def sample_z(self, key, n):
    return jax.random.normal(key, (n, self.z_size))

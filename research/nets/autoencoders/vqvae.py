"""VQ-VAE with a classic codebook (reference:
research/nets/autoencoders/vqvae.py, marked "NOT USED AT THE MOMENT" there;
provided for completeness)."""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from research.nets import dists
from research.nets.quantize import VectorQuantizer
from research.nets.autoencoders._base import SingleStepAE
from research.nets.autoencoders.bvae import Decoder, Encoder


class VQVAEModule(nn.Module):
  hidden_size: int
  nfilter: int
  vqD: int
  vqK: int
  beta: float
  proprio_n: int

  def setup(self):
    self.encoder = Encoder(self.hidden_size, self.nfilter, self.vqD)
    self.vq = VectorQuantizer(self.vqK, self.vqD, self.beta)
    self.decoder = Decoder(self.hidden_size, self.nfilter, self.proprio_n)

  def __call__(self, lcd, proprio):
    z_e = self.encoder(lcd, proprio)
    vq_loss, z_q, perplexity, idx = self.vq(z_e)
    return self.decoder(z_q), vq_loss, perplexity

  def enc(self, lcd, proprio):
    z_e = self.encoder(lcd, proprio)
    _, z_q, _, _ = self.vq(z_e)
    return z_q

  def dec(self, z):
    return self.decoder(z)


class VQVAE(SingleStepAE):
  def __init__(self, env, G):
    super().__init__(env, G)
    self.zH = 4
    self.zW = int(G.wh_ratio * self.zH)
    self.z_size = self.zH * self.zW * G.vqD
    self.module = VQVAEModule(G.hidden_size, G.nfilter, G.vqD, G.vqK,
                              G.beta, self.proprio_n)
    self._init()

  def init_params(self, key):
    lcd = jnp.zeros((1, self.G.lcd_base, int(self.G.lcd_base * self.G.wh_ratio)))
    return self.module.init(key, lcd, jnp.zeros((1, self.proprio_n)))

  def loss_fn(self, params, batch, rng):
    flat = self.prep(batch)
    dec, vq_loss, perplexity = self.module.apply(params, flat['lcd'],
                                                 flat['proprio'])
    recon_lcd = -dec['lcd'].log_prob(flat['lcd']).mean()
    recon_proprio = -dec['proprio'].log_prob(flat['proprio']).mean() \
        / self.proprio_n
    loss = recon_lcd + recon_proprio + vq_loss
    return loss, {'loss/total': loss, 'loss/vq': vq_loss,
                  'loss/recon_lcd': recon_lcd,
                  'loss/recon_proprio': recon_proprio,
                  'perplexity': perplexity}

  def encode(self, params, batch, noise=False, key=None, flatten=True):
    z = self.module.apply(params, batch['lcd'], batch['proprio'], method='enc')
    if flatten:
      z = z.reshape(z.shape[0], -1)
    return z

  def unflatten_z(self, z):
    return z.reshape(-1, self.zH, self.zW, self.G.vqD)

  def decode(self, params, z):
    if z.ndim == 2:
      z = self.unflatten_z(z)
    return self.module.apply(params, z, method='dec')

  def sample_z(self, key, n):
    return jax.random.normal(key, (n, self.zH, self.zW, self.G.vqD))

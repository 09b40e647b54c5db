"""RNLDA: BVAE topology with the 4-level number-line quantizer
(reference: research/nets/autoencoders/rnlda.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from research.nets import dists
from research.nets.quantize import rnld
from research.nets.autoencoders._base import SingleStepAE, flat01
from research.nets.autoencoders.bvae import BVAEModule


class RNLDA(SingleStepAE):
  def __init__(self, env, G):
    super().__init__(env, G)
    self.zH = 4
    self.zW = int(G.wh_ratio * self.zH)
    self.z_size = self.zH * self.zW * G.vqD
    self.module = BVAEModule(G.hidden_size, G.nfilter, G.vqD, self.proprio_n)
    self._init()

  def init_params(self, key):
    lcd = jnp.zeros((1, self.G.lcd_base, int(self.G.lcd_base * self.G.wh_ratio)))
    return self.module.init(key, lcd, jnp.zeros((1, self.proprio_n)))

  def loss_fn(self, params, batch, rng):
    flat = self.prep(batch)
    z_e = self.module.apply(params, flat['lcd'], flat['proprio'], method='enc')
    z_q, idxs = rnld(z_e, rng, noise=True)
    dec = self.module.apply(params, z_q, method='dec')
    recon_lcd = -dec['lcd'].log_prob(flat['lcd']).mean()
    recon_proprio = -dec['proprio'].log_prob(flat['proprio']).mean() \
        / self.proprio_n
    loss = recon_lcd + recon_proprio
    metrics = {'loss/total': loss, 'loss/recon_total': loss,
               'loss/recon_lcd': recon_lcd,
               'loss/recon_proprio': recon_proprio}
    for k in range(4):
      metrics[f'idx{k}_frac'] = (idxs == k).mean()
    return loss, metrics

  def encode(self, params, batch, noise=False, key=None, flatten=True,
             quantize=True):
    lcd, proprio = batch['lcd'], batch['proprio']
    shape = lcd.shape
    if lcd.ndim == 4:
      lcd, proprio = flat01(lcd), flat01(proprio)
    z_e = self.module.apply(params, lcd, proprio, method='enc')
    if quantize:
      key = key if key is not None else jax.random.PRNGKey(0)
      z_e, _ = rnld(z_e, key, noise=noise)
    if flatten:
      z_e = z_e.reshape(z_e.shape[0], -1)
    if len(shape) == 4:
      z_e = z_e.reshape(shape[0], shape[1], *z_e.shape[1:])
    return z_e

  def unflatten_z(self, z):
    return z.reshape(-1, self.zH, self.zW, self.G.vqD)

  def decode(self, params, z):
    if z.ndim == 2:
      z = self.unflatten_z(z)
    return self.module.apply(params, z, method='dec')

  def sample_z(self, key, n):
    """Uniform over the 4 bin centers."""
    idx = jax.random.randint(key, (n, self.zH, self.zW, self.G.vqD), 0, 4)
    return jnp.array([-0.75, -0.25, 0.25, 0.75])[idx]

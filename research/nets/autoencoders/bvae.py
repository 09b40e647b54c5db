"""BVAE: conv encoder -> binary latent -> conv decoder.

The key encoder for the FBT world model (reference:
research/nets/autoencoders/bvae.py). Latent is a (zH, zW, vqD) grid of
straight-through Bernoulli bits; loss is Bernoulli/Gaussian recon minus an
entropy bonus. Layout note: we use NHWC; the flattened z is C-order over
(zH, zW, vqD), a stable contract consumed by FBT.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from research.nets import dists
from research.nets.common import ResBlock, Upsample
from research.nets.quantize import binary_quantize
from research.nets.autoencoders._base import SingleStepAE, flat01


class Encoder(nn.Module):
  """(reference: bvae.py:60-93) proprio-conditioned conv downsampler."""
  hidden_size: int
  nfilter: int
  vqD: int

  @nn.compact
  def __call__(self, lcd, proprio):
    n = self.hidden_size
    emb = proprio
    for _ in range(2):
      emb = nn.relu(nn.Dense(n)(emb))
    emb = nn.Dense(n)(emb)
    nf = self.nfilter
    x = lcd[..., None]                                   # (B, H, W, 1)
    x = nn.Conv(nf, (3, 3), padding='SAME')(x)
    x = ResBlock(nf, n, group_size=4)(x, emb)
    x = nn.Conv(nf, (3, 3), strides=(2, 2), padding='SAME')(x)
    x = ResBlock(nf, n, group_size=4)(x, emb)
    x = nn.Conv(nf, (3, 3), strides=(2, 2), padding='SAME')(x)
    x = ResBlock(nf, n, group_size=4)(x, emb)
    x = nn.Conv(self.vqD, (1, 1))(x)                     # (B, zH, zW, vqD)
    return x


class Decoder(nn.Module):
  """(reference: bvae.py:105-134) latent grid -> lcd Bernoulli + proprio Normal."""
  hidden_size: int
  nfilter: int
  proprio_n: int

  @nn.compact
  def __call__(self, z):
    n = self.hidden_size
    h = z.reshape(z.shape[0], -1)
    for _ in range(2):
      h = nn.relu(nn.Dense(n)(h))
    state = nn.Dense(self.proprio_n)(h)
    nf = self.nfilter
    x = Upsample(nf)(z)
    x = nn.relu(x)
    x = Upsample(nf)(x)
    x = nn.relu(x)
    x = nn.Conv(nf, (3, 3), padding='SAME')(x)
    x = nn.relu(x)
    x = nn.Conv(1, (3, 3), padding='SAME')(x)            # (B, H, W, 1)
    return {'lcd': dists.Bernoulli(x[..., 0]),
            'proprio': dists.Normal(state, jnp.ones_like(state))}


class BVAEModule(nn.Module):
  hidden_size: int
  nfilter: int
  vqD: int
  proprio_n: int

  def setup(self):
    self.encoder = Encoder(self.hidden_size, self.nfilter, self.vqD)
    self.decoder = Decoder(self.hidden_size, self.nfilter, self.proprio_n)

  def __call__(self, lcd, proprio):  # for init
    z_e = self.encoder(lcd, proprio)
    return self.decoder(jax.nn.sigmoid(z_e))

  def enc(self, lcd, proprio):
    return self.encoder(lcd, proprio)

  def dec(self, z):
    return self.decoder(z)


class BVAE(SingleStepAE):
  def __init__(self, env, G):
    super().__init__(env, G)
    self.zH = 4
    self.zW = int(G.wh_ratio * self.zH)
    self.z_size = self.zH * self.zW * G.vqD
    self.module = BVAEModule(G.hidden_size, G.nfilter, G.vqD, self.proprio_n)
    self._init()

  def init_params(self, key):
    lcd = jnp.zeros((1, self.G.lcd_base, int(self.G.lcd_base * self.G.wh_ratio)))
    proprio = jnp.zeros((1, self.proprio_n))
    return self.module.init(key, lcd, proprio)

  def loss_fn(self, params, batch, rng):
    """(reference: bvae.py:27-39)."""
    flat = self.prep(batch)
    z_e = self.module.apply(params, flat['lcd'], flat['proprio'], method='enc')
    z_q, entropy, probs = binary_quantize(z_e, rng, noise=True)
    dec = self.module.apply(params, z_q, method='dec')
    recon_lcd = -dec['lcd'].log_prob(flat['lcd']).mean()
    recon_proprio = -dec['proprio'].log_prob(flat['proprio']).mean() \
        / self.proprio_n  # elementwise mean as in the reference
    recon = recon_lcd + recon_proprio
    loss = recon - self.G.entropy_bonus * entropy
    return loss, {'loss/total': loss, 'loss/entropy': entropy,
                  'loss/recon_lcd': recon_lcd,
                  'loss/recon_proprio': recon_proprio,
                  'loss/recon_total': recon,
                  'bvae_abs_probs': jnp.abs(probs - 0.5).mean()}

  # -- AE surface ---------------------------------------------------------------
  def encode(self, params, batch, noise=False, key=None, flatten=True):
    """batch lcd (B,H,W) or (B,T,H,W) -> binary z (reference: bvae.py:41-54)."""
    lcd, proprio = batch['lcd'], batch['proprio']
    shape = lcd.shape
    if lcd.ndim == 4:
      lcd, proprio = flat01(lcd), flat01(proprio)
    z_e = self.module.apply(params, lcd, proprio, method='enc')
    key = key if key is not None else jax.random.PRNGKey(0)
    z_q, _, _ = binary_quantize(z_e, key, noise=noise)
    if flatten:
      z_q = z_q.reshape(z_q.shape[0], -1)
    if len(shape) == 4:
      z_q = z_q.reshape(shape[0], shape[1], *z_q.shape[1:])
    return z_q

  def unflatten_z(self, z):
    return z.reshape(-1, self.zH, self.zW, self.G.vqD)

  def decode(self, params, z):
    if z.ndim == 2:
      z = self.unflatten_z(z)
    return self.module.apply(params, z, method='dec')

  def sample_z(self, key, n):
    return (jax.random.uniform(key, (n, self.zH, self.zW, self.G.vqD))
            < 0.5).astype(jnp.float32)

"""Autoencoder base: encode/decode contract + shared evaluation.

Re-architecture of reference research/nets/autoencoders/_base.py: the same
encode / decode_mode / decode_dist / sample surface, with evaluation that
re-renders proprio predictions through the env's batched teleport+raster
(on-device, replacing the reference's AsyncVectorEnv re-render round-trip at
autoencoders/_base.py:63-82).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from boxlcd_tpu.envs.env import Env
from research import metrics as M
from research.nets._base import Net


def flat01(x):
  """(B, T, ...) -> (B*T, ...)."""
  return x.reshape(-1, *x.shape[2:])


class Autoencoder(Net):
  """Subclasses define: init_params, loss_fn, encode(params, batch, noise),
  decode(params, z) -> {'lcd': dist, 'proprio': dist}, sample_z(key, n)."""

  def __init__(self, env, G):
    super().__init__(env, G)
    self.proprio_n = max(1, env.pobs_size)

  def decode_mode(self, params, z):
    dec = self.decode(params, z)
    return {'lcd': dec['lcd'].mode, 'proprio': dec['proprio'].mean}

  def sample(self, key, n):
    k1, k2 = jax.random.split(key)
    z = self.sample_z(k1, n)
    return self.decode_mode(self.params, z)

  def evaluate(self, writer, batch, itr, arbiter=None):
    """Prompted recon metrics + sample grids (reference: _base.py:51-132)."""
    metrics = {}
    flat = {k: flat01(v) for k, v in batch.items() if k != 'action'}
    z = self.encode(self.params, flat, noise=False)
    recon = self.decode_mode(self.params, z)
    lcd_t = flat['lcd'][:, None] if flat['lcd'].ndim == 3 else flat['lcd']
    lcd_p = recon['lcd'].reshape(lcd_t.shape)
    metrics['eval/lcd_ssim'] = M.ssim(lcd_p, lcd_t)
    metrics['eval/lcd_psnr'] = M.psnr(lcd_p, lcd_t)
    pt, pp = flat['proprio'], recon['proprio']
    metrics['eval/proprio_log_mse'] = jnp.log(((pt - pp) ** 2).mean())
    cos = (pt * pp).sum(-1) / (
        jnp.linalg.norm(pt, axis=-1) * jnp.linalg.norm(pp, axis=-1) + 1e-8)
    metrics['eval/proprio_cosdist'] = 1 - cos.mean()
    if writer is not None:
      img_t = np.asarray(lcd_t[:8, 0])
      img_p = np.asarray(lcd_p[:8, 0])
      grid = np.concatenate([img_t, img_p], axis=1)  # truth over recon
      writer.add_image('eval/recon', grid.reshape(1, -1, grid.shape[-1]), itr)
    return {k: float(v) for k, v in metrics.items()}


class SingleStepAE(Autoencoder):
  """Flattens the time axis into batch before the loss (reference: :134-146)."""

  def prep(self, batch):
    return {k: flat01(v) for k, v in batch.items() if k != 'action'}


class MultiStepAE(Autoencoder):
  """Keeps (B, window, ...) batches (reference: :141-195)."""

  def prep(self, batch):
    return batch

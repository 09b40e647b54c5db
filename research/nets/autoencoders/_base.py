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

  def _re_render_proprio(self, proprio):
    """Teleport the env to proprio and rasterize on device — replaces the
    reference's env.reset(proprio=...) round-trips (_base.py:63-82)."""
    key = jax.random.PRNGKey(0)

    def rr(p):
      st = Env.teleport(self.env, key, proprio=p)
      return Env.observe(self.env, st)['lcd']

    return jax.jit(jax.vmap(rr))(proprio.reshape(-1, proprio.shape[-1]))

  def evaluate(self, writer, batch, itr, arbiter=None):
    """Unprompted (sample + arbiter FID) and prompted (recon metrics,
    feature cosdist, proprio re-render plots) — reference _base.py:44-132."""
    metrics = {}
    flat = self.prep({k: v for k, v in batch.items() if k != 'action'})
    # --- prompted: encode/decode the batch
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
    # --- unprompted: sample from the prior
    n = flat['lcd'].shape[0]
    sample = self.sample(self._rng(), n)
    single = arbiter is not None and arbiter.get('kind') == 'ArbiterAE'
    if single:
      sq = lambda x: x[:, 0] if (x.ndim == 4 and x.shape[1] == 1) else x
      saz, _ = arbiter['fn'](arbiter['params'],
                             {'lcd': sq(sample['lcd']),
                              'proprio': sample['proprio']})
      taz, _ = arbiter['fn'](arbiter['params'],
                             {'lcd': sq(lcd_t), 'proprio': pt})
      metrics['eval/fid'] = M.fid(np.asarray(saz), np.asarray(taz))
      paz, _ = arbiter['fn'](arbiter['params'],
                             {'lcd': sq(lcd_p), 'proprio': pp})
      fcos = (paz * taz).sum(-1) / (
          jnp.linalg.norm(paz, axis=-1) * jnp.linalg.norm(taz, axis=-1) + 1e-8)
      metrics['eval/cosdist'] = (1 - fcos).mean()
    if writer is not None:
      k = min(8, lcd_t.shape[0])
      img_t = np.asarray(lcd_t[:k, 0])
      img_p = np.asarray(lcd_p[:k, 0])
      err = (img_p - img_t + 1.0) / 2.0
      grid = np.concatenate([img_t, img_p, err], axis=1)  # truth/recon/error
      writer.add_image('eval/recon_lcd',
                       grid.transpose(1, 0, 2).reshape(1, grid.shape[1], -1),
                       itr)
      # proprio re-render plots (reference: _base.py:63-82)
      rr_p = np.asarray(self._re_render_proprio(pp[:k]), np.float32)
      rr_t = np.asarray(self._re_render_proprio(pt[:k]), np.float32)
      rerr = (rr_p - rr_t + 1.0) / 2.0
      rgrid = np.concatenate([rr_t, rr_p, rerr], axis=1)
      writer.add_image('eval/recon_proprio',
                       rgrid.transpose(1, 0, 2).reshape(1, rgrid.shape[1], -1),
                       itr)
      simg = np.asarray(sample['lcd'][:k])
      simg = simg[:, 0] if simg.ndim == 4 else simg
      writer.add_image('eval/sample_lcd',
                       simg.transpose(1, 0, 2).reshape(1, simg.shape[1], -1),
                       itr)
    return {k: float(v) for k, v in metrics.items()}


class SingleStepAE(Autoencoder):
  """Flattens the time axis into batch before the loss (reference: :134-146)."""

  def prep(self, batch):
    return {k: flat01(v) for k, v in batch.items() if k != 'action'}


class MultiStepAE(Autoencoder):
  """Keeps (B, window, ...) batches (reference: :141-195)."""

  def prep(self, batch):
    return batch

"""VideoModel base: sampling + arbiter-based evaluation.

Re-architecture of reference research/nets/video_models/_base.py: the same
unprompted / prompted evaluation protocol (arbiter FVD, precision/recall,
SSIM/PSNR, proprio log-MSE), with the proprio re-render going through the
env's batched on-device teleport+raster instead of an AsyncVectorEnv
(reference: _base.py:190-228).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from boxlcd_tpu.envs.env import Env
from research import metrics as M
from research.nets._base import Net


class VideoModel(Net):
  def __init__(self, env, G):
    super().__init__(env, G)
    self.env = env
    self.act_n = env.act_size
    self.proprio_n = max(1, env.pobs_size)
    self.block_size = G.window

  # subclass contract: sample(key, n, action=None, prompts=None, prompt_n=10,
  #                           temp=1.0) -> {'lcd': (n,T,H,W), 'proprio': ...}
  # and onestep(params, batch, i, key, temp) for learned-env serving.

  def _arbiter_feats(self, arbiter, batch):
    """Features for FVD/precision-recall via the frozen temporal arbiter."""
    if arbiter is None:
      return None
    z, act_pred = arbiter['fn'](arbiter['params'],
                                {'lcd': batch['lcd'],
                                 'proprio': batch['proprio']})
    return z, act_pred

  def _re_render_proprio(self, proprio):
    """Teleport the env to predicted proprio and rasterize (on-device)."""
    B, T = proprio.shape[:2]
    flat = proprio.reshape(B * T, -1)
    key = jax.random.PRNGKey(0)

    def rerender(p):
      st = Env.teleport(self.env, key, proprio=p)
      return Env.observe(self.env, st)['lcd']

    lcd = jax.jit(jax.vmap(rerender))(flat)
    return lcd.reshape(B, T, *lcd.shape[1:])

  def evaluate(self, writer, batch, itr, arbiter=None):
    metrics = {}
    n = min(self.G.video_n, batch['lcd'].shape[0])
    prompt_n = self.G.prompt_n
    key = self._rng()
    # --- unprompted (reference: _base.py:40-82)
    sample = self.sample(key, n)
    if arbiter is not None:
      paz, paa = self._arbiter_feats(arbiter, sample)
      taz, _ = self._arbiter_feats(
          arbiter, {k: v[:n] for k, v in batch.items()})
      metrics['eval/unprompted_fvd'] = float(M.fid(np.asarray(paz),
                                                   np.asarray(taz)))
      pr = M.precision_recall_f1(np.asarray(taz), np.asarray(paz))
      for k, v in pr.items():
        metrics[f'eval/unprompted_{k}'] = float(v)
    # --- prompted (reference: _base.py:97-157)
    prompts = {k: v[:n] for k, v in batch.items() if k != 'action'}
    action = batch['action'][:n, :self.block_size]
    psample = self.sample(key, n, action=action, prompts=prompts,
                          prompt_n=prompt_n)
    lcd_t = batch['lcd'][:n, :self.block_size]
    lcd_p = psample['lcd'].reshape(lcd_t.shape)
    metrics['eval/prompted_lcd_ssim'] = float(M.ssim(lcd_p, lcd_t))
    metrics['eval/prompted_lcd_psnr'] = float(M.psnr(lcd_p, lcd_t))
    pt = batch['proprio'][:n, :self.block_size]
    pp = psample['proprio']
    metrics['eval/prompted_proprio_log_mse'] = float(
        jnp.log(((pt - pp) ** 2).mean()))
    if writer is not None:
      # stitched truth/pred video strips with the prompt boundary marked
      img_t = np.asarray(lcd_t[0])
      img_p = np.asarray(lcd_p[0])
      strip = np.concatenate([
          np.concatenate(list(img_t[:16]), axis=1),
          np.concatenate(list(img_p[:16]), axis=1)], axis=0)
      writer.add_image('eval/prompted_strip', strip[None], itr)
    return metrics

"""VideoModel base: sampling + arbiter-based evaluation.

Re-architecture of reference research/nets/video_models/_base.py: the same
unprompted / prompted evaluation protocol (arbiter FVD, precision/recall,
action log-MSE, SSIM/PSNR, proprio log-MSE, feature cosdist) with
green/red prompt-boundary annotated videos, and the proprio re-render going
through the env's batched on-device teleport+raster instead of an
AsyncVectorEnv (reference: _base.py:190-228).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from boxlcd_tpu.envs.env import Env
from research import metrics as M
from research import utils
from research.nets._base import Net

GREEN = np.array([0.0, 1.0, 0.0])
RED = np.array([1.0, 0.0, 0.0])


def chop(x, window):
  """Non-overlapping window chop along time (reference: evaler.py:56-62)."""
  rem = x.shape[1] % window
  if rem:
    x = x[:, :-rem]
  return x.reshape(-1, window, *x.shape[2:])


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

  def _arbiter_feats(self, arbiter, batch, actions=None):
    """(feats, action_log_mse) via the frozen temporal arbiter, window-chopped.

    Mirrors reference evaler.py:149-198: chop the clip to the arbiter's
    window, encode, and score the arbiter's action predictions against the
    actions actually used (one action per transition: acts[:, :-1]).
    """
    aw = arbiter.get('window') or batch['lcd'].shape[1]
    clip = {'lcd': chop(batch['lcd'], aw), 'proprio': chop(batch['proprio'], aw)}
    z, act_pred = arbiter['fn'](arbiter['params'], clip)
    almse = None
    if actions is not None:
      act = chop(actions, aw)[:, :-1]
      almse = float(jnp.log(((act - act_pred) ** 2).mean()))
    return z, almse

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

  def _annot_video(self, pred, truth=None, prompt_n=None):
    """(B,T,3,H,W') float video: truth | pred | error side by side, with the
    prompt boundary marked green/red (reference: _base.py:159-188)."""
    pred = np.asarray(pred, np.float32)
    if truth is not None:
      truth = np.asarray(truth, np.float32)
      err = (pred - truth + 1.0) / 2.0
      bar = np.zeros_like(pred[..., :1])
      out = np.concatenate([truth, bar, pred, bar, err], axis=-1)
    else:
      out = pred
    out = out[:, :, None].repeat(3, 2)  # (B, T, 3, H, W')
    if prompt_n is not None:
      out[:, :prompt_n, :, :, 0] = GREEN[None, None, :, None]
      out[:, prompt_n:, :, :, 0] = RED[None, None, :, None]
      out[:, :prompt_n, :, 0, :] = GREEN[None, None, :, None]
      out[:, prompt_n:, :, 0, :] = RED[None, None, :, None]
    return out

  def evaluate(self, writer, batch, itr, arbiter=None):
    metrics = {}
    n = min(self.G.video_n, batch['lcd'].shape[0])
    prompt_n = self.G.prompt_n
    key = self._rng()
    T = self.block_size
    # --- unprompted, random actions (reference: _base.py:40-82, evaler:147-161)
    k1, k2 = jax.random.split(key)
    rand_act = jax.random.uniform(k1, (n, T, self.act_n), minval=-1., maxval=1.)
    sample = self.sample(k2, n, action=rand_act)
    burned = {k: v[:, prompt_n:] for k, v in sample.items()
              if k in ('lcd', 'proprio')}
    if arbiter is not None:
      paz, almse = self._arbiter_feats(arbiter, burned,
                                       rand_act[:, prompt_n:])
      tb = {k: v[:n, :T][:, prompt_n:] for k, v in batch.items()}
      taz, _ = self._arbiter_feats(arbiter, tb)
      metrics['eval/unprompted_fvd'] = float(M.fid(np.asarray(paz),
                                                   np.asarray(taz)))
      if almse is not None:
        metrics['eval/unprompted_action_log_mse'] = almse
      pr = M.precision_recall_f1(np.asarray(taz), np.asarray(paz))
      for k, v in pr.items():
        metrics[f'eval/unprompted_{k}'] = float(v)
    # --- prompted (reference: _base.py:97-157)
    prompts = {k: v[:n] for k, v in batch.items() if k != 'action'}
    action = batch['action'][:n, :T]
    psample = self.sample(key, n, action=action, prompts=prompts,
                          prompt_n=prompt_n)
    lcd_t = batch['lcd'][:n, :T]
    lcd_p = psample['lcd'].reshape(lcd_t.shape)
    metrics['eval/prompted_lcd_ssim'] = float(
        M.ssim(lcd_p[:, prompt_n:], lcd_t[:, prompt_n:]))
    metrics['eval/prompted_lcd_psnr'] = float(
        M.psnr(lcd_p[:, prompt_n:], lcd_t[:, prompt_n:]))
    pt = batch['proprio'][:n, :T]
    pp = psample['proprio']
    if self.env.pobs_size:  # passive envs have no proprio
      metrics['eval/prompted_proprio_log_mse'] = float(
          jnp.log(((pt[:, prompt_n:] - pp[:, prompt_n:]) ** 2).mean()))
    if arbiter is not None:
      pburn = {k: v[:, prompt_n:] for k, v in
               {'lcd': lcd_p, 'proprio': pp}.items()}
      paz, almse = self._arbiter_feats(arbiter, pburn,
                                       action[:, prompt_n:])
      tburn = {'lcd': lcd_t[:, prompt_n:], 'proprio': pt[:, prompt_n:]}
      taz, talmse = self._arbiter_feats(arbiter, tburn,
                                        action[:, prompt_n:])
      if almse is not None:
        metrics['eval/prompted_action_log_mse'] = almse
        metrics['eval/prompted_true_action_log_mse'] = talmse
      cos = (paz * taz).sum(-1) / (jnp.linalg.norm(paz, axis=-1)
                                   * jnp.linalg.norm(taz, axis=-1) + 1e-8)
      metrics['eval/prompted_cosdist'] = float((1 - cos).mean())
    if writer is not None:
      utils.add_video(writer, 'eval/unprompted_lcd',
                      self._annot_video(np.asarray(sample['lcd'])), itr,
                      fps=self.G.fps)
      utils.add_video(writer, 'eval/prompted_lcd',
                      self._annot_video(np.asarray(lcd_p), np.asarray(lcd_t),
                                        prompt_n=prompt_n), itr,
                      fps=self.G.fps)
      # re-render predicted proprio through the env (reference: _base.py:190-228)
      pl = self._re_render_proprio(pp)
      tl = self._re_render_proprio(pt)
      utils.add_video(writer, 'eval/prompted_proprio',
                      self._annot_video(np.asarray(pl), np.asarray(tl),
                                        prompt_n=prompt_n), itr,
                      fps=self.G.fps)
    return metrics

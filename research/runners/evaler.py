"""Evaler: offline model evaluation (reference: research/runners/evaler.py).

Loads weights fresh, runs unprompted + prompted sampling over the test (and
train) set, computes arbiter-FVD / precision-recall / SSIM / PSNR / proprio
log-MSE, aggregates mean±std over reps, and pickles the results table that
scripts/evaluations consume (reference: evaler.py:83-86).
"""
from __future__ import annotations

import pickle
from collections import defaultdict
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from research import metrics as M
from research import utils
from boxlcd_tpu.data import load_ds
from research.runners.trainer import load_arbiter


class Evaler:
  def __init__(self, model, env, G):
    self.env = env
    self.G = G
    if model is None:
      from research.nets import net_map
      from research.nets._base import Net
      mG = Net.load_config(G.weightdir, G.model)
      # keep the checkpoint's own weightdir: composite models (FBT/FRNLD)
      # use it to locate their frozen encoder (reference: evaler.py:34-41)
      mG.update(logdir=G.logdir, arbiterdir=G.arbiterdir, datadir=G.datadir)
      model = net_map[G.model](env, mG)
      model.load(G.weightdir)
    self.model = model
    self.arbiter = load_arbiter(G, env)
    self.train_ds, self.test_ds = load_ds(G)

  def _window(self, batch):
    w = self.model.block_size
    return {k: jnp.asarray(v[:, :w]) for k, v in batch.items()}

  def do_ds(self, ds, reps=5):
    agg = defaultdict(list)
    it = iter(ds)
    for rep in range(reps):
      batch = self._window(next(it))
      key = jax.random.PRNGKey(rep)
      n = min(self.G.video_n, batch['lcd'].shape[0])
      # unprompted
      sample = self.model.sample(key, n)
      if self.arbiter is not None:
        paz, _ = self.arbiter['fn'](self.arbiter['params'],
                                    {'lcd': sample['lcd'],
                                     'proprio': sample['proprio']})
        taz, _ = self.arbiter['fn'](self.arbiter['params'],
                                    {'lcd': batch['lcd'][:n],
                                     'proprio': batch['proprio'][:n]})
        agg['fvd'].append(float(M.fid(np.asarray(paz), np.asarray(taz))))
        pr = M.precision_recall_f1(np.asarray(taz), np.asarray(paz))
        for k, v in pr.items():
          agg[k].append(float(v))
      # prompted
      prompts = {k: v[:n] for k, v in batch.items() if k != 'action'}
      psample = self.model.sample(key, n, action=batch['action'][:n],
                                  prompts=prompts, prompt_n=self.G.prompt_n)
      lcd_t = batch['lcd'][:n]
      lcd_p = psample['lcd'].reshape(lcd_t.shape)
      agg['ssim'].append(float(M.ssim(lcd_p, lcd_t)))
      agg['psnr'].append(float(M.psnr(lcd_p, lcd_t)))
      pt, pp = batch['proprio'][:n], psample['proprio']
      agg['proprio_log_mse'].append(float(jnp.log(((pt - pp) ** 2).mean())))
      cos = (pt * pp).sum(-1) / (jnp.linalg.norm(pt, axis=-1)
                                 * jnp.linalg.norm(pp, axis=-1) + 1e-8)
      agg['cosdist'].append(float((1 - cos).mean()))
    return {k: (float(np.mean(v)), float(np.std(v))) for k, v in agg.items()}

  def run(self):
    results = {'test': self.do_ds(self.test_ds),
               'train': self.do_ds(self.train_ds)}
    logdir = Path(self.G.logdir)
    logdir.mkdir(parents=True, exist_ok=True)
    with open(logdir / 'logger.pkl', 'wb') as f:
      pickle.dump(results, f)
    for split, table in results.items():
      print(f'== {split}')
      for k, (m, s) in table.items():
        print(f'{k:24s} {m:.4f} ± {s:.4f}')
    return results

"""Evaler: offline model evaluation (reference: research/runners/evaler.py).

Loads weights fresh, then for 5 reps over test and train sets runs:
  unprompted — sample with random actions, burn the prompt, chop to the
    arbiter window, collect features + arbiter action log-MSE;
  prompted  — sample with batch prompts/actions, burn the prompt, compute
    SSIM/PSNR/proprio log-MSE, arbiter action log-MSE (+ the true-clip
    baseline), feature cosdist;
then aggregates FVD / precision / recall / F1 over the collected features
(reference: evaler.py:137-145) and pickles {'<split>:<u|p>:<metric>':
(mean, std)} into logdir/logger.pkl — the exact table
scripts/evaluations/script.py consumes (reference: scripts/script.py:6-51).
"""
from __future__ import annotations

import pickle
from collections import defaultdict
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from research import metrics as M
from boxlcd_tpu.data import load_ds
from research.nets.video_models._base import chop
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
    # number of samples to pool per rep for FVD/precision/recall
    self.N = int(G.get('eval_n', 2048))

  def _window(self, batch):
    w = self.model.block_size
    return {k: jnp.asarray(v[:, :w]) for k, v in batch.items()}

  def _feats(self, clip, actions=None):
    if self.arbiter is None:
      return None, None
    aw = self.arbiter.get('window') or clip['lcd'].shape[1]
    c = {'lcd': chop(clip['lcd'], aw), 'proprio': chop(clip['proprio'], aw)}
    z, act_pred = self.arbiter['fn'](self.arbiter['params'], c)
    almse = None
    if actions is not None and act_pred is not None:
      act = chop(actions, aw)[:, :-1]
      almse = jnp.log(((act - act_pred) ** 2).mean())
    return z, almse

  def unprompted(self, batch, key):
    """Reference evaler.py:147-161: sample w/ random actions, burn, encode.

    Pure jnp (traceable): the whole per-batch pipeline runs as ONE jitted
    dispatch — eager per-op dispatch over the axon tunnel (~20-30 ms RTT
    each) made a single eval rep cost ~13 min.
    """
    n = batch['lcd'].shape[0]
    T = self.model.block_size
    pn = self.G.prompt_n
    k1, k2 = jax.random.split(key)
    action = jax.random.uniform(k1, (n, T, self.model.act_n),
                                minval=-1.0, maxval=1.0)
    sample = self.model.sample(k2, n, action=action)
    burned = {k: v[:, pn:] for k, v in sample.items()
              if k in ('lcd', 'proprio')}
    paz, almse = self._feats(burned, action[:, pn:])
    m = {} if almse is None else {'action_log_mse': almse}
    return paz, m

  def prompted(self, batch, key):
    """Reference evaler.py:163-198. Pure jnp (traceable)."""
    n = batch['lcd'].shape[0]
    pn = self.G.prompt_n
    prompts = {k: v for k, v in batch.items() if k != 'action'}
    sample = self.model.sample(key, n, action=batch['action'],
                               prompts=prompts, prompt_n=pn)
    metrics = {}
    lcd_t = batch['lcd']
    lcd_p = sample['lcd'].reshape(lcd_t.shape)
    metrics['ssim'] = M.ssim(lcd_p[:, pn:], lcd_t[:, pn:])
    metrics['psnr'] = M.psnr(lcd_p[:, pn:], lcd_t[:, pn:])
    pt, pp = batch['proprio'], sample['proprio']
    if getattr(self.env, 'pobs_size', 1):  # passive envs have no proprio
      metrics['proprio_log_mse'] = jnp.log(
          ((pt[:, pn:] - pp[:, pn:]) ** 2).mean())
    paz, almse = self._feats({'lcd': lcd_p[:, pn:], 'proprio': pp[:, pn:]},
                             batch['action'][:, pn:])
    taz, talmse = self._feats({'lcd': lcd_t[:, pn:], 'proprio': pt[:, pn:]},
                              batch['action'][:, pn:])
    if almse is not None:
      metrics['action_log_mse'] = almse
      metrics['true_action_log_mse'] = talmse
    if paz is not None:
      cos = (paz * taz).sum(-1) / (jnp.linalg.norm(paz, axis=-1)
                                   * jnp.linalg.norm(taz, axis=-1) + 1e-8)
      metrics['cosdist'] = (1 - cos).mean()
    return paz, taz, metrics

  def _batch_step(self, batch, k1, k2):
    upaz, um = self.unprompted(batch, k1)
    paz, taz, pm = self.prompted(batch, k2)
    return upaz, um, paz, taz, pm

  def _run_batch(self, batch, k1, k2):
    """One jitted dispatch per batch; falls back to eager if a model's
    sample path turns out not to be traceable."""
    if not hasattr(self, '_jit_step'):
      self._jit_step = jax.jit(self._batch_step)
      self._jit_ok = True
    if self._jit_ok:
      try:
        out = self._jit_step(batch, k1, k2)
        # Materialize INSIDE the guard: dispatch is async, so runtime
        # failures (device OOM, tunnel faults) would otherwise surface later
        # at float(v) in do_ds where the eager fallback can't engage.
        return jax.tree.map(lambda x: x if x is None else np.asarray(x), out,
                            is_leaf=lambda x: x is None)
      except Exception as e:  # pragma: no cover - defensive fallback
        print(f'evaler: jit step failed ({type(e).__name__}: {e}); '
              'falling back to eager')
        self._jit_ok = False
    return self._batch_step(batch, k1, k2)

  def do_ds(self, ds, key):
    logger = defaultdict(list)
    all_paz, all_upaz, all_taz = [], [], []
    seen = 0
    it = iter(ds)
    while seen < self.N:
      batch = self._window(next(it))
      key, k1, k2 = jax.random.split(key, 3)
      upaz, um, paz, taz, pm = self._run_batch(batch, k1, k2)
      for k, v in um.items():
        logger['u:' + k].append(float(v))
      for k, v in pm.items():
        logger['p:' + k].append(float(v))
      if paz is not None:
        all_upaz.append(np.asarray(upaz))
        all_paz.append(np.asarray(paz))
        all_taz.append(np.asarray(taz))
      seen += batch['lcd'].shape[0]
    if all_taz:
      upaz = np.concatenate(all_upaz)
      paz = np.concatenate(all_paz)
      taz = np.concatenate(all_taz)
      for prefix, z in (('u:', upaz), ('p:', paz)):
        logger[prefix + 'fvd'].append(float(M.fid(z, taz)))
        pr = M.precision_recall_f1(taz[:5000], z[:5000])
        for k, v in pr.items():
          logger[prefix + k].append(float(v))
    return {k: float(np.mean(v)) for k, v in logger.items()}

  def run(self, reps=5):
    logger = defaultdict(list)
    for rep in range(reps):
      key = jax.random.PRNGKey(rep)
      k1, k2 = jax.random.split(key)
      for split, ds, k in (('test', self.test_ds, k1),
                           ('train', self.train_ds, k2)):
        for mk, v in self.do_ds(ds, k).items():
          logger[f'{split}:{mk}'].append(v)
    final = {k: (float(np.mean(v)), float(np.std(v)))
             for k, v in logger.items()}
    logdir = Path(self.G.logdir)
    logdir.mkdir(parents=True, exist_ok=True)
    with open(logdir / 'logger.pkl', 'wb') as f:
      pickle.dump(final, f)
    for split in ('test', 'train'):
      for mode, label in (('u', 'Unprompted'), ('p', 'Prompted')):
        rows = {k.split(':', 2)[2]: v for k, v in final.items()
                if k.startswith(f'{split}:{mode}:')}
        if rows:
          print(f'== {split} {label}')
          for k, (m, s) in rows.items():
            print(f'{k:24s} {m:.4f} ± {s:.4f}')
    return final

"""Trainer: the generic train loop (reference: research/runners/trainer.py).

batch -> model.train_step -> periodic dry test batch + model.evaluate ->
periodic save. Loads an optional frozen arbiter for eval metrics
(reference: trainer.py:43-55).
"""
from __future__ import annotations

import pickle
import time
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from research import utils
from boxlcd_tpu.data import load_ds


def load_arbiter(G, env):
  """Load a frozen arbiter as {'fn', 'params', 'window', 'kind'} or None.

  Dispatches on the saved blob kind: MultiStepArbiter (window clip features +
  action preds, for video models) or ArbiterAE (single-frame features, for
  autoencoders) — replacing the reference's torch.jit.load at trainer.py:43-55.
  """
  arbdir = Path(G.arbiterdir)
  cands = sorted(arbdir.glob('*.frozen.pkl')) if arbdir.is_dir() else []
  if not cands:
    return None
  import flax
  from boxlcd_tpu.utils import AttrDict
  with open(cands[0], 'rb') as f:
    blob = pickle.load(f)
  kind = blob.get('kind', 'MultiStepArbiter')
  aG = AttrDict(blob['G'])
  if kind == 'MultiStepArbiter':
    from research.nets.autoencoders.multistep_arbiter import MultiStepArbiter
    model = MultiStepArbiter(env, aG)
    window = int(aG.window)

    def fn(params, batch):
      return model.forward_frozen(params, batch)
  else:
    from research.nets.autoencoders.arbiter import ArbiterAE
    model = ArbiterAE(env, aG)
    window = None

    def fn(params, batch):
      return model.encode(params, batch), None
  params = flax.serialization.from_bytes(model.params, blob['params'])
  print('LOADED ARBITER', cands[0], kind)
  return {'fn': fn, 'params': params, 'window': window, 'kind': kind}


class Trainer:
  def __init__(self, model, env, G):
    self.model = model
    self.env = env
    self.G = G
    self.writer = utils.make_writer(G.logdir)
    self.train_ds, self.test_ds = load_ds(G)
    self.logger = utils.AutoLogger()
    self.arbiter = load_arbiter(G, env)
    self.b = lambda batch: {k: jnp.asarray(v) for k, v in batch.items()}

  def run(self):
    G = self.G
    last_save = time.time()
    train_iter = iter(self.train_ds)
    test_iter = iter(self.test_ds)
    if G.get('profile', 0):
      import jax
      jax.profiler.start_trace(str(G.logdir))  # view with tensorboard/xprof
    chunk = max(1, int(G.get('steps_per_dispatch', 1)))
    # mid-run resume: the checkpoint carries the step counter (SURVEY §5.4)
    itr = int(getattr(self.model, 'step', 0))
    if itr:
      print(f'RESUMING at step {itr}')
    while itr < int(G.total_itr):
      if chunk > 1:
        with utils.Timer(self.logger, 'sample_batch'):
          batches = [next(train_iter) for _ in range(chunk)]
          stacked = {k: jnp.stack([jnp.asarray(b[k]) for b in batches])
                     for k in batches[0]}
        with utils.Timer(self.logger, 'train_step'):
          metrics = self.model.train_steps(stacked)
        itr += chunk
      else:
        with utils.Timer(self.logger, 'sample_batch'):
          batch = self.b(next(train_iter))
        with utils.Timer(self.logger, 'train_step'):
          metrics = self.model.train_step(batch)
        itr += 1
      self.logger.update(metrics)
      if itr % G.log_n < chunk or itr <= chunk:
        with utils.Timer(self.logger, 'test'):
          test_batch = self.b(next(test_iter))
          tm = self.model.train_step(test_batch, dry=True)
          self.logger.update({f'test/{k}': v for k, v in tm.items()})
          em = self.model.evaluate(self.writer, test_batch, itr,
                                   arbiter=self.arbiter)
          self.logger.update(em)
        utils.dump_logger(self.logger, self.writer, itr, G)
      if time.time() - last_save > 300 or itr % (G.log_n * G.save_n) == 0:
        self.model.save(G.logdir)
        last_save = time.time()
      if G.get('profile', 0) and itr == min(50, G.total_itr):
        import jax
        jax.profiler.stop_trace()
    self.model.save(G.logdir)

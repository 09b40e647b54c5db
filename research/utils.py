"""Research utilities: logging, timers, small array helpers
(reference: research/utils.py). Media/metric helpers live in
research/metrics.py; this module keeps the logger + timing conventions
(`dt/*` scalar names, hps.yaml rewritten on every dump)."""
from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from pathlib import Path

import numpy as np
import yaml


def flatten_first(x):
  """(A, B, ...) -> (A*B, ...) (reference: utils.py flatten_first)."""
  return x.reshape(-1, *x.shape[2:])


class AutoLogger:
  """Accumulate-then-mean logger (reference: defaultdict(list) pattern)."""

  def __init__(self):
    self._data = defaultdict(list)

  def __setitem__(self, key, val):
    self._data[key].append(np.asarray(val))

  def update(self, metrics):
    for k, v in metrics.items():
      self[k] = v

  def items(self):
    return self._data.items()

  def clear(self):
    self._data.clear()


def dump_logger(logger, writer, itr, G):
  """Print + TB-write mean metrics, persist hps.yaml
  (reference: research/utils.py:63-85)."""
  print('=' * 30)
  print(f'itr {itr}')
  out = {}
  data = logger.items() if hasattr(logger, 'items') else logger.items()
  for key, val in data:
    mean = float(np.mean([np.asarray(v).mean() for v in np.atleast_1d(val)])) \
        if isinstance(val, list) else float(np.mean(val))
    out[key] = mean
    if writer is not None:
      writer.add_scalar(key, mean, itr)
    print(f'{key:40s} {mean:.4f}')
  if G is not None and G.get('logdir'):
    path = Path(G.logdir)
    path.mkdir(parents=True, exist_ok=True)
    dumpable = {k: (str(v) if isinstance(v, Path) else v) for k, v in G.items()}
    with open(path / 'hps.yaml', 'w') as f:
      yaml.dump(dumpable, f)
  print('=' * 30)
  if hasattr(logger, 'clear'):
    logger.clear()
  return out


@contextmanager
def Timer(logger, key):
  """Wall-clock timer feeding `dt/*` metrics (reference: utils.py:184-200)."""
  start = time.time()
  yield
  logger[f'dt/{key}'] = time.time() - start


def make_writer(logdir):
  """TensorBoard writer (torch backend), or a no-op stub if unavailable."""
  try:
    from torch.utils.tensorboard import SummaryWriter
    return SummaryWriter(str(logdir))
  except Exception:
    class _Stub:
      def add_scalar(self, *a, **k):
        pass

      def add_image(self, *a, **k):
        pass

      def add_video(self, *a, **k):
        pass

      def flush(self):
        pass
    return _Stub()

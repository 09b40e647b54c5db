"""Core utilities shared across boxlcd_tpu.

Re-provides the small utility vocabulary of the reference testbed
(reference: boxLCD/utils.py) in a JAX-friendly form:
  - AttrDict            flat config object ("G")
  - A                   concise array constructor
  - NamedArray          dict-style view over a packed float vector with
                        [-1, 1] <-> physical-bounds mapping (the obs contract)
  - mapto / rmapto      the bounds mapping helpers
  - filt/sort dict+list helpers, args_type CLI coercion
"""
from __future__ import annotations

import pathlib
import re

import numpy as np


def retry_transient(fn, attempts=5, label='', sleep_s=20.0):
  """Re-dispatch `fn` on transient device-runtime faults.

  The shared-tunnel TPU backend occasionally fails an execution with
  INVALID_ARGUMENT/INTERNAL at result-materialization time even though the
  identical program ran fine moments before (observed during long collect
  chains). `fn` must be a pure re-dispatchable closure — dispatch AND
  materialize inside it, commit its results only after it returns.
  """
  import time
  # the backend surfaces these as JaxRuntimeError, RuntimeError, or plain
  # ValueError depending on which layer trips, so match on the status text
  markers = ('INVALID_ARGUMENT', 'INTERNAL', 'UNAVAILABLE',
             'RESOURCE_EXHAUSTED', 'DEADLINE_EXCEEDED', 'TPU backend error')
  last = None
  for i in range(attempts):
    try:
      return fn()
    except Exception as e:
      if not any(m in str(e) for m in markers):
        raise
      last = e
      if i == attempts - 1:
        break
      print(f'[retry_transient] {label or fn}: {type(e).__name__}: {e}; '
            f'retrying ({i + 1}/{attempts - 1})', flush=True)
      # exponential backoff: the tunnel's bad periods last minutes, not
      # seconds (measured: a dispatch that failed 3x over 30 s succeeded
      # for 30/30 keys a few minutes later)
      time.sleep(sleep_s * (2 ** i))
  raise last


class AttrDict(dict):
  """dict with attribute access; the flat config object used everywhere."""
  __setattr__ = dict.__setitem__
  __getattr__ = dict.__getitem__


def args_type(default):
  """Return a coercion fn for CLI flags based on a default value's type."""
  if isinstance(default, bool):
    return lambda x: bool(['False', 'True'].index(x))
  if isinstance(default, int):
    return lambda x: float(x) if ('e' in x or '.' in x) else int(x)
  if isinstance(default, pathlib.Path):
    return lambda x: pathlib.Path(x).expanduser()
  return type(default)


class _ConciseArray:
  """A[1, 2, 3] -> np.array([1, 2, 3])."""

  def __getitem__(self, stuff):
    return np.array(stuff)


A = _ConciseArray()


# -- bounds mapping ----------------------------------------------------------
# Every observation / action dimension is normalized to [-1, 1] against its
# physical bounds. These two functions define that contract
# (reference: boxLCD/utils.py:117-119).

def mapto(a, lowhigh):
  """[-1, 1] -> [low, high]."""
  lo, hi = lowhigh[0], lowhigh[1]
  return (a + 1.0) / 2.0 * (hi - lo) + lo


def rmapto(a, lowhigh):
  """[low, high] -> [-1, 1]."""
  lo, hi = lowhigh[0], lowhigh[1]
  return (a - lo) / (hi - lo) * 2.0 - 1.0


class NamedArray:
  """Dict-style access into a packed vector, with optional bounds mapping.

  Works on numpy or jax arrays of shape (..., N). Mirrors the observation
  encoding contract of the reference (boxLCD/utils.py:33-101): reading a key
  un-normalizes from [-1,1] to its bounds; writing normalizes into [-1,1].
  """

  def __init__(self, arr, arr_info, do_map=True):
    self.arr = arr
    self.arr_info = arr_info
    self._keys = list(arr_info.keys())
    self.do_map = do_map

  def _idx(self, name):
    return self._keys.index(name)

  def todict(self):
    return {k: self[k] for k in self.arr_info}

  def __call__(self, key):
    return self[key]

  def __getitem__(self, key):
    if isinstance(key, str):
      idx = self._idx(key)
      val = self.arr[..., idx]
      return mapto(val, self.arr_info[key]) if self.do_map else val
    if isinstance(key, (list, tuple)):
      idxs = [self._idx(k) for k in key]
      val = np.stack([np.asarray(self.arr[..., i]) for i in idxs], axis=-1)
      if self.do_map:
        bounds = np.array([self.arr_info[k] for k in key]).T
        return mapto(val, bounds)
      return val
    raise NotImplementedError(key)

  def __setitem__(self, key, item):
    if isinstance(key, str):
      idx = self._idx(key)
      self.arr[..., idx] = rmapto(item, self.arr_info[key]) if self.do_map else item
      return
    if isinstance(key, (list, tuple)):
      idxs = [self._idx(k) for k in key]
      if self.do_map:
        bounds = np.array([self.arr_info[k] for k in key]).T
        item = rmapto(np.asarray(item), bounds)
      for j, i in enumerate(idxs):
        self.arr[..., i] = np.asarray(item)[..., j]
      return
    raise NotImplementedError(key)


# -- dict / list helpers -----------------------------------------------------

def subdict(d, subkeys):
  return {k: d[k] for k in subkeys}


def sortdict(x):
  return subdict(x, sorted(x))


def subdlist(d, subkeys):
  return [d[k] for k in subkeys]


def filtdict(d, phrase):
  return {k: d[k] for k in d if re.match(phrase, k) is not None}


def nfiltdict(d, phrase):
  return {k: d[k] for k in d if re.match(phrase, k) is None}


def filtlist(lst, phrase):
  return [x for x in lst if re.match(phrase, x) is not None]


def nfiltlist(lst, phrase):
  return [x for x in lst if re.match(phrase, x) is None]


# -- small geometry helpers --------------------------------------------------

def get_angle(sin, cos):
  return np.arctan2(sin, cos)


def make_rot(angle):
  c, s = np.cos(angle), np.sin(angle)
  return np.array([[c, -s], [s, c]])

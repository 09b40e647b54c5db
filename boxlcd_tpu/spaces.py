"""Minimal observation/action space types (gym-free).

The reference packs specs into gym.spaces (boxLCD/world_env.py:127-141);
this provides the same surface (Box bounds/shape/dtype, Dict of spaces,
sample/contains) without the gym dependency.
"""
from __future__ import annotations

import numpy as np


class Box:
  def __init__(self, low, high, shape, dtype=np.float32):
    self.low = low
    self.high = high
    self.shape = tuple(shape)
    self.dtype = dtype

  def sample(self, rng=None):
    rng = rng or np.random
    if np.issubdtype(self.dtype, np.bool_):
      return rng.uniform(size=self.shape) > 0.5
    return rng.uniform(self.low, self.high, self.shape).astype(self.dtype)

  def contains(self, x):
    x = np.asarray(x)
    return x.shape == self.shape and bool(
        (x >= self.low).all() and (x <= self.high).all())

  def __repr__(self):
    return f'Box({self.low}, {self.high}, {self.shape}, {np.dtype(self.dtype).name})'


class Dict:
  def __init__(self, spaces):
    self.spaces = dict(spaces)

  def __getitem__(self, k):
    return self.spaces[k]

  def keys(self):
    return self.spaces.keys()

  def items(self):
    return self.spaces.items()

  def sample(self, rng=None):
    return {k: v.sample(rng) for k, v in self.spaces.items()}

  def __repr__(self):
    return f'Dict({self.spaces})'

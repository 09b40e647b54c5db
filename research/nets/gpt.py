"""Standalone generic causal GPT with per-token sampling
(reference: research/nets/gpt.py): shift-right input, learned pos-emb,
binary or categorical head, optional conditioning vector."""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from research.nets import dists
from research.nets.common import TransformerBlock


class GPT(nn.Module):
  in_size: int
  block_size: int
  n_embed: int = 128
  n_head: int = 4
  n_layer: int = 2
  dist: str = 'binary'        # 'binary' | 'categorical'
  cond: int = 0               # conditioning vector size (0 = none)
  out_n: int | None = None

  @nn.compact
  def __call__(self, x, cond=None):
    """x (B, T, in_size); cond (B, cond) or (B, T, cond) -> dist over tokens."""
    B, T, _ = x.shape
    half = self.n_embed // 2 if self.cond else self.n_embed
    h = nn.Dense(half, use_bias=False, name='embed')(x)
    h = jnp.concatenate([jnp.zeros((B, 1, h.shape[-1])), h[:, :-1]], 1)
    if self.cond:
      c = nn.Dense(self.n_embed - half, use_bias=False, name='cond_in')(cond)
      if c.ndim == 2:
        c = jnp.repeat(c[:, None], T, 1)
      h = jnp.concatenate([h, c], -1)
    # nonzero init required: shift-right makes the t=0 token all-zero, and a
    # zero vector through LayerNorm has a 1/sqrt(eps) backward blowup that
    # compounds per block to inf grads (clip then zeroes every update)
    pos = self.param('pos_emb', nn.initializers.normal(0.02),
                     (1, self.block_size, self.n_embed))
    h = h + pos[:, :T]
    for i in range(self.n_layer):
      h = TransformerBlock(self.n_embed, self.n_head, self.block_size,
                           name=f'block{i}')(h)
    h = nn.LayerNorm(name='ln_f')(h)
    out_n = self.out_n or self.in_size
    logits = nn.Dense(out_n, name='head')(h)
    if self.dist == 'binary':
      return dists.Bernoulli(logits)
    return dists.Categorical(logits)


def sample(module, params, key, n, block_size, in_size, cond=None, temp=1.0):
  """Per-token AR sampling loop (reference: gpt.py:40-58), as lax.scan."""
  x = jnp.zeros((n, block_size, in_size))

  def body(x, inp):
    i, k = inp
    dist = module.apply(params, x, cond)
    row = jax.lax.dynamic_slice_in_dim(dist.logits, i, 1, axis=1)[:, 0]
    tok = dists.Bernoulli(row / temp).sample(k)
    keep = jnp.arange(block_size)[None, :, None] == i
    return jnp.where(keep, tok[:, None, :], x), None

  keys = jax.random.split(key, block_size)
  x, _ = jax.lax.scan(body, x, (jnp.arange(block_size), keys))
  return x


class GPTDist:
  """Distribution-style wrapper over a GPT: log_prob over scalar token
  streams and conditional sampling (reference: common.py:172-183, unused by
  reference models but part of its public surface). Conditioning x has shape
  (B, T, c); token streams (B, T, L)."""

  def __init__(self, module, params, key, x):
    self.module = module
    self.params = params
    self.key = key
    self.x = x

  def _flat(self, a):
    return a.reshape(-1, *a.shape[2:])

  def log_prob(self, state):
    s = self._flat(state)[..., None]
    dist = self.module.apply(self.params, s, self._flat(self.x))
    return dist.log_prob(s)

  def sample(self):
    shape = self.x.shape
    n = shape[0] * shape[1]
    out = sample(self.module, self.params, self.key, n,
                 self.module.block_size, self.module.in_size,
                 cond=self._flat(self.x))
    return out.reshape(shape[0], shape[1], -1)

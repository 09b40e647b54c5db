"""Shared NN blocks (Flax) — re-architecture of reference research/nets/common.py.

Same computational contracts (shapes, distribution heads, conditioning
pathways); idiomatic flax.linen + jnp instead of torch modules. Attention is
a single fused einsum path that XLA maps onto the MXU.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from research.nets import dists


class CausalSelfAttention(nn.Module):
  """Masked multi-head self-attention (reference: common.py:22-57)."""
  n_embed: int
  n_head: int
  block_size: int

  @nn.compact
  def __call__(self, x, cache=None, index=None):
    """Full causal attention over x (B,T,E). With `cache=(k,v)` each
    (B,H,S,hs) and a position `index`, x is a single token (B,1,E): its k/v
    are written into the cache at `index` and attention runs against the
    cached prefix — O(S) per step instead of O(S^2) full forwards."""
    B, T, E = x.shape
    hs = self.n_embed // self.n_head
    qkv = nn.Dense(3 * self.n_embed, name='qkv')(x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, T, self.n_head, hs).transpose(0, 2, 1, 3)
    k = k.reshape(B, T, self.n_head, hs).transpose(0, 2, 1, 3)
    v = v.reshape(B, T, self.n_head, hs).transpose(0, 2, 1, 3)
    if cache is None:
      att = jnp.einsum('bhqd,bhkd->bhqk', q, k) / np.sqrt(hs)
      mask = jnp.tril(jnp.ones((T, T), bool))
      att = jnp.where(mask[None, None], att, -jnp.inf)
      att = jax.nn.softmax(att, -1)
      y = jnp.einsum('bhqk,bhkd->bhqd', att, v)
      y = y.transpose(0, 2, 1, 3).reshape(B, T, self.n_embed)
      return nn.Dense(self.n_embed, name='proj')(y)
    ck, cv = cache
    ck = jax.lax.dynamic_update_slice(ck, k, (0, 0, index, 0))
    cv = jax.lax.dynamic_update_slice(cv, v, (0, 0, index, 0))
    att = jnp.einsum('bhqd,bhkd->bhqk', q, ck) / np.sqrt(hs)  # (B,H,1,S)
    valid = jnp.arange(ck.shape[2]) <= index
    att = jnp.where(valid[None, None, None], att, -jnp.inf)
    att = jax.nn.softmax(att, -1)
    y = jnp.einsum('bhqk,bhkd->bhqd', att, cv)
    y = y.transpose(0, 2, 1, 3).reshape(B, 1, self.n_embed)
    return nn.Dense(self.n_embed, name='proj')(y), (ck, cv)


class TransformerBlock(nn.Module):
  """Pre-LN transformer block (reference: common.py:59-74)."""
  n_embed: int
  n_head: int
  block_size: int

  @nn.compact
  def __call__(self, x, cache=None, index=None):
    attn = CausalSelfAttention(self.n_embed, self.n_head, self.block_size,
                               name='attn')
    if cache is None:
      x = x + attn(nn.LayerNorm(name='ln1')(x))
    else:
      a, cache = attn(nn.LayerNorm(name='ln1')(x), cache, index)
      x = x + a
    h = nn.LayerNorm(name='ln2')(x)
    h = nn.Dense(4 * self.n_embed)(h)
    h = nn.gelu(h)
    h = nn.Dense(self.n_embed)(h)
    out = x + h
    return out if cache is None else (out, cache)


class GaussHead(nn.Module):
  """Diagonal-Gaussian head (reference: common.py:76-91)."""
  z_size: int
  min_std: float = 1e-4

  @nn.compact
  def __call__(self, x, past_z=None):
    out = nn.Dense(2 * self.z_size)(x)
    mu, log_std = jnp.split(out, 2, -1)
    std = jax.nn.softplus(log_std) + self.min_std
    if past_z is not None:
      mu = mu + past_z
    return dists.Normal(mu, std)


class MDNHead(nn.Module):
  """Mixture-density head (reference: common.py:93-112)."""
  out_n: int
  mdn_k: int = 5
  min_std: float = 1e-4

  @nn.compact
  def __call__(self, x):
    dx = self.mdn_k * self.out_n
    out = nn.Dense(self.mdn_k + 2 * dx)(x)
    mu = out[..., :dx].reshape(*out.shape[:-1], self.mdn_k, self.out_n)
    std = jax.nn.softplus(out[..., dx:2 * dx]).reshape(
        *out.shape[:-1], self.mdn_k, self.out_n) + self.min_std
    logits = out[..., 2 * dx:]
    return dists.MixtureOfGaussians(logits, mu, std)


class CategoricalHead(nn.Module):
  out_n: int

  @nn.compact
  def __call__(self, x):
    return dists.Categorical(nn.Dense(self.out_n)(x))


class BinaryHead(nn.Module):
  """Bernoulli head (reference: common.py:123-130)."""
  out_n: int

  @nn.compact
  def __call__(self, x):
    return dists.Bernoulli(nn.Dense(self.out_n)(x))


class ConvEmbed(nn.Module):
  """Frame -> flat embedding via small conv stack (reference: common.py:156-170)."""
  lcd_h: int
  lcd_w: int

  @nn.compact
  def __call__(self, x):
    BS, LEN, E = x.shape
    h = x.reshape(BS * LEN, self.lcd_h, self.lcd_w, 1)
    h = nn.Conv(64, (3, 3), padding='SAME')(h)
    h = nn.relu(h)
    h = nn.Conv(1, (3, 3), padding='SAME')(h)
    return h.reshape(BS, LEN, -1)


class ConvBinHead(nn.Module):
  """Latent -> frame logits via deconv stack (reference: common.py:132-154)."""
  out_n: int
  wh_ratio: float

  @nn.compact
  def __call__(self, x):
    BS, LEN, E = x.shape
    first_kernel = int(self.wh_ratio * 4)
    h = x.reshape(BS * LEN, 1, 1, E)
    h = nn.ConvTranspose(64, (4, first_kernel), strides=(2, 2),
                         padding='VALID')(h)
    h = nn.relu(h)
    h = nn.ConvTranspose(64, (4, 4), strides=(2, 2), padding='SAME')(h)
    h = nn.relu(h)
    h = nn.ConvTranspose(1, (4, 4), strides=(2, 2), padding='SAME')(h)
    return dists.Bernoulli(h.reshape(BS, LEN, -1))


class MultiHead(nn.Module):
  """Joint lcd (Bernoulli) + proprio (MDN) head (reference: common.py:185-206)."""
  in_n: int
  out_n: int
  split: int
  mdn_k: int = 5
  min_std: float = 1e-4
  conv_io: int = 0
  wh_ratio: float = 1.0

  @nn.compact
  def __call__(self, x):
    h = nn.Dense(self.in_n * 2)(x)
    xb, xs = jnp.split(h, 2, -1)
    if self.conv_io:
      bin_dist = ConvBinHead(self.split, self.wh_ratio)(xb)
    else:
      bin_dist = BinaryHead(self.split)(xb)
    state = MDNHead(self.out_n - self.split, self.mdn_k, self.min_std)(xs)
    return {'lcd': bin_dist, 'proprio': state}


class ResBlock(nn.Module):
  """GroupNorm+SiLU residual conv block with embedding conditioning
  (reference: common.py:208-238); final conv zero-initialized."""
  channels: int
  emb_channels: int
  out_channels: int | None = None
  dropout: float = 0.0
  group_size: int = 16

  @nn.compact
  def __call__(self, x, emb):
    out_ch = self.out_channels or self.channels
    h = nn.GroupNorm(num_groups=self.group_size)(x)
    h = nn.silu(h)
    h = nn.Conv(out_ch, (3, 3), padding='SAME')(h)
    e = nn.Dense(out_ch)(nn.silu(emb))
    h = h + e[:, None, None, :]
    h = nn.GroupNorm(num_groups=self.group_size)(h)
    h = nn.silu(h)
    h = nn.Conv(out_ch, (3, 3), padding='SAME',
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros)(h)
    if out_ch == x.shape[-1]:
      skip = x
    else:
      skip = nn.Conv(out_ch, (1, 1))(x)
    return skip + h


class Upsample(nn.Module):
  """Nearest-x2 upsample + conv (reference: bvae.py:95-103)."""
  out_ch: int

  @nn.compact
  def __call__(self, x):
    B, H, W, C = x.shape
    x = jax.image.resize(x, (B, 2 * H, 2 * W, C), 'nearest')
    return nn.Conv(self.out_ch, (3, 3), padding='SAME')(x)


def aggregate(x, axis=1):
  """min/max/std/mean aggregation (reference: common.py:241-254)."""
  return jnp.concatenate([
      x.min(axis=axis), x.max(axis=axis),
      x.std(axis=axis), x.mean(axis=axis)], -1)


def zero_params(params):
  """Zero out a parameter pytree (reference: common.py:16-20 zero_module) —
  functional form: returns a new pytree rather than mutating modules."""
  return jax.tree_util.tree_map(jnp.zeros_like, params)

"""FIT (Flat Image Token): GPT over whole flattened frames as tokens,
Bernoulli pixels (reference: research/nets/video_models/flat_itoken.py)."""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from research.nets import dists
from research.nets.common import BinaryHead, TransformerBlock
from research.nets.video_models._base import VideoModel


class FITModule(nn.Module):
  n_embed: int
  n_head: int
  n_layer: int
  block_size: int
  imsize: int
  act_n: int

  @nn.compact
  def __call__(self, lcd_flat, action):
    B, T, _ = lcd_flat.shape
    x = nn.Dense(self.n_embed // 2, use_bias=False, name='embed')(lcd_flat)
    x = jnp.concatenate([jnp.zeros((B, 1, x.shape[-1])), x[:, :-1]], 1)
    a = jnp.concatenate([jnp.zeros((B, 1, action.shape[-1])),
                         action[:, :-1]], 1)
    cin = nn.Dense(self.n_embed // 2, use_bias=False, name='cond_in')(a)
    x = jnp.concatenate([x, cin], -1)
    pos = self.param('pos_emb', nn.initializers.normal(0.02),
                     (1, self.block_size, self.n_embed))
    x = x + pos[:, :T]
    for i in range(self.n_layer):
      x = TransformerBlock(self.n_embed, self.n_head, self.block_size,
                           name=f'block{i}')(x)
    x = nn.LayerNorm(name='ln_f')(x)
    return BinaryHead(self.imsize, name='dist_head')(x).logits


class FIT(VideoModel):
  def __init__(self, env, G):
    super().__init__(env, G)
    self.lcd_h = int(G.lcd_base)
    self.lcd_w = int(G.lcd_base * G.wh_ratio)
    self.imsize = self.lcd_h * self.lcd_w
    self.module = FITModule(G.n_embed, G.n_head, G.n_layer, self.block_size,
                            self.imsize, self.act_n)
    self._init()

  def init_params(self, key):
    lcd = jnp.zeros((1, self.block_size, self.imsize))
    a = jnp.zeros((1, self.block_size, self.act_n))
    return self.module.init(key, lcd, a)

  def loss_fn(self, params, batch, rng):
    B, T = batch['lcd'].shape[:2]
    lcd = batch['lcd'].reshape(B, T, -1)
    logits = self.module.apply(params, lcd, batch['action'])
    loss = -dists.Bernoulli(logits).log_prob(lcd).mean()
    return loss, {'loss/lcd': loss, 'loss/total': loss}

  def onestep(self, params, batch, i, key, temp=1.0):
    B, T = batch['lcd'].shape[:2]
    lcd = batch['lcd'].reshape(B, T, -1)
    logits = self.module.apply(params, lcd, batch['action'])
    frame = dists.Bernoulli(logits[:, i] / temp).sample(key)
    batch['lcd'] = batch['lcd'].at[:, i].set(
        frame.reshape(B, self.lcd_h, self.lcd_w))
    return batch

  def sample(self, key, n, action=None, prompts=None, prompt_n=10, temp=1.0):
    T = self.block_size
    k_act, k_run = jax.random.split(key)
    if action is None:
      action = jax.random.uniform(k_act, (n, T, self.act_n),
                                  minval=-1, maxval=1)
    else:
      n = action.shape[0]
    lcd = jnp.zeros((n, T, self.imsize))
    start = 0
    if prompts is not None:
      p = prompts['lcd'][:, :prompt_n].reshape(n, prompt_n, -1)
      lcd = lcd.at[:, :prompt_n].set(p.astype(lcd.dtype))
      start = prompt_n

    def body(carry, inp):
      lcd = carry
      i, k, is_live = inp
      logits = self.module.apply(self.params, lcd, action)
      row = jax.lax.dynamic_slice_in_dim(logits, i, 1, axis=1)[:, 0]
      frame = dists.Bernoulli(row / temp).sample(k)
      keep = (jnp.arange(T)[None, :, None] == i) & is_live
      lcd = jnp.where(keep, frame[:, None, :], lcd)
      return lcd, None

    idxs = jnp.arange(T)
    keys = jax.random.split(k_run, T)
    lcd, _ = jax.lax.scan(body, lcd, (idxs, keys, idxs >= start))
    return {'lcd': lcd.reshape(n, T, self.lcd_h, self.lcd_w),
            'proprio': jnp.zeros((n, T, self.proprio_n))}

"""Self-contained minimal video-GPT with Bernoulli pixels and bits/dim loss
(reference: examples/model.py — a minGPT-style model; rebuilt on flax)."""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from research.nets import dists
from research.nets.common import TransformerBlock


class MiniGPT(nn.Module):
  n_embed: int
  n_head: int
  n_layer: int
  block_size: int
  imsize: int
  act_n: int

  @nn.compact
  def __call__(self, lcd_flat, action):
    B, T, _ = lcd_flat.shape
    x = nn.Dense(self.n_embed // 2, use_bias=False)(lcd_flat)
    x = jnp.concatenate([jnp.zeros((B, 1, x.shape[-1])), x[:, :-1]], 1)
    a = jnp.concatenate([jnp.zeros((B, 1, action.shape[-1])),
                         action[:, :-1]], 1)
    cin = nn.Dense(self.n_embed // 2, use_bias=False)(a)
    x = jnp.concatenate([x, cin], -1)
    pos = self.param('pos_emb', nn.initializers.zeros,
                     (1, self.block_size, self.n_embed))
    x = x + pos[:, :T]
    for _ in range(self.n_layer):
      x = TransformerBlock(self.n_embed, self.n_head, self.block_size)(x)
    x = nn.LayerNorm()(x)
    return nn.Dense(self.imsize)(x)


class Model:
  def __init__(self, env, G):
    self.G = G
    self.imsize = env.lcd_h * env.lcd_w
    self.module = MiniGPT(G.n_embed, G.n_head, G.n_layer, G.window,
                          self.imsize, env.act_size)
    key = jax.random.PRNGKey(0)
    lcd = jnp.zeros((1, G.window, self.imsize))
    act = jnp.zeros((1, G.window, env.act_size))
    self.params = self.module.init(key, lcd, act)
    self.opt = optax.adam(G.lr)
    self.opt_state = self.opt.init(self.params)

    def loss_fn(params, batch):
      B, T = batch['lcd'].shape[:2]
      lcd = batch['lcd'].reshape(B, T, -1)
      logits = self.module.apply(params, lcd, batch['action'])
      nll = -dists.Bernoulli(logits).log_prob(lcd).mean()
      bits_per_dim = nll / jnp.log(2.0)  # (reference: examples/model.py:121)
      return nll, bits_per_dim

    def update(params, opt_state, batch):
      (loss, bpd), grads = jax.value_and_grad(loss_fn, has_aux=True)(
          params, batch)
      updates, opt_state = self.opt.update(grads, opt_state, params)
      return optax.apply_updates(params, updates), opt_state, loss, bpd

    self._update = jax.jit(update)

  def train_step(self, batch):
    self.params, self.opt_state, loss, bpd = self._update(
        self.params, self.opt_state, batch)
    return {'loss': float(loss), 'bits_per_dim': float(bpd)}

  def sample(self, key, n, action):
    T = self.G.window

    def body(lcd, inp):
      i, k = inp
      logits = self.module.apply(self.params, lcd, action)
      row = jax.lax.dynamic_slice_in_dim(logits, i, 1, axis=1)[:, 0]
      frame = dists.Bernoulli(row).sample(k)
      keep = jnp.arange(T)[None, :, None] == i
      return jnp.where(keep, frame[:, None, :], lcd), None

    lcd = jnp.zeros((n, T, self.imsize))
    lcd, _ = jax.lax.scan(body, lcd,
                          (jnp.arange(T), jax.random.split(key, T)))
    return lcd

"""FBT (Flat Binary Token transformer) — the headline world model.

GPT over frozen BVAE binary latents, action-conditioned, Bernoulli token head
(reference: research/nets/video_models/flat_btoken.py). The frozen BVAE is
loaded from G.weightdir just like the reference (flat_btoken.py:21-30).
Sampling is a `lax.scan` over positions (full forward per step, as in the
reference; KV-cache serving is a planned optimization).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from research.nets import dists
from research.nets.common import BinaryHead, TransformerBlock
from research.nets.video_models._base import VideoModel


class FBTModule(nn.Module):
  n_embed: int
  n_head: int
  n_layer: int
  block_size: int
  z_size: int
  act_n: int

  @nn.compact
  def __call__(self, z, action):
    """z (B, T, z_size), action (B, T, act_n) -> token logits (B, T, z_size).

    Shift-right conditioning: position t sees z[<t], action[<t]
    (reference: flat_btoken.py:52-67).
    """
    B, T, _ = z.shape
    x = nn.Dense(self.n_embed // 2, use_bias=False, name='embed')(z)
    x = jnp.concatenate([jnp.zeros((B, 1, x.shape[-1])), x[:, :-1]], 1)
    a = jnp.concatenate([jnp.zeros((B, 1, action.shape[-1])),
                         action[:, :-1]], 1)
    cin = nn.Dense(self.n_embed // 2, use_bias=False, name='cond_in')(a)
    x = jnp.concatenate([x, cin], -1)
    # nonzero init required: shift-right makes the t=0 token all-zero, and a
    # zero vector through LayerNorm has a 1/sqrt(eps) backward blowup that
    # compounds per block to inf grads (clip then zeroes every update)
    pos = self.param('pos_emb', nn.initializers.normal(0.02),
                     (1, self.block_size, self.n_embed))
    x = x + pos[:, :T]
    for i in range(self.n_layer):
      x = TransformerBlock(self.n_embed, self.n_head, self.block_size,
                           name=f'block{i}')(x)
    x = nn.LayerNorm(name='ln_f')(x)
    return BinaryHead(self.z_size, name='dist_head')(x).logits


class FBT(VideoModel):
  def __init__(self, env, G, bvae=None):
    super().__init__(env, G)
    if bvae is None:
      from research.nets.autoencoders.bvae import BVAE
      from research.nets._base import Net
      bvaeG = Net.load_config(G.weightdir, 'BVAE')
      bvae = BVAE(env, bvaeG)
      bvae.load(G.weightdir)
      print('LOADED BVAE', G.weightdir)
    self.bvae = bvae  # frozen: its params never enter the optimizer
    self.z_size = bvae.z_size
    self.module = FBTModule(G.n_embed, G.n_head, G.n_layer,
                            self.block_size, self.z_size, self.act_n)
    self._init()

  def init_params(self, key):
    z = jnp.zeros((1, self.block_size, self.z_size))
    a = jnp.zeros((1, self.block_size, self.act_n))
    return self.module.init(key, z, a)

  def loss_fn(self, params, batch, rng):
    z = jax.lax.stop_gradient(
        self.bvae.encode(self.bvae.params, batch, noise=False))
    logits = self.module.apply(params, z, batch['action'])
    loss = -dists.Bernoulli(logits).log_prob(z).mean()
    return loss, {'loss/total': loss}

  # -- serving -------------------------------------------------------------------
  def latent_onestep(self, params, z, a, i, key, temp=1.0):
    """Sample token i given tokens < i (reference: flat_btoken.py:87-91)."""
    logits = self.module.apply(params, z, a)
    zi = dists.Bernoulli(logits[:, i] / temp).sample(key)
    return z.at[:, i].set(zi)

  def onestep(self, params, batch, i, key, temp=1.0):
    """Learned-env serving: predict frame i from the window
    (reference: flat_btoken.py:77-85)."""
    z = self.bvae.encode(self.bvae.params, batch, noise=False)
    logits = self.module.apply(params, z, batch['action'])
    zi = dists.Bernoulli(logits[:, i] / temp).sample(key)
    dec = self.bvae.decode(self.bvae.params, self.bvae.unflatten_z(zi))
    lcd = (dec['lcd'].probs > 0.5).astype(jnp.float32)
    batch['lcd'] = batch['lcd'].at[:, i].set(lcd)
    batch['proprio'] = batch['proprio'].at[:, i].set(dec['proprio'].mean)
    return batch

  def sample(self, key, n, action=None, prompts=None, prompt_n=10, temp=1.0):
    """AR rollout in latent space then batch decode
    (reference: flat_btoken.py:98-125)."""
    T = self.block_size
    k_act, k_run = jax.random.split(key)
    if action is None:
      action = jax.random.uniform(k_act, (n, T, self.act_n),
                                  minval=-1, maxval=1)
    else:
      n = action.shape[0]
    lcd = jnp.zeros((n, T, self.G.lcd_base,
                     int(self.G.lcd_base * self.G.wh_ratio)))
    proprio = jnp.zeros((n, T, self.proprio_n))
    start = 0
    if prompts is not None:
      lcd = lcd.at[:, :prompt_n].set(prompts['lcd'][:, :prompt_n])
      proprio = proprio.at[:, :prompt_n].set(prompts['proprio'][:, :prompt_n])
      start = prompt_n
    z = self.bvae.encode(self.bvae.params, {'lcd': lcd, 'proprio': proprio},
                         noise=False)
    z = jnp.where((jnp.arange(T) < start)[None, :, None], z, 0.0)

    # scan over positions start..T-1 (full forward per step, as reference)
    def body(zc, inp):
      i, k = inp
      logits = self.module.apply(self.params, zc, action)
      row = jax.lax.dynamic_slice_in_dim(logits, i, 1, axis=1)[:, 0]
      zi = dists.Bernoulli(row / temp).sample(k)
      keep = jnp.arange(T)[None, :, None] == i
      zc = jnp.where(keep, zi[:, None, :], zc)
      return zc, None

    idxs = jnp.arange(T)
    keys = jax.random.split(k_run, T)
    live = idxs >= start

    def masked_body(zc, inp):
      i, k, is_live = inp
      new_zc, _ = body(zc, (i, k))
      zc = jnp.where(is_live, new_zc, zc)
      return zc, None

    z, _ = jax.lax.scan(masked_body, z, (idxs, keys, live))
    dec = self.bvae.decode(self.bvae.params,
                           self.bvae.unflatten_z(z.reshape(n * T, -1)))
    lcd = (dec['lcd'].probs > 0.5).astype(jnp.float32)
    return {'lcd': lcd.reshape(n, T, *lcd.shape[1:]),
            'proprio': dec['proprio'].mean.reshape(n, T, -1)}

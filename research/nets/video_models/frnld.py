"""FRNLD: FBT over frozen RNLDA latents with tanh-MSE regression head
(reference: research/nets/video_models/flat_ronald.py)."""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from research.nets.common import TransformerBlock
from research.nets.quantize import rnld
from research.nets.video_models._base import VideoModel


class FRNLDModule(nn.Module):
  n_embed: int
  n_head: int
  n_layer: int
  block_size: int
  z_size: int
  act_n: int

  @nn.compact
  def __call__(self, z, action):
    B, T, _ = z.shape
    x = nn.Dense(self.n_embed // 2, use_bias=False, name='embed')(z)
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
    return nn.Dense(self.z_size, name='out_net')(x)


class FRNLD(VideoModel):
  def __init__(self, env, G, ronald=None):
    super().__init__(env, G)
    if ronald is None:
      from research.nets.autoencoders.rnlda import RNLDA
      from research.nets._base import Net
      rG = Net.load_config(G.weightdir, 'RNLDA')
      ronald = RNLDA(env, rG)
      ronald.load(G.weightdir)
      print('LOADED RNLDA', G.weightdir)
    self.ronald = ronald
    self.z_size = ronald.z_size
    self.module = FRNLDModule(G.n_embed, G.n_head, G.n_layer,
                              self.block_size, self.z_size, self.act_n)
    self._init()

  def init_params(self, key):
    z = jnp.zeros((1, self.block_size, self.z_size))
    a = jnp.zeros((1, self.block_size, self.act_n))
    return self.module.init(key, z, a)

  def loss_fn(self, params, batch, rng):
    z = jax.lax.stop_gradient(
        self.ronald.encode(self.ronald.params, batch, noise=False))
    out = self.module.apply(params, z, batch['action'])
    loss = ((jnp.tanh(out) - z) ** 2).mean()
    return loss, {'loss/total': loss}

  def onestep(self, params, batch, i, key, temp=1.0):
    z = self.ronald.encode(self.ronald.params, batch, noise=False)
    out = self.module.apply(params, z, batch['action'])
    zi, _ = rnld(out[:, i], key, noise=True)
    dec = self.ronald.decode(self.ronald.params, self.ronald.unflatten_z(zi))
    lcd = (dec['lcd'].probs > 0.5).astype(jnp.float32)
    batch['lcd'] = batch['lcd'].at[:, i].set(lcd)
    batch['proprio'] = batch['proprio'].at[:, i].set(dec['proprio'].mean)
    return batch

  def sample(self, key, n, action=None, prompts=None, prompt_n=10, temp=1.0):
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
    z = self.ronald.encode(self.ronald.params,
                           {'lcd': lcd, 'proprio': proprio}, noise=False)
    z = jnp.where((jnp.arange(T) < start)[None, :, None], z, 0.0)

    def body(zc, inp):
      i, k, is_live = inp
      out = self.module.apply(self.params, zc, action)
      row = jax.lax.dynamic_slice_in_dim(out, i, 1, axis=1)[:, 0]
      zi, _ = rnld(row, k, noise=True)
      keep = (jnp.arange(T)[None, :, None] == i) & is_live
      zc = jnp.where(keep, zi[:, None, :], zc)
      return zc, None

    idxs = jnp.arange(T)
    keys = jax.random.split(k_run, T)
    z, _ = jax.lax.scan(body, z, (idxs, keys, idxs >= start))
    dec = self.ronald.decode(self.ronald.params,
                             self.ronald.unflatten_z(z.reshape(n * T, -1)))
    lcd = (dec['lcd'].probs > 0.5).astype(jnp.float32)
    return {'lcd': lcd.reshape(n, T, *lcd.shape[1:]),
            'proprio': dec['proprio'].mean.reshape(n, T, -1)}

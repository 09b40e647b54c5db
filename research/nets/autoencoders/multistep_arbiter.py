"""MultiStepArbiter: window-level clip encoder -> z(256) + action prediction.

The "FVD" feature network + action-predictability probe (reference:
research/nets/autoencoders/multistep_arbiter.py). Frames stack on the channel
axis; the decoder reconstructs the clip, proprio sequence, and the actions
between frames.
"""
from __future__ import annotations

import pickle
from pathlib import Path

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp

from research.nets import dists
from research.nets.autoencoders._base import MultiStepAE
from research.nets.autoencoders.encoders import ConvTrunk, DeconvTrunk


class MSArbModule(nn.Module):
  hidden_size: int
  nfilter: int
  z_size: int
  proprio_n: int
  act_n: int
  window: int
  wh_ratio: float

  def setup(self):
    n = self.hidden_size
    self.state_mlp1 = nn.Dense(n)
    self.state_mlp2 = nn.Dense(n)
    self.state_mix = nn.Dense(n)
    self.trunk = ConvTrunk(n, self.nfilter, self.z_size,
                           in_channels=self.window)
    self.deconv = DeconvTrunk(self.nfilter, self.wh_ratio,
                              out_channels=self.window)
    self.state_d1 = nn.Dense(n)
    self.state_d2 = nn.Dense(self.window * n)
    self.state_out = nn.Dense(self.proprio_n)
    self.act_d1 = nn.Dense(n)
    self.act_d2 = nn.Dense((self.window - 1) * n)
    self.act_out = nn.Dense(self.act_n)

  def enc(self, lcd, proprio):
    """lcd (B, T, H, W); proprio (B, T, P) -> z (B, z_size)."""
    B, T = proprio.shape[:2]
    emb = nn.relu(self.state_mlp1(proprio))
    emb = nn.relu(self.state_mlp2(emb))
    emb = self.state_mix(emb.reshape(B, -1))
    x = lcd.transpose(0, 2, 3, 1)                        # frames as channels
    return self.trunk(x, emb)

  def dec(self, z):
    B = z.shape[0]
    n = self.hidden_size
    lcd_logits = self.deconv(z).transpose(0, 3, 1, 2)    # (B, T, H, W)
    h = nn.relu(self.state_d1(z))
    h = nn.relu(self.state_d2(h)).reshape(B, self.window, n)
    proprio = self.state_out(h)
    a = nn.relu(self.act_d1(z))
    a = nn.relu(self.act_d2(a)).reshape(B, self.window - 1, n)
    action = self.act_out(a)
    return lcd_logits, proprio, action

  def __call__(self, lcd, proprio):
    return self.dec(self.enc(lcd, proprio))


class MultiStepArbiter(MultiStepAE):
  def __init__(self, env, G):
    super().__init__(env, G)
    self.z_size = 256
    self.act_n = env.act_size
    self.module = MSArbModule(G.hidden_size, G.nfilter, self.z_size,
                              self.proprio_n, self.act_n, G.window, G.wh_ratio)
    self._init()

  def init_params(self, key):
    T = self.G.window
    lcd = jnp.zeros((1, T, self.G.lcd_base,
                     int(self.G.lcd_base * self.G.wh_ratio)))
    return self.module.init(key, lcd, jnp.zeros((1, T, self.proprio_n)))

  def loss_fn(self, params, batch, rng):
    lcd_l, proprio, action = self.module.apply(
        params, batch['lcd'], batch['proprio'])
    recon_lcd = -dists.Bernoulli(lcd_l).log_prob(batch['lcd']).mean()
    recon_proprio = -dists.Normal(
        proprio, jnp.ones_like(proprio)).log_prob(batch['proprio']).mean() \
        / self.proprio_n
    recon_action = -dists.Normal(
        action, jnp.ones_like(action)).log_prob(
            batch['action'][:, :-1]).mean() / self.act_n
    loss = recon_lcd + recon_proprio + recon_action
    return loss, {'loss/recon_total': loss, 'loss/recon_lcd': recon_lcd,
                  'loss/recon_proprio': recon_proprio,
                  'loss/recon_action': recon_action}

  def encode(self, params, batch, noise=False, key=None, flatten=True):
    return self.module.apply(params, batch['lcd'], batch['proprio'],
                             method='enc')

  def decode(self, params, z):
    lcd_l, proprio, action = self.module.apply(params, z, method='dec')
    return {'lcd': dists.Bernoulli(lcd_l),
            'proprio': dists.Normal(proprio, jnp.ones_like(proprio)),
            'action': dists.Normal(action, jnp.ones_like(action))}

  def forward_frozen(self, params, batch):
    """(z, action_pred) — the traced-arbiter surface the Evaler consumes
    (reference: multistep_arbiter.py:32-44)."""
    z = self.encode(params, batch)
    _, _, action = self.module.apply(params, z, method='dec')
    return z, action

  def save(self, direc):
    # the reference's arbiter save IS the trace dump (arbiter.py:26-31,
    # multistep_arbiter.py:26-44): every checkpoint must also refresh the
    # frozen feature extractor the Trainer/Evaler load by glob
    super().save(direc)
    self.save_frozen(direc)

  def save_frozen(self, direc):
    direc = Path(direc)
    direc.mkdir(parents=True, exist_ok=True)
    path = direc / f'{self.name}.frozen.pkl'
    blob = {'params': flax.serialization.to_bytes(self.params),
            'G': dict(self.G), 'kind': 'MultiStepArbiter'}
    with open(path, 'wb') as f:
      pickle.dump(blob, f)
    print('SAVED FROZEN ARBITER', path)

  def sample_z(self, key, n):
    return jax.random.normal(key, (n, self.z_size))

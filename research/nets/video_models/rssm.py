"""RSSM: Dreamer-v1-style latent dynamics, `lax.scan` over time
(reference: research/nets/video_models/rssm.py). GRU deter(256) +
Gaussian stoch(64), KL with free nats, conv encoder/decoder."""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from research.nets import dists
from research.nets.autoencoders.encoders import (ConvTrunk, DeconvTrunk,
                                                 StateEmbed, StateHead)
from research.nets.video_models._base import VideoModel

STOCH, DETER, EMBED = 64, 256, 256


class RSSMModule(nn.Module):
  hidden_size: int
  nfilter: int
  proprio_n: int
  act_n: int
  wh_ratio: float

  def setup(self):
    n = self.hidden_size
    self.state_embed = StateEmbed(n)
    self.trunk = ConvTrunk(n, self.nfilter, EMBED)
    self.cell = nn.GRUCell(features=DETER)
    self.deconv = DeconvTrunk(self.nfilter, self.wh_ratio)
    self.state_head = StateHead(n, self.proprio_n)
    self.obs1 = nn.Dense(n)
    self.obs2 = nn.Dense(2 * STOCH)
    self.img1 = nn.Dense(n)
    self.img2 = nn.Dense(n)
    self.img3 = nn.Dense(2 * STOCH)
    self.feat_dec = nn.Dense(n)

  def encode(self, lcd, proprio):
    emb = self.state_embed(proprio)
    return self.trunk(lcd[..., None], emb)

  def decode(self, feat):
    lcd_logits = self.deconv(feat)[..., 0]
    state = self.state_head(feat)
    return {'lcd': dists.Bernoulli(lcd_logits),
            'proprio': dists.Normal(state, jnp.ones_like(state))}

  def img_step(self, prev, action, key):
    x = jnp.concatenate([prev['stoch'], action], -1)
    x = nn.relu(self.img1(x))
    deter, _ = self.cell(prev['deter'], x)
    h = nn.relu(self.img2(deter))
    mean, std = jnp.split(self.img3(h), 2, -1)
    std = jax.nn.softplus(std) + 0.1
    stoch = mean + std * jax.random.normal(key, mean.shape)
    return {'mean': mean, 'std': std, 'stoch': stoch, 'deter': deter}

  def obs_step(self, prev, action, embed, key):
    k1, k2 = jax.random.split(key)
    prior = self.img_step(prev, action, k1)
    x = jnp.concatenate([prior['deter'], embed], -1)
    h = nn.relu(self.obs1(x))
    mean, std = jnp.split(self.obs2(h), 2, -1)
    std = jax.nn.softplus(std) + 0.1
    stoch = mean + std * jax.random.normal(k2, mean.shape)
    post = {'mean': mean, 'std': std, 'stoch': stoch, 'deter': prior['deter']}
    return post, prior

  def observe(self, embed, action, key, state=None):
    """embed/action (B, T, ...) -> stacked posts, priors."""
    B, T = action.shape[:2]
    if state is None:
      state = initial(B)
    keys = jax.random.split(key, T)

    def step(carry, inp):
      emb_t, act_t, k = inp
      post, prior = self.obs_step(carry, act_t, emb_t, k)
      return post, (post, prior)

    _, (posts, priors) = nn.scan(
        lambda mdl, c, x: step_wrap(mdl, c, x),
        variable_broadcast='params', split_rngs={'params': False},
        in_axes=1, out_axes=1)(self, state,
                               (embed, action, keys_expand(keys, B)))
    return posts, priors

  def imagine(self, action, key, state=None):
    B, T = action.shape[:2]
    if state is None:
      state = initial(B)
    keys = jax.random.split(key, T)

    def step(mdl, carry, inp):
      act_t, k = inp
      prior = mdl.img_step(carry, act_t, k[:, 0])
      return prior, prior

    _, priors = nn.scan(step, variable_broadcast='params',
                        split_rngs={'params': False},
                        in_axes=1, out_axes=1)(
        self, state, (action, keys_expand(keys, B)))
    return priors

  def __call__(self, lcd, proprio, action, key):
    """Training pass: returns (posts, priors, feats) for loss computation."""
    B, T = action.shape[:2]
    embed = self.encode(lcd.reshape(B * T, *lcd.shape[2:]),
                        proprio.reshape(B * T, -1)).reshape(B, T, -1)
    posts, priors = self.observe(embed[:, 1:], action[:, :-1], key)
    feat = jnp.concatenate([posts['stoch'], posts['deter']], -1)
    return posts, priors, feat


def step_wrap(mdl, carry, inp):
  emb_t, act_t, k = inp
  post, prior = mdl.obs_step(carry, act_t, emb_t, k[:, 0])
  return post, (post, prior)


def keys_expand(keys, B):
  """(T, 2) keys -> (B, T, 2) broadcast so nn.scan can slice axis 1."""
  return jnp.broadcast_to(keys[None], (B, *keys.shape))


def initial(batch_size):
  return {'mean': jnp.zeros((batch_size, STOCH)),
          'std': jnp.zeros((batch_size, STOCH)),
          'stoch': jnp.zeros((batch_size, STOCH)),
          'deter': jnp.zeros((batch_size, DETER))}


class RSSM(VideoModel):
  def __init__(self, env, G):
    super().__init__(env, G)
    self.module = RSSMModule(G.hidden_size, G.nfilter, self.proprio_n,
                             self.act_n, G.wh_ratio)
    self._init()

  def init_params(self, key):
    T = 4
    lcd = jnp.zeros((1, T, self.G.lcd_base,
                     int(self.G.lcd_base * self.G.wh_ratio)))
    proprio = jnp.zeros((1, T, self.proprio_n))
    action = jnp.zeros((1, T, self.act_n))
    return self.module.init(key, lcd, proprio, action, jax.random.PRNGKey(0))

  def loss_fn(self, params, batch, rng):
    k1, k2 = jax.random.split(rng)
    lcd, proprio, action = batch['lcd'], batch['proprio'], batch['action']
    B, T = action.shape[:2]
    posts, priors, feat = self.module.apply(params, lcd, proprio, action, k1)
    dec = self.module.apply(params, feat.reshape(B * (T - 1), -1),
                            method='decode')
    tgt_lcd = lcd[:, 1:].reshape(B * (T - 1), *lcd.shape[2:])
    tgt_pro = proprio[:, 1:].reshape(B * (T - 1), -1)
    recon_lcd = -dec['lcd'].log_prob(tgt_lcd).mean()
    recon_proprio = -dec['proprio'].log_prob(tgt_pro).mean() / self.proprio_n
    recon = recon_lcd + recon_proprio
    post_d = dists.Normal(posts['mean'], posts['std'], independent=False)
    prior_d = dists.Normal(priors['mean'], priors['std'], independent=False)
    div = jnp.maximum(post_d.kl(prior_d), self.G.free_nats).mean()
    div_loss = self.G.kl_scale * div
    loss = recon + div_loss
    return loss, {'loss/total': loss, 'div_loss': div_loss,
                  'loss/recon_total': recon, 'loss/recon_lcd': recon_lcd,
                  'loss/recon_proprio': recon_proprio}

  def sample(self, key, n, action=None, prompts=None, prompt_n=10, temp=1.0):
    T = self.block_size
    k_act, k_obs, k_img = jax.random.split(key, 3)
    if action is None:
      action = jax.random.uniform(k_act, (n, T, self.act_n),
                                  minval=-1, maxval=1)
    else:
      n = action.shape[0]
    if prompts is None:
      priors = self.module.apply(self.params, action, k_img, method='imagine')
      feat = jnp.concatenate([priors['stoch'], priors['deter']], -1)
      dec = self.module.apply(self.params, feat.reshape(n * T, -1),
                              method='decode')
      lcd = (dec['lcd'].probs > 0.5).astype(jnp.float32)
      return {'lcd': lcd.reshape(n, T, *lcd.shape[1:]),
              'proprio': dec['proprio'].mean.reshape(n, T, -1)}
    # prompted: filter on the prompt then imagine forward
    B = n
    p_lcd = prompts['lcd'][:, :prompt_n]
    p_pro = prompts['proprio'][:, :prompt_n]
    embed = self.module.apply(
        self.params, p_lcd.reshape(B * prompt_n, *p_lcd.shape[2:]),
        p_pro.reshape(B * prompt_n, -1), method='encode'
    ).reshape(B, prompt_n, -1)
    a_shift = jnp.concatenate([jnp.zeros_like(action[:, :1]),
                               action[:, :-1]], 1)
    posts, _ = self.module.apply(self.params, embed, a_shift[:, :prompt_n],
                                 k_obs, method='observe')
    last = jax.tree_util.tree_map(lambda x: x[:, -1], posts)
    priors = self.module.apply(self.params, a_shift[:, prompt_n:], k_img,
                               last, method='imagine')
    feat = jnp.concatenate([priors['stoch'], priors['deter']], -1)
    Trem = T - prompt_n
    dec = self.module.apply(self.params, feat.reshape(n * Trem, -1),
                            method='decode')
    lcd = (dec['lcd'].probs > 0.5).astype(jnp.float32).reshape(
        n, Trem, *p_lcd.shape[2:])
    pro = dec['proprio'].mean.reshape(n, Trem, -1)
    lcd = jnp.concatenate([prompts['lcd'][:, :prompt_n].astype(jnp.float32),
                           lcd], 1)
    pro = jnp.concatenate([prompts['proprio'][:, :prompt_n], pro], 1)
    return {'lcd': lcd, 'proprio': pro}

  def onestep(self, params, batch, i, key, temp=1.0):
    raise NotImplementedError('learned-env serving uses FBT/FRNLD')

"""RSSM: Dreamer-v1-style latent dynamics, `lax.scan` over time
(reference: research/nets/video_models/rssm.py). GRU deter(256) +
Gaussian stoch(64), KL with free nats, conv encoder/decoder.

The time recursion lives outside the flax module (plain lax.scan over
module.apply calls), keeping RNG plumbing simple."""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from research.nets import dists
from research.nets.autoencoders.encoders import (ConvTrunk, DeconvTrunk,
                                                 StateEmbed, StateHead)
from research.nets.video_models._base import VideoModel

STOCH, DETER, EMBED = 64, 256, 256


def initial(batch_size):
  return {'mean': jnp.zeros((batch_size, STOCH)),
          'std': jnp.zeros((batch_size, STOCH)),
          'stoch': jnp.zeros((batch_size, STOCH)),
          'deter': jnp.zeros((batch_size, DETER))}


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

  def encode(self, lcd, proprio):
    emb = self.state_embed(proprio)
    return self.trunk(lcd[..., None], emb)

  def decode(self, feat):
    lcd_logits = self.deconv(feat)[..., 0]
    state = self.state_head(feat)
    return {'lcd': dists.Bernoulli(lcd_logits),
            'proprio': dists.Normal(state, jnp.ones_like(state))}

  def img_step(self, prev, action, key):
    """Prior: advance the recurrent state with the action
    (reference: rssm.py:101-110)."""
    x = jnp.concatenate([prev['stoch'], action], -1)
    x = nn.relu(self.img1(x))
    deter, _ = self.cell(prev['deter'], x)
    h = nn.relu(self.img2(deter))
    mean, std = jnp.split(self.img3(h), 2, -1)
    std = jax.nn.softplus(std) + 0.1
    stoch = mean + std * jax.random.normal(key, mean.shape)
    return {'mean': mean, 'std': std, 'stoch': stoch, 'deter': deter}

  def obs_step(self, prev, action, embed, key):
    """Posterior given the frame embedding (reference: rssm.py:91-99)."""
    k1, k2 = jax.random.split(key)
    prior = self.img_step(prev, action, k1)
    x = jnp.concatenate([prior['deter'], embed], -1)
    h = nn.relu(self.obs1(x))
    mean, std = jnp.split(self.obs2(h), 2, -1)
    std = jax.nn.softplus(std) + 0.1
    stoch = mean + std * jax.random.normal(k2, mean.shape)
    post = {'mean': mean, 'std': std, 'stoch': stoch, 'deter': prior['deter']}
    return post, prior

  def __call__(self, lcd, proprio, action, key):
    """Init-only path touching every submodule."""
    B = action.shape[0]
    emb = self.encode(lcd, proprio)
    post, prior = self.obs_step(initial(B), action, emb, key)
    feat = jnp.concatenate([post['stoch'], post['deter']], -1)
    return self.decode(feat)


def _t(x):
  return jax.tree_util.tree_map(lambda v: jnp.swapaxes(v, 0, 1), x)


class RSSM(VideoModel):
  def __init__(self, env, G):
    super().__init__(env, G)
    self.module = RSSMModule(G.hidden_size, G.nfilter, self.proprio_n,
                             self.act_n, G.wh_ratio)
    self._init()

  def init_params(self, key):
    lcd = jnp.zeros((1, self.G.lcd_base,
                     int(self.G.lcd_base * self.G.wh_ratio)))
    proprio = jnp.zeros((1, self.proprio_n))
    action = jnp.zeros((1, self.act_n))
    return self.module.init(key, lcd, proprio, action, jax.random.PRNGKey(0))

  # -- recurrences (plain scans over module.apply) ----------------------------
  def observe(self, params, embed, action, key, state=None):
    """embed/action (B, T, ...) -> (posts, priors) stacked (B, T, ...)."""
    B, T = action.shape[:2]
    state = initial(B) if state is None else state

    def step(carry, inp):
      emb_t, act_t, k = inp
      post, prior = self.module.apply(params, carry, act_t, emb_t, k,
                                      method='obs_step')
      return post, (post, prior)

    _, (posts, priors) = jax.lax.scan(
        step, state, (_t(embed), _t(action), jax.random.split(key, T)))
    return _t(posts), _t(priors)

  def imagine(self, params, action, key, state=None):
    B, T = action.shape[:2]
    state = initial(B) if state is None else state

    def step(carry, inp):
      act_t, k = inp
      prior = self.module.apply(params, carry, act_t, k, method='img_step')
      return prior, prior

    _, priors = jax.lax.scan(step, state,
                             (_t(action), jax.random.split(key, T)))
    return _t(priors)

  def loss_fn(self, params, batch, rng):
    """Recon + free-nats KL (reference: rssm.py:44-68)."""
    k1, _ = jax.random.split(rng)
    lcd, proprio, action = batch['lcd'], batch['proprio'], batch['action']
    B, T = action.shape[:2]
    embed = self.module.apply(
        params, lcd.reshape(B * T, *lcd.shape[2:]),
        proprio.reshape(B * T, -1), method='encode').reshape(B, T, -1)
    posts, priors = self.observe(params, embed[:, 1:], action[:, :-1], k1)
    feat = jnp.concatenate([posts['stoch'], posts['deter']], -1)
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

  def _decode_seq(self, feat, n, T):
    dec = self.module.apply(self.params, feat.reshape(n * T, -1),
                            method='decode')
    lcd = (dec['lcd'].probs > 0.5).astype(jnp.float32)
    return {'lcd': lcd.reshape(n, T, *lcd.shape[1:]),
            'proprio': dec['proprio'].mean.reshape(n, T, -1)}

  def sample(self, key, n, action=None, prompts=None, prompt_n=10, temp=1.0):
    """Observe the prompt, then imagine (reference: rssm.py:123-151)."""
    T = self.block_size
    k_act, k_obs, k_img = jax.random.split(key, 3)
    if action is None:
      action = jax.random.uniform(k_act, (n, T, self.act_n),
                                  minval=-1, maxval=1)
    else:
      n = action.shape[0]
    if prompts is None:
      priors = self.imagine(self.params, action, k_img)
      feat = jnp.concatenate([priors['stoch'], priors['deter']], -1)
      return self._decode_seq(feat, n, T)
    p_lcd = prompts['lcd'][:, :prompt_n].astype(jnp.float32)
    p_pro = prompts['proprio'][:, :prompt_n]
    B = n
    embed = self.module.apply(
        self.params, p_lcd.reshape(B * prompt_n, *p_lcd.shape[2:]),
        p_pro.reshape(B * prompt_n, -1), method='encode'
    ).reshape(B, prompt_n, -1)
    a_shift = jnp.concatenate([jnp.zeros_like(action[:, :1]),
                               action[:, :-1]], 1)
    posts, _ = self.observe(self.params, embed, a_shift[:, :prompt_n], k_obs)
    last = jax.tree_util.tree_map(lambda x: x[:, -1], posts)
    priors = self.imagine(self.params, a_shift[:, prompt_n:], k_img, last)
    feat = jnp.concatenate([priors['stoch'], priors['deter']], -1)
    gen = self._decode_seq(feat, n, T - prompt_n)
    lcd = jnp.concatenate([p_lcd, gen['lcd']], 1)
    pro = jnp.concatenate([p_pro, gen['proprio']], 1)
    return {'lcd': lcd, 'proprio': pro}

  def onestep(self, params, batch, i, key, temp=1.0):
    raise NotImplementedError('learned-env serving uses FBT/FRNLD')

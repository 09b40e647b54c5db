"""Latent quantizers (reference: research/nets/quantize.py).

Functional jnp versions: straight-through estimators expressed with
stop_gradient, RNG threaded explicitly.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

sg = jax.lax.stop_gradient


def binary_quantize(z_logits, key, noise=True):
  """Bernoulli sample with straight-through probs (reference: quantize.py:55-68).

  Returns (z_q, entropy_mean, probs). noise=False gives the deterministic
  probs>0.5 mode used at encode/serve time.
  """
  probs = jax.nn.sigmoid(z_logits)
  # logit-space entropy: H = p*softplus(-l) + (1-p)*softplus(l). The naive
  # p*log(p) form NaNs on TPU once sigmoid saturates (observed at |l| ~ 18).
  entropy = (probs * jax.nn.softplus(-z_logits)
             + (1 - probs) * jax.nn.softplus(z_logits)).mean()
  if noise:
    sample = (jax.random.uniform(key, z_logits.shape) < probs).astype(jnp.float32)
  else:
    sample = (probs > 0.5).astype(jnp.float32)
  z_q = sg(sample) + probs - sg(probs)  # straight-through
  return z_q, entropy, probs


def rnld(z, key, noise=True, noise_level=0.25):
  """Real-Number-Line Discretization: 4 bins over tanh(z) with straight-through
  (reference: quantize.py:17-53). Returns (z_q, idxs)."""
  z = jnp.tanh(z)
  if noise:
    zn = z + noise_level * (2 * jax.random.uniform(key, z.shape) - 1)
  else:
    zn = z
  z_q = jnp.where(zn < -0.5, -0.75,
                  jnp.where(zn < 0.0, -0.25, jnp.where(zn < 0.5, 0.25, 0.75)))
  z_q = sg(z_q) + z - sg(z)
  idxs = jnp.where(zn < -0.5, 0,
                   jnp.where(zn < 0.0, 1, jnp.where(zn < 0.5, 2, 3)))
  return z_q, idxs


class VectorQuantizer(nn.Module):
  """Classic VQ-VAE codebook (reference: quantize.py:70-106)."""
  K: int
  D: int
  beta: float

  @nn.compact
  def __call__(self, z):
    emb = self.param('embedding', nn.initializers.uniform(scale=2.0 / self.K),
                     (self.K, self.D))
    flat = z.reshape(-1, self.D)
    d = ((flat ** 2).sum(-1, keepdims=True) + (emb ** 2).sum(-1)
         - 2 * flat @ emb.T)
    idx = jnp.argmin(d, -1)
    z_q = emb[idx].reshape(z.shape)
    loss = ((sg(z_q) - z) ** 2).mean() + self.beta * ((z_q - sg(z)) ** 2).mean()
    z_q = z + sg(z_q - z)
    onehot = jax.nn.one_hot(idx, self.K)
    e_mean = onehot.mean(0)
    perplexity = jnp.exp(-(e_mean * jnp.log(e_mean + 1e-10)).sum())
    return loss, z_q, perplexity, idx.reshape(z.shape[:-1])

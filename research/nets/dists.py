"""Minimal distribution toolkit in jnp.

Replaces torch.distributions usage across the reference model stack
(Bernoulli/Normal/MultivariateNormal-diag/Mixture/Categorical) with small
stateless classes whose log_prob/sample/mean are jit-friendly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


class Bernoulli:
  """Independent Bernoulli over the trailing dims, parameterized by logits."""

  def __init__(self, logits):
    self.logits = logits

  @property
  def probs(self):
    return jax.nn.sigmoid(self.logits)

  def log_prob(self, x):
    # -softplus(-l)*x - softplus(l)*(1-x), numerically stable
    return -jnp.maximum(self.logits, 0) + self.logits * x \
        - jnp.log1p(jnp.exp(-jnp.abs(self.logits)))

  def sample(self, key, temp=1.0):
    u = jax.random.uniform(key, self.logits.shape)
    return (u < jax.nn.sigmoid(self.logits / temp)).astype(jnp.float32)

  def entropy(self):
    # logit-space form; stable where sigmoid saturates (TPU)
    p = self.probs
    return p * jax.nn.softplus(-self.logits) \
        + (1 - p) * jax.nn.softplus(self.logits)

  @property
  def mode(self):
    return (self.probs > 0.5).astype(jnp.float32)


class Normal:
  """Diagonal Gaussian; log_prob sums over the final axis if `independent`."""

  def __init__(self, mean, std, independent=True):
    self.mean = mean
    self.std = std
    self.independent = independent

  def log_prob(self, x):
    lp = -0.5 * (((x - self.mean) / self.std) ** 2
                 + 2 * jnp.log(self.std) + jnp.log(2 * jnp.pi))
    return lp.sum(-1) if self.independent else lp

  def sample(self, key):
    return self.mean + self.std * jax.random.normal(key, self.mean.shape)

  def kl(self, other):
    return (jnp.log(other.std / self.std)
            + (self.std ** 2 + (self.mean - other.mean) ** 2)
            / (2 * other.std ** 2) - 0.5)

  def entropy(self):
    return 0.5 * (1 + jnp.log(2 * jnp.pi)) + jnp.log(self.std)


class Categorical:
  def __init__(self, logits):
    self.logits = logits

  @property
  def probs(self):
    return jax.nn.softmax(self.logits, -1)

  def log_prob(self, x):
    """x: integer class indices."""
    logp = jax.nn.log_softmax(self.logits, -1)
    return jnp.take_along_axis(logp, x[..., None].astype(jnp.int32),
                               -1).squeeze(-1)

  def sample(self, key, temp=1.0):
    return jax.random.categorical(key, self.logits / temp, -1)

  def entropy(self):
    logp = jax.nn.log_softmax(self.logits, -1)
    return -(jnp.exp(logp) * logp).sum(-1)


class MixtureOfGaussians:
  """MDN: mixture over k diagonal Gaussians (reference: common.py:93-112)."""

  def __init__(self, logits, means, stds):
    """logits (..., k); means/stds (..., k, d)."""
    self.logits = logits
    self.means = means
    self.stds = stds

  def log_prob(self, x):
    comp_lp = -0.5 * (((x[..., None, :] - self.means) / self.stds) ** 2
                      + 2 * jnp.log(self.stds) + jnp.log(2 * jnp.pi))
    comp_lp = comp_lp.sum(-1)                            # (..., k)
    mix_lp = jax.nn.log_softmax(self.logits, -1)
    return jax.scipy.special.logsumexp(comp_lp + mix_lp, -1)

  def sample(self, key):
    k1, k2 = jax.random.split(key)
    idx = jax.random.categorical(k1, self.logits, -1)    # (...,)
    mean = jnp.take_along_axis(self.means, idx[..., None, None], -2).squeeze(-2)
    std = jnp.take_along_axis(self.stds, idx[..., None, None], -2).squeeze(-2)
    return mean + std * jax.random.normal(k2, mean.shape)

  @property
  def mean(self):
    w = jax.nn.softmax(self.logits, -1)
    return (w[..., None] * self.means).sum(-2)

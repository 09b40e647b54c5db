"""Shared conv encoder/decoder trunks used by VAE/Arbiter/ObjectLocalizer.

The reference repeats this stride-2 x3 conv + ResBlock trunk in several files
(vae.py:50-90, arbiter.py:48-83, object_localizer.py:40-69); here it is one
module. NHWC layout.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from research.nets.common import ResBlock


class StateEmbed(nn.Module):
  hidden_size: int

  @nn.compact
  def __call__(self, proprio):
    n = self.hidden_size
    x = nn.relu(nn.Dense(n)(proprio))
    x = nn.relu(nn.Dense(n)(x))
    return nn.Dense(n)(x)


class ConvTrunk(nn.Module):
  """3x stride-2 conv + ResBlock, proprio-conditioned; -> flat feature."""
  hidden_size: int
  nfilter: int
  out_size: int
  in_channels: int = 1

  @nn.compact
  def __call__(self, x, emb):
    nf = self.nfilter
    for _ in range(3):
      x = nn.Conv(nf, (3, 3), strides=(2, 2), padding='SAME')(x)
      x = ResBlock(nf, self.hidden_size, group_size=4)(x, emb)
    x = x.reshape(x.shape[0], -1)
    return nn.Dense(self.out_size)(x)


class DeconvTrunk(nn.Module):
  """flat latent -> (H, W, out_channels) logits, H=16*k via the ConvBinHead
  geometry (1x1 -> (4, 4*ratio) -> x2 -> x2)."""
  nfilter: int
  wh_ratio: float
  out_channels: int = 1

  @nn.compact
  def __call__(self, z):
    nf = self.nfilter
    first_kernel = int(self.wh_ratio * 4)
    x = z.reshape(z.shape[0], 1, 1, -1)
    # VALID padding: 1x1 -> (4, 4*ratio) expansion (SAME would collapse to 2x2)
    x = nn.ConvTranspose(nf, (4, first_kernel), strides=(2, 2),
                         padding='VALID')(x)
    x = nn.relu(x)
    x = nn.ConvTranspose(nf, (4, 4), strides=(2, 2), padding='SAME')(x)
    x = nn.relu(x)
    x = nn.Conv(nf, (3, 3), padding='SAME')(x)
    x = nn.relu(x)
    return nn.ConvTranspose(self.out_channels, (4, 4), strides=(2, 2),
                            padding='SAME')(x)


class StateHead(nn.Module):
  hidden_size: int
  out_n: int

  @nn.compact
  def __call__(self, z):
    n = self.hidden_size
    x = nn.relu(nn.Dense(n)(z))
    x = nn.relu(nn.Dense(n)(x))
    return nn.Dense(self.out_n)(x)

"""Fiddler: latent-space sensitivity probe (reference:
research/runners/fiddler.py) — perturb each proprio dim, re-encode, rank
latent dims by variance sensitivity; pickles vec_weights.pkl."""
from __future__ import annotations

import pickle
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from boxlcd_tpu.data import load_ds


class Fiddler:
  def __init__(self, model, env, G):
    self.model = model
    self.env = env
    self.G = G

  def run(self, n_perturb=16, eps=0.2):
    G = self.G
    _, test_ds = load_ds(G)
    batch = next(iter(test_ds))
    flat = {k: jnp.asarray(v.reshape(-1, *v.shape[2:]))
            for k, v in batch.items() if k != 'action'}
    base_z = np.asarray(self.model.encode(self.model.params, flat,
                                          noise=False))
    P = flat['proprio'].shape[-1]
    sens = np.zeros((P, base_z.shape[-1]))
    key = jax.random.PRNGKey(0)
    for d in range(P):
      key, k = jax.random.split(key)
      noise = eps * jax.random.normal(k, (flat['proprio'].shape[0],))
      pert = dict(flat)
      pert['proprio'] = flat['proprio'].at[:, d].add(noise)
      z = np.asarray(self.model.encode(self.model.params, pert, noise=False))
      sens[d] = np.abs(z - base_z).mean(0).reshape(-1)
    weights = sens / (sens.sum(0, keepdims=True) + 1e-8)
    out = Path(G.logdir)
    out.mkdir(parents=True, exist_ok=True)
    with open(out / 'vec_weights.pkl', 'wb') as f:
      pickle.dump({'sensitivity': sens, 'weights': weights}, f)
    print('top latent dims per proprio dim:')
    for d in range(P):
      print(f'  dim {d}: {np.argsort(-sens[d])[:5].tolist()}')
    return weights

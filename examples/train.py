"""Minimal end-to-end pipeline: load rollouts, train the mini GPT, sample
(reference: examples/train.py)."""
import argparse

import jax
import jax.numpy as jnp
import numpy as np

import boxlcd_tpu
from boxlcd_tpu.utils import AttrDict
from examples.model import Model


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--env', default='Bounce')
  parser.add_argument('--data', default='rollouts.npz')
  parser.add_argument('--epochs', type=int, default=10)
  parser.add_argument('--bs', type=int, default=32)
  parser.add_argument('--lr', type=float, default=5e-4)
  parser.add_argument('--window', type=int, default=50)
  args = parser.parse_args()

  env = boxlcd_tpu.env_map[args.env]()
  G = AttrDict(n_embed=128, n_head=4, n_layer=2, window=args.window,
               lr=args.lr)
  model = Model(env, G)
  data = dict(np.load(args.data))
  n = data['lcd'].shape[0]
  rng = np.random.RandomState(0)
  for epoch in range(args.epochs):
    order = rng.permutation(n)
    losses = []
    for i in range(0, n - args.bs + 1, args.bs):
      idx = order[i:i + args.bs]
      batch = {'lcd': jnp.asarray(data['lcd'][idx, :args.window], jnp.float32),
               'action': jnp.asarray(data['action'][idx, :args.window])}
      m = model.train_step(batch)
      losses.append(m['bits_per_dim'])
    print(f'epoch {epoch}: bits/dim {np.mean(losses):.4f}')
  samp = model.sample(jax.random.PRNGKey(0), 4,
                      jnp.asarray(data['action'][:4, :args.window]))
  print('sample shape', samp.shape)


if __name__ == '__main__':
  main()

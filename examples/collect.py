"""Collect N rollouts into a single npz (reference: examples/collect.py) —
but batched on device instead of a Python loop."""
import argparse
from pathlib import Path

import jax
import numpy as np

import boxlcd_tpu
from boxlcd_tpu.data.collect import make_rollout_fn


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--env', default='Bounce')
  parser.add_argument('--num_eps', type=int, default=1000)
  parser.add_argument('--out', default='rollouts.npz')
  parser.add_argument('--batch', type=int, default=250)
  args = parser.parse_args()

  env = boxlcd_tpu.env_map[args.env]()
  fn, T = make_rollout_fn(env)
  jfn = jax.jit(fn, static_argnums=1)
  key = jax.random.PRNGKey(0)
  chunks = []
  done = 0
  while done < args.num_eps:
    b = min(args.batch, args.num_eps - done)
    key, sub = jax.random.split(key)
    chunks.append(jax.tree_util.tree_map(np.asarray, jfn(sub, b)))
    done += b
    print(f'{done}/{args.num_eps}')
  traj = jax.tree_util.tree_map(lambda *xs: np.concatenate(xs), *chunks)
  np.savez_compressed(args.out, **traj)
  print('saved', args.out, {k: v.shape for k, v in traj.items()})


if __name__ == '__main__':
  main()

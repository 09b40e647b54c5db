"""Generate demo gifs of each env under random actions (reference:
research/scripts/evaluations/{demo_imgs,lcd_wave,viz}.py — the repo's media
makers)."""
from __future__ import annotations

import argparse
from pathlib import Path

import jax
import numpy as np

import boxlcd_tpu
from boxlcd_tpu.envs.env import Env
from research.utils import write_gif


def rollout_frames(env, key, steps):
  def step(carry, k):
    state = carry
    act = jax.random.uniform(k, (env.act_size,), minval=-1, maxval=1)
    nstate, obs, *_ = Env.step(env, state, act)
    return nstate, obs['lcd']

  k_reset, k_run = jax.random.split(key)
  state = Env.reset(env, k_reset)
  _, lcds = jax.lax.scan(step, state, jax.random.split(k_run, steps))
  return np.asarray(lcds, np.float32)


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--envs', default='Dropbox,Bounce,Urchin,Luxo')
  parser.add_argument('--outdir', default='logs/demos')
  parser.add_argument('--steps', type=int, default=50)
  args = parser.parse_args()
  out = Path(args.outdir)
  out.mkdir(parents=True, exist_ok=True)
  for name in args.envs.split(','):
    env = boxlcd_tpu.env_map[name]()
    frames = jax.jit(lambda k: rollout_frames(env, k, args.steps))(
        jax.random.PRNGKey(0))
    path = write_gif(out / f'{name}.gif', frames)
    print('wrote', path)


if __name__ == '__main__':
  main()

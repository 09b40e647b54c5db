"""Scripted-control example (reference: examples/less_basic.py drives the env
with keyboard input; headless here — actions come from a simple script or an
action file, and frames are written as a gif)."""
import argparse

import numpy as np

import boxlcd_tpu
from research.utils import write_gif


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--env', default='Luxo')
  parser.add_argument('--steps', type=int, default=100)
  parser.add_argument('--actions', default='',
                      help='npy file of (T, act_size) actions; default sine sweep')
  parser.add_argument('--out', default='less_basic.gif')
  args = parser.parse_args()

  env = boxlcd_tpu.env_map[args.env]()
  env.seed(0)
  env.reset()
  if args.actions:
    acts = np.load(args.actions)
  else:
    t = np.arange(args.steps)[:, None]
    phase = np.arange(env.act_size)[None, :]
    acts = np.sin(0.3 * t + 2.0 * phase).astype(np.float32)
  frames = []
  for i in range(args.steps):
    obs, rew, done, info = env.step(acts[i % len(acts)])
    frames.append(1.0 - obs['lcd'])
  path = write_gif(args.out, np.stack(frames))
  print('wrote', path)


if __name__ == '__main__':
  main()

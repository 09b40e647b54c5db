"""LCD-wave demo gif: a rolling episode whose frame sweeps from the pretty
high-res RGB render to the tiny LCD render, column by column (reference:
research/scripts/evaluations/lcd_wave.py:47-81 — the repo's marquee gif).

Headless re-architecture: frames come from the batched on-device renderers
(render/raster.py rgb_render + lcd_render) on a functional scan rollout —
no pyglet window required.

Usage:
  python -m research.scripts.lcd_wave [--env=UrchinBall --steps=120 \
      --outdir=logs/figs]
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax
import numpy as np

import boxlcd_tpu
from boxlcd_tpu.envs.env import Env
from boxlcd_tpu.render import raster
from research.utils import write_gif


def rollout_poses(env, key, steps):
  """(T, n, 2) positions + (T, n) angles + (n,) is_circle from one episode."""
  def step(carry, k):
    state = carry
    act = jax.random.uniform(k, (env.act_size,), minval=-1, maxval=1)
    nstate, *_ = Env.step(env, state, act)
    return nstate, (nstate.c, nstate.a)

  k0, k1 = jax.random.split(key)
  state = Env.reset(env, k0)
  _, (c, a) = jax.lax.scan(step, state, jax.random.split(k1, steps))
  return state.is_circle, c, a


def main(argv=None):
  parser = argparse.ArgumentParser()
  parser.add_argument('--env', default='UrchinBall')
  parser.add_argument('--steps', type=int, default=120)
  parser.add_argument('--outdir', default='logs/figs')
  parser.add_argument('--seed', type=int, default=7)
  parser.add_argument('--fps', type=int, default=30)
  args = parser.parse_args(argv)

  env = boxlcd_tpu.env_map[args.env]()
  W, H = env.lcd_w, env.lcd_h
  up = 256 // W  # pretty render upscale so both renders share pixel dims
  ic, c, a = jax.jit(
      lambda k: rollout_poses(env, k, args.steps))(
          jax.random.PRNGKey(args.seed))

  pretty = jax.jit(jax.vmap(lambda cc, aa: raster.rgb_render(
      env.spec, ic, cc, aa, W * up, H * up)))(c, a)
  lcd = jax.jit(jax.vmap(lambda cc, aa: raster.lcd_render(
      env.spec, ic, cc, aa, W, H)))(c, a)
  pretty = np.asarray(pretty, np.float32) / 255.0            # (T, H*, W*, 3)
  lcd = np.asarray(lcd, np.float32)[..., None].repeat(3, -1)
  lcd = lcd.repeat(up, 1).repeat(up, 2)                      # match pretty

  frames = []
  full = W * up
  for i in range(args.steps):
    # the wave: LCD takes over from the left as the episode progresses
    # (reference lcd_wave.py:60-64)
    idx = int(np.clip(0.9 * up * (i - 10), 0, full))
    if idx >= full:
      frame = np.concatenate([lcd[i], np.zeros_like(lcd[i])[:, :2]], 1)
    else:
      frame = np.concatenate(
          [lcd[i][:, :idx], np.zeros_like(lcd[i])[:, :2],
           pretty[i][:, -(full - idx):]], 1)
    frames.append(frame)

  out = Path(args.outdir)
  out.mkdir(parents=True, exist_ok=True)
  # write_gif expects grayscale (T,H,W); RGB path via PIL directly
  from PIL import Image
  imgs = [Image.fromarray((255 * f).astype(np.uint8)) for f in frames]
  path = out / f'{args.env}_wave.gif'
  imgs[0].save(path, save_all=True, append_images=imgs[1:],
               duration=int(1000 / args.fps), loop=0)
  print('wrote', path)


if __name__ == '__main__':
  main()

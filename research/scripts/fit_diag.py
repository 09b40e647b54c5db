"""FIT-collapse adjudication probe (VERDICT r3 weak #3).

FIT (reference flat_itoken.py) is frame-level AR with a FACTORIZED Bernoulli
pixel head: every pixel of a frame is sampled independently given history
(flat_itoken.py:111-112). Hypothesis: the robot-env FVD collapse (~80 vs
FBT's ~1) is this design's sampling incoherence — not a port bug — because
teacher-forced one-step predictions are fine and pixel metrics (SSIM/PSNR)
sit near FBT's; only the feature-space FVD (sensitive to within-frame
coherence) explodes.

Measures, on fresh real rollouts:
  1. teacher-forced one-step next-frame quality (log-prob/pixel, accuracy,
     predictive entropy) — is the LEARNED MODEL good?
  2. sample coherence: isolated-on-pixel fraction (8-neighborhood) of
     FIT samples vs FBT samples vs REAL frames — does independent pixel
     sampling speckle the frames?
  3. a truth/FIT/FBT sample strip PNG for eyeballing.

Usage:
  python -m research.scripts.fit_diag --env=Urchin \
      --fitdir=/root/work/mtable/Urchin/FIT --fbtdir=/root/work/mtable/Urchin/FBT
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

import boxlcd_tpu
from boxlcd_tpu.envs.env import Env
from research.nets import net_map
from research.nets._base import Net


def real_batch(env, key, B, T):
  def one(k):
    def body(carry, kk):
      st = carry
      a = jax.random.uniform(kk, (env.act_size,), minval=-1., maxval=1.)
      nst, obs, *_ = Env.step(env, st, a)
      return nst, (obs['lcd'].astype(jnp.float32), obs['proprio'], a)
    k0, k1 = jax.random.split(k)
    st = Env.reset(env, k0)
    _, (lcd, pro, act) = jax.lax.scan(body, st, jax.random.split(k1, T))
    return {'lcd': lcd, 'proprio': pro, 'action': act}
  return jax.jit(jax.vmap(one))(jax.random.split(key, B))


def isolated_frac(frames):
  """Fraction of ON pixels (ink = 0 in lcd convention -> use 1-lcd) with no
  ON 8-neighbor — pure speckle."""
  on = 1.0 - np.asarray(frames)                    # ink = 1
  on = (on > 0.5).astype(np.float32)
  pad = np.pad(on, [(0, 0), (1, 1), (1, 1)])
  neigh = np.zeros_like(on)
  for dy in (-1, 0, 1):
    for dx in (-1, 0, 1):
      if dy == dx == 0:
        continue
      neigh += pad[:, 1 + dy:on.shape[1] + 1 + dy,
                   1 + dx:on.shape[2] + 1 + dx]
  iso = (on > 0) & (neigh == 0)
  denom = max(on.sum(), 1.0)
  return float(iso.sum() / denom)


def main(argv=None):
  parser = argparse.ArgumentParser()
  parser.add_argument('--env', default='Urchin')
  parser.add_argument('--fitdir', required=True)
  parser.add_argument('--fbtdir', default='')
  parser.add_argument('--B', type=int, default=16)
  parser.add_argument('--outdir', default='logs/figs')
  args = parser.parse_args(argv)

  env = boxlcd_tpu.env_map[args.env]()
  mG = Net.load_config(args.fitdir, 'FIT')
  T = int(mG.window)
  batch = real_batch(env, jax.random.PRNGKey(0), args.B, T)
  batch = jax.tree_util.tree_map(np.asarray, batch)

  fit = net_map['FIT'](env, mG)
  fit.load(args.fitdir)

  # --- 1. teacher-forced one-step quality
  from research.nets import dists
  lcd = jnp.asarray(batch['lcd'].reshape(args.B, T, -1))
  logits = fit.module.apply(fit.params, lcd, jnp.asarray(batch['action']))
  d = dists.Bernoulli(logits)
  lp = float(d.log_prob(lcd).mean())
  prob = jax.nn.sigmoid(logits)
  acc = float(((prob > 0.5) == (lcd > 0.5)).mean())
  ent = float((-prob * jnp.log(jnp.clip(prob, 1e-8))
               - (1 - prob) * jnp.log(jnp.clip(1 - prob, 1e-8))).mean())
  print(f'== FIT teacher-forced (B={args.B}, T={T}) ==')
  print(f'log-prob/pixel {lp:.4f}  pixel acc {acc:.4f}  '
        f'pred entropy/pixel {ent:.4f} nats')

  # --- 2. sample coherence
  prompts = {'lcd': jnp.asarray(batch['lcd'])}
  fs = fit.sample(jax.random.PRNGKey(1), args.B,
                  action=jnp.asarray(batch['action']), prompts=prompts,
                  prompt_n=3)
  fit_frames = np.asarray(fs['lcd']).reshape(-1, env.lcd_h, env.lcd_w)[
      args.B * 3:]
  real_frames = batch['lcd'].reshape(-1, env.lcd_h, env.lcd_w)
  print('isolated-pixel fraction: real %.4f  FIT %.4f'
        % (isolated_frac(real_frames), isolated_frac(fit_frames)))
  rows = [batch['lcd'][0], np.asarray(fs['lcd'][0])]
  if args.fbtdir:
    bG = Net.load_config(args.fbtdir, 'FBT')
    fbt = net_map['FBT'](env, bG)
    fbt.load(args.fbtdir)
    bs = fbt.sample(jax.random.PRNGKey(1), args.B,
                    action=jnp.asarray(batch['action']),
                    prompts={k: jnp.asarray(v) for k, v in batch.items()
                             if k != 'action'}, prompt_n=3)
    fbt_frames = np.asarray(bs['lcd']).reshape(
        -1, env.lcd_h, env.lcd_w)[args.B * 3:]
    print('isolated-pixel fraction: FBT %.4f' % isolated_frac(fbt_frames))
    rows.append(np.asarray(bs['lcd'][0]).reshape(T, env.lcd_h, env.lcd_w))

  # --- 3. strip PNG: truth / FIT / (FBT)
  cols = []
  for i in range(0, min(T, 20)):
    col = []
    for r in rows:
      col += [r[i], np.zeros_like(r[i][:1])]
    cols.append(np.concatenate(col[:-1], 0)[..., None].repeat(3, -1))
    cols.append(np.zeros_like(cols[-1][:, :1]))
  img = np.concatenate(cols[:-1], 1).repeat(8, 0).repeat(8, 1)
  out = Path(args.outdir)
  out.mkdir(parents=True, exist_ok=True)
  from PIL import Image
  p = out / f'{args.env}_fit_diag.png'
  Image.fromarray((255 * np.clip(img, 0, 1)).astype(np.uint8)).save(p)
  print('wrote', p)


if __name__ == '__main__':
  main()

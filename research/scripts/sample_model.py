"""Prompted-sample figure: truth row / sample row / error row as one PNG
(reference: research/scripts/evaluations/sample_model.py:39-70 — roll a real
episode under seeded random actions, prompt the model with the first frame,
sample the rest, and save a side-by-side frame strip with the prompt boundary
marked).

Usage:
  python -m research.scripts.sample_model --env=Urchin --model=FBT \
      --weightdir=<trained model dir> [--outdir=logs/figs --frames=20]
"""
from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

import boxlcd_tpu
from boxlcd_tpu.envs.env import Env
from research.main import parse_flags
from research.nets import net_map
from research.nets._base import Net


def real_rollout(env, key, T):
  """(1, T) batch of {lcd, proprio, action} from the real sim, jitted."""
  def body(carry, k):
    state = carry
    act = jax.random.uniform(k, (env.act_size,), minval=-1., maxval=1.)
    nstate, obs, *_ = Env.step(env, state, act)
    return nstate, (obs['lcd'].astype(jnp.float32), obs['proprio'], act)

  k0, k1 = jax.random.split(key)
  state = Env.reset(env, k0)
  _, (lcd, pro, act) = jax.lax.scan(body, state, jax.random.split(k1, T))
  return {'lcd': lcd[None], 'proprio': pro[None], 'action': act[None]}


def frame_strip(truth, pred, prompt_n, frames):
  """(T,H,W) x2 -> one RGB strip image: truth / sample / error stacked, one
  column per frame, red separator at the prompt boundary (reference
  sample_model.py:55-69)."""
  cols = []
  for i in range(min(frames, truth.shape[0])):
    t, x = truth[i], pred[i]
    err = (t - x + 1.0) / 2.0
    blank = np.zeros_like(x)[:1]
    col = np.concatenate([t, blank, x, blank, err], 0)[..., None].repeat(3, -1)
    cols.append(col)
    sep = np.zeros_like(col)[:, :1]
    if i == prompt_n - 1:
      sep[..., 0] = 1.0  # red: everything right of this is sampled
    cols.append(sep)
  img = np.concatenate(cols[:-1], 1).repeat(8, 0).repeat(8, 1)
  return np.clip(img, 0, 1)


def main(argv=None):
  argv = list(sys.argv[1:] if argv is None else argv)
  outdir, frames, prompt_n, seed = Path('logs/figs'), 20, 1, 7
  keep = []
  for a in argv:
    if a.startswith('--outdir='):
      outdir = Path(a.split('=', 1)[1])
    elif a.startswith('--frames='):
      frames = int(a.split('=', 1)[1])
    elif a.startswith('--fig_prompt_n='):
      prompt_n = int(a.split('=', 1)[1])
    elif a.startswith('--fig_seed='):
      seed = int(a.split('=', 1)[1])
    else:
      keep.append(a)
  G, env = parse_flags(keep)

  # roll the real episode BEFORE constructing the model (net construction
  # traces jitted helpers against the env; see model_probe.py note)
  mG = Net.load_config(G.weightdir, G.model)
  T = int(mG.window)
  batch = jax.jit(lambda k: real_rollout(env, k, T))(jax.random.PRNGKey(seed))
  batch = jax.tree_util.tree_map(np.asarray, batch)

  model = net_map[G.model](env, mG)
  model.load(G.weightdir)
  print(f'LOADED {G.model} from {G.weightdir}')

  prompts = {k: jnp.asarray(v) for k, v in batch.items() if k != 'action'}
  sample = model.sample(jax.random.PRNGKey(seed + 1), 1,
                        action=jnp.asarray(batch['action']),
                        prompts=prompts, prompt_n=prompt_n)
  truth = np.asarray(batch['lcd'][0], np.float32)
  pred = np.asarray(sample['lcd']).reshape(truth.shape)
  img = frame_strip(truth, pred, prompt_n, frames)

  outdir.mkdir(parents=True, exist_ok=True)
  path = outdir / f'{G.env}_frames.png'
  from PIL import Image
  Image.fromarray((255 * img).astype(np.uint8)).save(path)
  print('wrote', path)


if __name__ == '__main__':
  main()

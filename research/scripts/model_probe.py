"""Error-budget probe for the dream-env stack: how accurate are the BVAE
decode and the FBT one-step prediction relative to the body-goal success
threshold (G.goal_thresh, default 0.05 in normalized obs units)?

Measures, on freshly rolled real trajectories:
  1. BVAE encode->decode proprio error (per-dim RMS + the reward's
     mean|delta| over the body-goal dims `bidx`),
  2. FBT teacher-forced one-step proprio error at the same dims,
  3. action sensitivity: |prediction(a) - prediction(-a)| at the root dims
     (does the dream respond to actions at all?).

Usage:
  python -m research.scripts.model_probe ppo --env=Luxo \
      --weightdir=<FBT dir> [--probe_T=25 --probe_B=64]
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from research.rl.main import parse


def main(argv=None):
  argv = list(sys.argv[1:] if argv is None else argv)
  T, B = 25, 64
  keep = []
  for a in argv:
    if a.startswith('--probe_T='):
      T = int(a.split('=', 1)[1])
    elif a.startswith('--probe_B='):
      B = int(a.split('=', 1)[1])
    else:
      keep.append(a)
  G = parse(keep)

  # fresh functional env (same construction as data collection) + frozen FBT
  import boxlcd_tpu
  from boxlcd_tpu.envs.env import Env as _Env
  from boxlcd_tpu import utils
  from research.nets import net_map
  from research.nets._base import Net
  raw = boxlcd_tpu.env_map[G.env](G)
  keys_xy = utils.filtlist(raw.pobs_keys, '.*(x|y):p')
  bidx = np.asarray([raw.pobs_keys.index(x) for x in keys_xy])

  # --- roll a real batch: (B, T) of (lcd, proprio, action)
  # NOTE: roll BEFORE constructing the model — net construction traces
  # jitted helpers against the env and a leaked tracer on the env object
  # poisons any later trace that closes over it
  def rollout(key):
    k0, k1 = jax.random.split(key)
    s = _Env.reset(raw, k0)

    def body(carry, k):
      s = carry
      a = jax.random.uniform(k, (raw.act_size,), minval=-1, maxval=1)
      s2 = _Env.step(raw, s, a)[0]
      obs = _Env.observe(raw, s2)
      return s2, (obs['lcd'].astype(jnp.float32), obs['proprio'], a)
    _, (lcd, pro, act) = jax.lax.scan(body, s, jax.random.split(k1, T))
    return {'lcd': lcd, 'proprio': pro, 'action': act}

  batch = jax.jit(jax.vmap(rollout))(
      jax.random.split(jax.random.PRNGKey(int(G.seed) + 123), B))
  np.asarray(batch['lcd'])

  mG = Net.load_config(G.weightdir, 'FBT')
  model = net_map['FBT'](raw, mG)
  model.load(G.weightdir)
  bvae = model.bvae
  W = int(mG.window)

  # --- 1. BVAE decode error
  z = bvae.encode(bvae.params, batch, noise=False)
  dec = bvae.decode(bvae.params, z.reshape(-1, z.shape[-1]))
  true_pro = np.asarray(batch['proprio']).reshape(B * T, -1)
  dec_pro = np.asarray(dec['proprio'].mean).reshape(B * T, -1)
  err = dec_pro - true_pro
  print('== BVAE decode (B*T={} frames) =='.format(B * T))
  print('per-dim RMS:', np.round(np.sqrt((err ** 2).mean(0)), 4))
  print('bidx dims:', bidx, '-> RMS', np.round(np.sqrt(
      (err[:, bidx] ** 2).mean()), 4))
  mad = np.abs(err[:, bidx]).mean(-1)
  print('reward-style mean|delta| over bidx: mean={:.4f} p50={:.4f} '
        'p90={:.4f} (goal_thresh={})'.format(
            mad.mean(), np.median(mad), np.percentile(mad, 90),
            G.goal_thresh))
  print('frac frames with decode-delta alone < thresh: {:.3f}'.format(
      (mad < G.goal_thresh).mean()))

  # --- 2. FBT teacher-forced one-step error at frame i (mid-window)
  i = min(W - 1, T - 1) // 2 + 1
  wb = {k: jnp.asarray(v[:, :W]) for k, v in batch.items()}
  if T < W:
    print(f'(probe_T={T} < window={W}; padding)')
    wb = {k: jnp.concatenate(
        [v, jnp.zeros((B, W - T) + v.shape[2:])], 1) for k, v in wb.items()}
  key = jax.random.PRNGKey(7)
  out = model.onestep(model.params, dict(wb), jnp.int32(i), key, 1.0)
  pred = np.asarray(out['proprio'][:, i])
  true = np.asarray(batch['proprio'][:, i])
  oerr = pred - true
  print(f'== FBT one-step (teacher-forced, frame {i}) ==')
  print('per-dim RMS:', np.round(np.sqrt((oerr ** 2).mean(0)), 4))
  omad = np.abs(oerr[:, bidx]).mean(-1)
  print('mean|delta| over bidx: mean={:.4f} p50={:.4f} p90={:.4f}'.format(
      omad.mean(), np.median(omad), np.percentile(omad, 90)))

  # --- 3. action sensitivity of the one-step prediction
  wb_neg = dict(wb)
  wb_neg['action'] = -wb['action']
  out_neg = model.onestep(model.params, wb_neg, jnp.int32(i), key, 1.0)
  dpred = np.abs(np.asarray(out_neg['proprio'][:, i]) - pred)
  print('== action sensitivity (a vs -a, same key) ==')
  print('mean |dproprio| per dim:', np.round(dpred.mean(0), 4))
  print('mean over bidx: {:.4f}'.format(dpred[:, bidx].mean()))
  print('dim names:', raw.pobs_keys)


if __name__ == '__main__':
  main()

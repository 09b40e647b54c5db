"""End-to-end benchmark: 100k Urchin rollouts generated + FBT trained — the
BASELINE.json wall-clock criterion (reference budget: README.md:89 — 100k
rollouts, 100k gradient updates; target < 1 hour on TPU).

Scaled-down by default; pass --full for the real budget.
"""
from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--full', action='store_true')
  parser.add_argument('--workdir', default='/tmp/bench_e2e')
  args = parser.parse_args()

  import jax
  from boxlcd_tpu.utils import AttrDict
  from research.define_config import config, env_fn

  n_eps = 100_000 if args.full else 2_000
  bvae_iters = 30_000 if args.full else 200
  fbt_iters = 100_000 if args.full else 200
  # reference model budgets (research/scripts/kicker.py:17-87)
  fbt_embed, fbt_head, fbt_layer = (512, 8, 4) if args.full else (64, 2, 1)
  window = 50 if args.full else 12

  work = Path(args.workdir)
  t0 = time.time()

  # --- datagen --------------------------------------------------------------
  G = config()
  G.update(env='Urchin', logdir=work / 'data', ep_len=50,
           train_barrels=n_eps // 1000, test_barrels=1,
           num_envs=4000 if args.full else 1000,
           barrel_format='native')
  from boxlcd_tpu.data.collect import collect
  if (work / 'data' / 'train').is_dir() and \
      len(list((work / 'data' / 'train').glob('*.npz'))) >= n_eps // 1000:
    # reusing a dataset: datagen time is NOT measured this run — report it
    # as None unless the caller supplies the measured figure explicitly, so
    # composed wall-clock totals never silently mix measured and assumed
    print('[e2e] reusing existing dataset (datagen time not measured)')
    t_data = (float(os.environ['E2E_DATA_SECS'])
              if 'E2E_DATA_SECS' in os.environ else None)
    t0 = time.time() - (t_data or 0.0)
  else:
    collect(env_fn(G), G)
    t_data = time.time() - t0

  # --- BVAE (device-resident dataset: zero host round-trips per step) --------
  from boxlcd_tpu.data.device_dataset import DeviceDataset, train_device
  from research.nets.autoencoders.bvae import BVAE
  ds = DeviceDataset(work / 'data' / 'train')
  print(f'[e2e] dataset on device: {ds.n_episodes} episodes')
  G2 = config()
  G2.update(env='Urchin', datadir=work / 'data', logdir=work / 'bvae',
            total_itr=bvae_iters, bs=32, window=5, hidden_size=64,
            nfilter=16, vqD=16, vqK=64, ep_len=50, lr=5e-4)
  env = env_fn(G2)()
  bvae = BVAE(env, G2)
  train_device(bvae, ds, bvae_iters, bs=32, window=5, chunk=200,
               log_every=bvae_iters // 4)
  bvae.save(work / 'bvae')
  t_bvae = time.time() - t0 - (t_data or 0.0)

  # --- FBT ------------------------------------------------------------------
  from research.nets.video_models.fbt import FBT
  G3 = config()
  G3.update(env='Urchin', datadir=work / 'data', weightdir=work / 'bvae',
            logdir=work / 'fbt', total_itr=fbt_iters, bs=32, window=window,
            n_embed=fbt_embed, n_head=fbt_head, n_layer=fbt_layer,
            hidden_size=64, nfilter=16, vqD=16, vqK=64, ep_len=50, lr=5e-4)
  env3 = env_fn(G3)()
  fbt = FBT(env3, G3)
  # encode the dataset through the frozen BVAE once; FBT trains on latents
  # directly instead of re-encoding bs*window frames every iteration
  t_enc = time.time()
  zdata = {'z': fbt.precompute_z(ds.data, unpack=ds.unpack_lcd),
           'action': ds.data['action']}
  print(f'[e2e] latents precomputed in {time.time() - t_enc:.1f}s')
  train_device(fbt, ds, fbt_iters, bs=32, window=window, chunk=100,
               log_every=fbt_iters // 4, data=zdata)
  fbt.save(work / 'fbt')
  total = time.time() - t0

  print(json.dumps({
      'metric': 'e2e_datagen_plus_fbt_wallclock',
      'n_episodes': n_eps, 'bvae_iters': bvae_iters, 'fbt_iters': fbt_iters,
      'datagen_s': None if t_data is None else round(t_data, 1),
      'bvae_s': round(t_bvae, 1),
      'total_s': None if t_data is None else round(total, 1),
      'measured_this_run_s': round(total - (t_data or 0.0), 1),
      'under_one_hour': None if t_data is None else total < 3600,
  }))


if __name__ == '__main__':
  main()

#!/usr/bin/env python3
"""Sweep launcher: one command template fanned over envs with per-model
hyperparameter presets (reference: research/scripts/kicker.py)."""
from __future__ import annotations

import argparse
import subprocess
from collections import defaultdict
from pathlib import Path

from boxlcd_tpu.utils import AttrDict

TIER0 = ['Dropbox', 'Bounce', 'Bounce2', 'Object2']
TIER1 = ['Urchin', 'Luxo', 'UrchinCube', 'LuxoCube', 'UrchinBall', 'LuxoBall']
ALL = TIER0 + TIER1
ENVS = {'all': ALL, '0': TIER0, '1': TIER1}

# per-model presets (reference: kicker.py:17-87)
MultiStepArbiter = AttrDict(total_itr=int(3e4))
BVAE = AttrDict(hidden_size=64, vqK=64, vqD=16, nfilter=16, window=5,
                total_itr=int(3e4))
RNLDA = AttrDict(hidden_size=64, vqK=64, vqD=8, nfilter=16, window=5,
                 total_itr=int(3e4))
RSSM = AttrDict(nfilter=64, hidden_size=300, free_nats=0.01,
                total_itr=int(1e5))
FIT = AttrDict(n_layer=2, n_head=4, n_embed=256, hidden_size=256,
               total_itr=int(1e5))
FBT = AttrDict(n_layer=4, n_head=8, n_embed=512, hidden_size=512,
               total_itr=int(1e5))
FRNLD = AttrDict(n_layer=4, n_head=8, n_embed=512, hidden_size=512,
                 total_itr=int(1e5))
PRESETS = {'MultiStepArbiter': MultiStepArbiter, 'BVAE': BVAE, 'RNLDA': RNLDA,
           'RSSM': RSSM, 'FIT': FIT, 'FBT': FBT, 'FRNLD': FRNLD}

ENV_WINDOW = defaultdict(lambda: 50)
ENV_WINDOW['Dropbox'] = 25
ENV_PROMPT = defaultdict(lambda: 3)
ENV_PROMPT['Dropbox'] = 1


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--envs', default='all', help='all | 0 | 1 | name')
  parser.add_argument('--model', default='BVAE')
  parser.add_argument('--datadir', default='logs/data')
  parser.add_argument('--logdir', default='logs/kick')
  parser.add_argument('--weightdir', default='')
  parser.add_argument('--arbiterdir', default='')
  parser.add_argument('--bs', default='32')
  parser.add_argument('--lr', default='5e-4')
  parser.add_argument('--dry', action='store_true')
  parser.add_argument('--extra', default='', help='extra flags passthrough')
  args = parser.parse_args()

  env_list = ENVS.get(args.envs, [args.envs])
  preset = PRESETS.get(args.model, AttrDict())
  procs = []
  for env in env_list:
    cmd = ['python', '-m', 'research.main', '--mode=train',
           f'--model={args.model}', f'--env={env}',
           f'--datadir={Path(args.datadir) / env}',
           f'--logdir={Path(args.logdir) / args.model / env}',
           f'--bs={args.bs}', f'--lr={args.lr}',
           f'--window={ENV_WINDOW[env]}', f'--prompt_n={ENV_PROMPT[env]}']
    for k, v in preset.items():
      cmd.append(f'--{k}={v}')
    if args.weightdir:
      cmd.append(f'--weightdir={Path(args.weightdir) / env}')
    if args.arbiterdir:
      cmd.append(f'--arbiterdir={Path(args.arbiterdir) / env}')
    if args.extra:
      cmd.extend(args.extra.split())
    print(' '.join(cmd))
    if not args.dry:
      procs.append(subprocess.Popen(cmd))
  for p in procs:
    p.wait()


if __name__ == '__main__':
  main()

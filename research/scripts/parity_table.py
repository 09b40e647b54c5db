"""Produce the physics-parity table vs pybox2d: time-to-epsilon divergence,
episode mean error, and pose-distribution Wasserstein-1, per env at both the
default (8/4) and the reference's (180/60) solver iterations
(reference stepping: boxLCD/world_env.py:446-452; SURVEY §7)."""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from tests.parity import env_parity


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--envs', default='Dropbox,Bounce,Object3,Urchin,Luxo,'
                 'Crab,Walker,Gingy,Octo,Spider')
  p.add_argument('--steps', type=int, default=50)
  p.add_argument('--seeds', type=int, default=3)
  p.add_argument('--out', default='')
  args = p.parse_args()

  passive = {'Dropbox', 'Bounce', 'Bounce2', 'Object2', 'Object3'}
  rows = []
  for env_name in args.envs.split(','):
    for iters in ((8, 4), (180, 60)):
      m = env_parity(env_name, args.steps, seeds=range(args.seeds),
                     actuated=env_name not in passive, iters=iters)
      row = {'env': env_name, 'iters': f'{iters[0]}/{iters[1]}', **m}
      rows.append(row)
      print(row, flush=True)

  print('\n| env | iters | t_eps (steps) | mean err (m) | W1 pose (m) |')
  print('|---|---|---|---|---|')
  for r in rows:
    print(f"| {r['env']} | {r['iters']} | {r['t_eps']:.1f} | "
          f"{r['mean_err']:.3f} | {r['w1_pose']:.3f} |")
  if args.out:
    with open(args.out, 'w') as f:
      json.dump(rows, f, indent=1)


if __name__ == '__main__':
  main()

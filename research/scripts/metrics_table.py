"""Build the model-quality metric table from Evaler pickles
(reference: research/scripts/script.py:6-51 — FVD/SSIM/PSNR/cosdist LaTeX
table per env x model)."""
from __future__ import annotations

import argparse
import pickle
from pathlib import Path

METRICS = ['fvd', 'ssim', 'psnr', 'cosdist']


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--logdir', default='logs/eval')
  parser.add_argument('--models', default='RSSM,FIT,FBT,FRNLD')
  parser.add_argument('--envs', default='Dropbox,Bounce,Urchin,Luxo')
  parser.add_argument('--split', default='test')
  args = parser.parse_args()

  models = args.models.split(',')
  envs = args.envs.split(',')
  rows = []
  header = ['env'] + [f'{m}/{x}' for m in models for x in METRICS]
  rows.append(' & '.join(header) + r' \\')
  for env in envs:
    cells = [env]
    for model in models:
      pkl = Path(args.logdir) / model / env / 'logger.pkl'
      if pkl.exists():
        with open(pkl, 'rb') as f:
          table = pickle.load(f)
        # keys are '<split>:<u|p>:<metric>' -> (mean, std); the paper table
        # uses the prompted test metrics (reference: scripts/script.py:30-42)
        res = {k.split(':', 2)[2]: v for k, v in table.items()
               if k.startswith(f'{args.split}:p:')}
        for metric in METRICS:
          if metric in res:
            m, s = res[metric]
            cells.append(f'{m:.3f}$\\pm${s:.3f}')
          else:
            cells.append('--')
      else:
        cells.extend(['--'] * len(METRICS))
    rows.append(' & '.join(cells) + r' \\')
  print('\n'.join(rows))


if __name__ == '__main__':
  main()

"""Plot RL training curves from TB event scalars or dumped hps/logs
(reference: research/scripts/evaluations/csv/plot.py). Reads TensorBoard
event files if available, falls back to CSVs of (step, value)."""
from __future__ import annotations

import argparse
from pathlib import Path


def load_scalars(logdir, tag):
  try:
    from tensorboard.backend.event_processing.event_accumulator import \
        EventAccumulator
    acc = EventAccumulator(str(logdir))
    acc.Reload()
    if tag in acc.Tags().get('scalars', []):
      events = acc.Scalars(tag)
      return [(e.step, e.value) for e in events]
  except Exception:
    pass
  csv = Path(logdir) / f'{tag.replace("/", "_")}.csv'
  if csv.exists():
    rows = [line.strip().split(',') for line in open(csv)][1:]
    return [(int(s), float(v)) for s, v in rows]
  return []


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--runs', nargs='+', required=True,
                      help='label=logdir pairs')
  parser.add_argument('--tag', default='test/success_rate')
  parser.add_argument('--out', default='rl_curves.png')
  args = parser.parse_args()
  import matplotlib
  matplotlib.use('Agg')
  import matplotlib.pyplot as plt
  plt.figure(figsize=(7, 4))
  for run in args.runs:
    label, logdir = run.split('=', 1)
    data = load_scalars(logdir, args.tag)
    if not data:
      print(f'no data for {label} at {logdir}')
      continue
    xs, ys = zip(*data)
    final = ys[-1]
    plt.plot(xs, ys, label=f'{label} (*{final:.3f})')
  plt.xlabel('env steps')
  plt.ylabel(args.tag)
  plt.legend()
  plt.tight_layout()
  plt.savefig(args.out, dpi=120)
  print('wrote', args.out)


if __name__ == '__main__':
  main()

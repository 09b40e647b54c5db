"""Research CLI: collect / train / eval (reference: research/main.py).

Keeps the reference's config-resume chain: flags -> datadir/hps.yaml
inheritance -> weightdir/hps.yaml inheritance -> derived lcd dims
(reference: main.py:31-55).
"""
from __future__ import annotations

import argparse
from pathlib import Path

import yaml

from boxlcd_tpu.utils import AttrDict, args_type
from research.define_config import config, env_fn


IGNORE = ['logdir', 'datadir', 'weightdir', 'arbiterdir', 'buffdir', 'mode',
          'model', 'total_itr', 'full_cmd', 'commit']


def parse_flags(argv=None):
  G = config()
  parser = argparse.ArgumentParser()
  for key, value in G.items():
    parser.add_argument(f'--{key}', type=args_type(value), default=value)
  args = parser.parse_args(argv)
  G = AttrDict(vars(args))
  # inherit hyperparams from the dataset and pretrained weights
  for src in ['datadir', 'weightdir']:
    hps = Path(G[src]) / 'hps.yaml'
    if hps.exists():
      with open(hps) as f:
        loaded = yaml.safe_load(f)
      for key, val in loaded.items():
        if key not in IGNORE and key in G:
          G[key] = type(G[key])(val) if not isinstance(G[key], Path) else Path(val)
  for p in ['logdir', 'datadir', 'weightdir', 'arbiterdir', 'buffdir']:
    G[p] = Path(G[p])
  # derived dims
  env = env_fn(G)()
  G.lcd_h = env.lcd_h
  G.lcd_w = env.lcd_w
  G.imsize = G.lcd_h * G.lcd_w
  return G, env


def main(argv=None):
  G, env = parse_flags(argv)
  print(f'mode={G.mode} env={G.env} model={G.model}')
  if G.mode == 'collect':
    from boxlcd_tpu.data import collect
    collect(env_fn(G), G)
  elif G.mode == 'train':
    from research.nets import net_map
    from research.runners import Trainer
    model = net_map[G.model](env, G)
    print(f'{G.model}: {model.num_vars:,} params')
    Trainer(model, env, G).run()
  elif G.mode == 'eval':
    from research.runners import Evaler
    Evaler(None, env, G).run()
  elif G.mode in ('viz', 'fiddle'):
    from research.nets import net_map
    from research.nets._base import Net
    from research.runners import Fiddler, Vizer
    mG = Net.load_config(G.weightdir, G.model)
    mG.update(logdir=G.logdir, weightdir=G.weightdir, datadir=G.datadir)
    model = net_map[G.model](env, mG)
    model.load(G.weightdir)
    runner = Vizer(model, env, G) if G.mode == 'viz' else Fiddler(model, env, G)
    runner.run()
  else:
    raise ValueError(f'unknown mode {G.mode}')


if __name__ == '__main__':
  main()

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


IGNORE = ['logdir', 'full_cmd', 'ipython_mode', 'weightdir', 'arbiterdir']


def parse_flags(argv=None):
  """Flags -> env-class defaults -> hps.yaml defaults -> CLI overrides
  (reference: research/main.py:23-56 — yaml feeds parser *defaults*, so
  explicit CLI flags always win)."""
  base = config()
  parser = argparse.ArgumentParser()
  for key, value in base.items():
    parser.add_argument(f'--{key}', type=args_type(value), default=value)
  temp = parser.parse_args(argv)
  from boxlcd_tpu import env_map
  env_cls = env_map[temp.env]
  parser.set_defaults(**{k: v for k, v in env_cls.ENV_DG.items() if k in base})
  defaults = {}
  for src_dir in [temp.datadir, temp.weightdir]:
    hps = Path(src_dir) / 'hps.yaml'
    if hps.exists():
      with open(hps) as f:
        loaded = yaml.safe_load(f) or {}
      for key, val in loaded.items():
        if key in IGNORE or key not in base:
          continue
        if isinstance(base[key], Path):
          defaults[key] = Path(val)
        else:
          defaults[key] = type(base[key])(val)
  parser.set_defaults(**defaults)
  G = AttrDict(vars(parser.parse_args(argv)))
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
  if G.get('ipython_mode', 0):
    # drop into a REPL with env/G (and model if weights given) in scope
    # (reference: research/main.py:77-83)
    model = None
    if G.get('weightdir') and str(G.weightdir) not in ('', '.'):
      from research.nets import net_map
      from research.nets._base import Net
      mG = Net.load_config(G.weightdir, G.model)
      model = net_map[G.model](env, mG)
      model.load(G.weightdir)
    import IPython
    IPython.embed(colors='neutral')
    return
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
    mG.update(logdir=G.logdir, datadir=G.datadir)  # keep checkpoint weightdir
    model = net_map[G.model](env, mG)
    model.load(G.weightdir)
    runner = Vizer(model, env, G) if G.mode == 'viz' else Fiddler(model, env, G)
    runner.run()
  else:
    raise ValueError(f'unknown mode {G.mode}')


if __name__ == '__main__':
  main()

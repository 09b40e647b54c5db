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
    from pathlib import Path as _P
    if (_P(G.logdir) / f'{G.model}.pkl').exists():
      # auto-resume: a checkpoint in the logdir means a prior (possibly
      # killed) run of this config — restore params+opt_state+step+RNG and
      # continue toward total_itr (SURVEY §5.4 mid-run resume)
      model.load(G.logdir)
      print(f'RESUMING {G.model} at step {model.step}')
    if G.get('device_dataset', 0):
      # HBM-resident dataset + on-device window sampling: zero host
      # round-trips per update (the round-1 e2e fast path, now first-class)
      from pathlib import Path
      from boxlcd_tpu.data.device_dataset import DeviceDataset, train_device
      from research import utils as rutils
      ds = DeviceDataset(Path(G.datadir) / 'train')
      print(f'dataset on device: {ds.n_episodes} episodes')
      writer = rutils.make_writer(G.logdir)
      data = None
      if G.model == 'FBT':
        data = {'z': model.precompute_z(ds.data, unpack=ds.unpack_lcd),
                'action': ds.data['action']}

      def cb(itr, line):
        for k, v in line.items():
          writer.add_scalar(k, v, itr)
        writer.flush()

      chunk = int(G.get('steps_per_dispatch', 1))
      if chunk <= 1:  # default: amortize dispatch latency over 100 steps
        chunk = min(100, int(G.total_itr))
      train_device(model, ds, int(G.total_itr), bs=G.bs, window=G.window,
                   chunk=chunk, log_every=int(G.log_n), logger_cb=cb,
                   data=data, save_dir=G.logdir)
      model.save(G.logdir)
    else:
      Trainer(model, env, G).run()
  elif G.mode == 'eval':
    from research.runners import Evaler
    Evaler(None, env, G).run()
  elif G.mode in ('viz', 'fiddle'):
    from research.nets import net_map
    from research.nets._base import Net
    from research.runners import Fiddler, InteractiveVizer, Vizer
    mG = Net.load_config(G.weightdir, G.model)
    mG.update(logdir=G.logdir, datadir=G.datadir)  # keep checkpoint weightdir
    model = net_map[G.model](env, mG)
    model.load(G.weightdir)
    viz_cls = InteractiveVizer if G.get('interactive', 0) else Vizer
    runner = viz_cls(model, env, G) if G.mode == 'viz' else Fiddler(model, env, G)
    runner.run()
  else:
    raise ValueError(f'unknown mode {G.mode}')


if __name__ == '__main__':
  main()

"""Policy success evaluation: N=1000 episodes on the real sim — the headline
protocol (reference: research/scripts/evaluations/eval_policy.py:44-71,
README.md:121): success = done before timeout."""
from __future__ import annotations

import argparse
import pickle
from pathlib import Path

import numpy as np

from research.define_config import env_fn
from research.rl._base import goal_mode_for
from research.rl.main import parse
from research.wrappers import VecEnv

# 10 iters x 100 batched on-device envs = the reference's N=1000 protocol
# (reference ran 100 iters x 10 process-envs; batching wider costs nothing
# here and cuts host-link round-trips 10x)
N_ENVS = 100
ITERS = 10


def evaluate(G, get_a):
  env0 = env_fn(G)()
  raw = env0._env if hasattr(env0, '_env') else env0
  venv = VecEnv(raw, N_ENVS, G, goal_mode=goal_mode_for(G), seed=G.seed)
  successes = []
  for it in range(ITERS):
    o = venv.reset()
    succeeded = np.zeros(N_ENVS, bool)
    ep_done = np.zeros(N_ENVS, bool)
    for t in range(G.ep_len):
      # reference protocol: eval_policy.py:51 runs ac.step -> pi.sample()
      # (stochastic), so the published 0.999/0.988 numbers are sampled-action
      # success rates; --test_deterministic=1 opts into the mean action
      a = np.asarray(get_a(o, deterministic=bool(
          G.get('test_deterministic', 0))))
      o, rew, done, infos = venv.step(a)
      succ = np.array([i.get('success', False) for i in infos])
      succeeded |= (succ & ~ep_done)
      ep_done |= np.asarray(done)
      if ep_done.all():
        break
    successes.append(succeeded)
    print(f'iter {it + 1}/{ITERS}: running success '
          f'{np.concatenate(successes).mean():.3f}')
  rate = np.concatenate(successes).mean()
  print(f'SUCCESS RATE over {ITERS * N_ENVS} episodes: {rate:.3f}')
  return rate


def main():
  G = parse()
  ckpt = Path(G.logdir) / f'{G.algo}.pkl'
  # rebuild the algo with the CHECKPOINT's config (reference pattern: loaders
  # pop the smuggled G and reconstruct the model with it — evaler.py:34-41);
  # otherwise net-shape flags like --hidden_size must be re-passed by hand and
  # a mismatch makes flax.from_bytes fail
  if ckpt.exists():
    with open(ckpt, 'rb') as f:
      saved = pickle.load(f).get('G', {})
    cli = {k: G[k] for k in ('logdir', 'seed', 'test_deterministic', 'algo')}
    merged = {**dict(G), **dict(saved), **cli}
    # eval always runs on the REAL sim on this one chip
    trained_lenv = int(merged.get('lenv', 0) or 0)
    merged.update(lenv=0, mesh='', fused_rollout=0)
    from boxlcd_tpu.utils import AttrDict
    G = AttrDict(merged)
    G.logdir = Path(G.logdir)
    G.trained_lenv = trained_lenv
  # load the trained policy
  if G.algo == 'ppo':
    from research.rl.ppo import PPO
    algo = PPO(G)
  else:
    from research.rl.sac import SAC
    algo = SAC(G)
  if ckpt.exists():
    algo.load(G.logdir)
  else:
    print(f'WARNING: no checkpoint at {ckpt}; evaluating the fresh policy')
  rate = evaluate(G, algo.get_a)
  out = Path(G.logdir) / 'eval_policy.pkl'
  out.parent.mkdir(parents=True, exist_ok=True)
  with open(out, 'wb') as f:
    pickle.dump({'success_rate': float(rate)}, f)
  # durable in-tree evidence (survives /root/work wipes): every headline
  # number must trace back to a committed artifact in logs/evidence/
  import hashlib
  import json
  import time
  ev_dir = Path(__file__).resolve().parents[2] / 'logs' / 'evidence'
  ev_dir.mkdir(parents=True, exist_ok=True)
  digest = (hashlib.sha256(ckpt.read_bytes()).hexdigest()[:16]
            if ckpt.exists() else None)
  ev = {
      'protocol': 'eval_policy N=1000 real-sim success',
      'env': str(G.env), 'algo': str(G.algo),
      'trained_in': 'learned_sim' if int(G.get('trained_lenv', 0) or 0) else
                    'real_sim',
      'success_rate': float(rate), 'episodes': N_ENVS * ITERS,
      'seed': int(G.seed),
      'total_steps': int(G.get('total_steps', 0)),
      'num_envs': int(G.get('num_envs', 0)),
      'vel_iters': int(G.get('vel_iters', 0)),
      'pos_iters': int(G.get('pos_iters', 0)),
      'checkpoint': str(ckpt), 'checkpoint_sha256_16': digest,
      'time': time.strftime('%Y-%m-%d %H:%M:%S'),
  }
  # include the run directory in the name so two evals of the same
  # env/algo/config (e.g. the SAC wedge vs the firehose variant) cannot
  # clobber each other's evidence
  name = (f"eval_{G.env}_{G.algo}_{ev['trained_in']}"
          f"_v{ev['vel_iters']}p{ev['pos_iters']}"
          f"_{Path(G.logdir).parent.name}_{Path(G.logdir).name}.json")
  with open(ev_dir / name, 'w') as f:
    json.dump(ev, f, indent=1)
  print('EVIDENCE', ev_dir / name)


if __name__ == '__main__':
  try:
    main()
  except BaseException:
    # the headline chain pipes stdout+stderr through `tail -3`, which hides
    # tracebacks until the whole retry loop exits — persist the error
    import sys
    import traceback
    for a in sys.argv:
      if a.startswith('--logdir='):
        with open(Path(a.split('=', 1)[1]) / 'eval_error.log', 'a') as f:
          f.write(traceback.format_exc() + '\n')
        break
    raise

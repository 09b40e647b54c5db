"""Dream-environment diagnostic: evaluate ANY saved PPO policy INSIDE the
learned simulator (the fused RewardLenv(LearnedEnv) rollout).

Separates "the dream env caps success" from "dream PPO optimizes slowly":
run the real-sim-converged policy (0.998 real, headline chain) in the dream —
if its in-dream success is high, the model/serving is fine and the gap is
optimization; if low, the dream dynamics/reward disagree with the real sim
(model error, decode bias, or the token-sampling temperature).

Usage:
  python -m research.scripts.dream_diag ppo --logdir=<ppo ckpt dir> \
      --weightdir=<FBT dir> --env=Luxo --diag_epochs=3 --lenv_temp=1.0

Success metric matches PPO's in-train `success_rate`: episodes end on
goal-reach or (lockstep) timeout; rate = #goal-reach ends / #all ends.
"""
from __future__ import annotations

import pickle
import sys
from pathlib import Path

import jax
import numpy as np

from boxlcd_tpu.utils import AttrDict
from research.rl.main import parse


def main(argv=None):
  argv = list(sys.argv[1:] if argv is None else argv)
  diag_epochs = 3
  diag_random = False
  keep = []
  for a in argv:
    if a.startswith('--diag_epochs='):
      diag_epochs = int(a.split('=', 1)[1])
    elif a.startswith('--diag_random='):
      diag_random = bool(int(a.split('=', 1)[1]))
    else:
      keep.append(a)
  G = parse(keep)
  ckpt = Path(G.logdir) / 'ppo.pkl'
  with open(ckpt, 'rb') as f:
    saved = pickle.load(f).get('G', {})
  # checkpoint G gives the net shapes; CLI wins for the dream-env knobs
  cli = {k: G[k] for k in ('logdir', 'seed', 'algo', 'weightdir', 'env',
                           'lenv_temp', 'num_envs', 'steps_per_epoch',
                           'window', 'goal_thresh')}
  merged = {**dict(G), **dict(saved), **cli}
  merged.update(lenv=1, mesh='', model='FBT', fused_rollout=1, lenv_test=0)
  G = AttrDict(merged)
  for p in ('logdir', 'datadir', 'weightdir', 'arbiterdir', 'buffdir'):
    G[p] = Path(G[p])

  from research.rl.ppo import PPO
  algo = PPO(G)
  if diag_random:
    print('RANDOM-POLICY control: fresh init, no checkpoint loaded')
  else:
    algo.load(G.logdir)
  algo._build_fused_lenv()

  algo.env.reset()
  lenv = algo.env.lenv
  import jax.numpy as jnp
  state = (lenv.window_batch, jnp.int32(lenv.ptr), jnp.int32(lenv.ep_t),
           dict(algo.env.goal))
  key = jax.random.PRNGKey(int(G.seed) + 777)
  tot_s = tot_d = 0
  rews = []
  for ep in range(diag_epochs):
    key, k = jax.random.split(key)
    wb, ptr, ep_t, goals, traj, _ = algo._lenv_rollout(
        algo.params, algo.env.lenv.model.params, *state, k,
        algo.steps_per_epoch)
    state = (wb, ptr, ep_t, goals)
    _, _, rew, _, _, done, succ = [np.asarray(x) for x in traj]
    tot_s += succ.sum()
    tot_d += done.sum()
    rews.append(rew.mean())
    print(f'epoch {ep + 1}/{diag_epochs}: eps={done.sum()} '
          f'succ={succ.sum()} running_rate='
          f'{tot_s / max(tot_d, 1):.3f} mean_rew={rew.mean():.4f}')
  rate = tot_s / max(tot_d, 1)
  print(f'IN-DREAM SUCCESS RATE over {tot_d} episodes: {rate:.3f} '
        f'(temp={G.lenv_temp}, ckpt={ckpt})')
  return rate


if __name__ == '__main__':
  main()

"""Trajectory-divergence metrics vs the pybox2d oracle (SURVEY §7).

Pointwise long-horizon comparison of chaotic contact dynamics is meaningless;
the principled contract is (a) how LONG trajectories stay pointwise-close
(time-to-epsilon divergence) and (b) whether the engines visit the same
distribution of poses over whole episodes (per-dimension Wasserstein-1 on
body origin positions). Shared by tests/test_parity.py and
research/scripts/parity_table.py.
"""
from __future__ import annotations

import numpy as np

import boxlcd_tpu
from boxlcd_tpu.engine import physics

# half an LCD pixel at 16 px over a 5 m world (5/16/2)
EPS_DIVERGE = 0.16


def make_env(name, G=None):
  """Zoo env by name, or a bare-morphology world (walker/gingy/octo/spider
  have no zoo env class of their own; the reference exercises them via
  world_defs only)."""
  if name in boxlcd_tpu.env_map:
    return boxlcd_tpu.env_map[name](G)
  from boxlcd_tpu.envs.env import WorldEnv
  from boxlcd_tpu.world_defs import ROBOT_FILLER, Robot, WorldDef
  assert name.lower() in ROBOT_FILLER, name
  w = WorldDef(robots=[Robot(type=name.lower(), name=f'{name.lower()}0')],
               objects=[])
  G = dict(G or {})
  G.setdefault('wh_ratio', 2.0)
  G.setdefault('ep_len', 100)
  return WorldEnv(w, G)


def rollout_pair(env_name, steps, seed=0, actuated=True, iters=None,
                 G_extra=None):
  """Roll our engine and the Box2D oracle from identical poses.

  Returns (ours, theirs): lists of (origin_positions (N,2), angles (N,))."""
  from tests.oracle import Box2DOracle
  G = {'vel_iters': iters[0], 'pos_iters': iters[1]} if iters else {}
  G.update(G_extra or {})
  env = make_env(env_name, G)
  oracle = Box2DOracle(env)
  env.seed(seed)
  env.reset()
  st = env.state
  oracle.reset_from(np.asarray(physics.origin_pos(env.spec, st)),
                    np.asarray(st.a), np.asarray(st.is_circle))
  rng = np.random.RandomState(seed)
  ours, theirs = [], []
  for t in range(steps):
    act = (rng.uniform(-1, 1, env.act_size).astype(np.float32)
           if actuated else np.zeros(env.act_size, np.float32))
    env.step(act)
    oracle.step(act)
    ours.append((np.asarray(physics.origin_pos(env.spec, env.state)),
                 np.asarray(env.state.a).copy()))
    theirs.append(oracle.poses())
  return ours, theirs


def divergence_metrics(ours, theirs, eps=EPS_DIVERGE):
  """{'t_eps', 'mean_err', 'w1_pose'} for one trajectory pair."""
  errs = np.array([np.abs(o[0] - t[0]).max() for o, t in zip(ours, theirs)])
  over = np.nonzero(errs > eps)[0]
  t_eps = int(over[0]) if len(over) else len(errs)
  # per-dimension Wasserstein-1 between the pose clouds visited over the
  # episode (pooled over steps, per body per coordinate), in meters
  a = np.stack([o[0] for o in ours])     # (T, N, 2)
  b = np.stack([t[0] for t in theirs])
  w1 = np.mean([
      np.abs(np.sort(a[:, n, d]) - np.sort(b[:, n, d])).mean()
      for n in range(a.shape[1]) for d in range(2)])
  return {'t_eps': t_eps, 'mean_err': float(errs.mean()),
          'w1_pose': float(w1)}


def env_parity(env_name, steps, seeds, actuated=True, iters=None,
               G_extra=None):
  """Aggregate divergence metrics over seeds."""
  rows = []
  for s in seeds:
    ours, theirs = rollout_pair(env_name, steps, seed=s, actuated=actuated,
                                iters=iters, G_extra=G_extra)
    rows.append(divergence_metrics(ours, theirs))
  return {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}

"""RL base: env construction (real batched or learned) + test harness
(reference: research/rl/_base.py). The real vector env is the on-device
VecEnv; the learned env is RewardLenv(LearnedEnv(model)) — RL inside the
world model, the headline capability."""
from __future__ import annotations

from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from research import utils
from research.define_config import env_fn
from research.wrappers import LearnedEnv, RewardLenv, VecEnv

TN = 8  # test-env batch (reference: rl/_base.py:15)


def goal_mode_for(G):
  if not G.goals:
    return None
  return 'cube' if 'Cube' in G.env else 'body'


class RLAlgo:
  def __init__(self, G):
    self.G = G
    self.logger = utils.AutoLogger()
    self.writer = utils.make_writer(G.logdir)
    self.tenv = env_fn(G, G.seed)()  # goal-wrapped single test env
    self.obs_space = self.tenv.observation_space
    self.act_space = self.tenv.action_space
    raw = self.tenv._env if hasattr(self.tenv, '_env') else self.tenv
    gm = goal_mode_for(G)
    self.real_tvenv = VecEnv(raw, TN, G, goal_mode=gm, seed=G.seed + 1)
    if G.lenv:
      from research.nets import net_map
      from research.nets._base import Net
      mG = Net.load_config(G.weightdir, G.model)
      model = net_map[G.model](self.tenv._env if hasattr(self.tenv, '_env')
                               else self.tenv, mG)
      model.load(G.weightdir)
      self.env = RewardLenv(LearnedEnv(G.num_envs, model, G,
                                       real_env=self.tenv))
      self.tvenv = self.learned_tvenv = RewardLenv(
          LearnedEnv(TN, model, G, real_env=self.tenv))
      self.obs_space = self.env.observation_space
    else:
      self.env = VecEnv(raw, G.num_envs, G, goal_mode=gm, seed=G.seed + 2)
      self.tvenv = self.real_tvenv
    if G.get('preproc'):
      # frozen-AE observation preprocessing: obs gain zstate / goal:zstate
      # (reference: rl/_base.py Preproc stacking + preproc_vec_env.py)
      from research.nets import net_map
      from research.nets._base import Net
      from research.wrappers import PreprocVecEnv
      pname = str(G.get('preproc_net', 'BVAE'))
      pG = Net.load_config(G.preproc, pname)
      preproc = net_map[pname](self.tenv._env if hasattr(self.tenv, '_env')
                               else self.tenv, pG)
      preproc.load(G.preproc)
      self.env = PreprocVecEnv(preproc, self.env, G)
      self.real_tvenv = PreprocVecEnv(preproc, self.real_tvenv, G)
      if G.lenv:
        self.learned_tvenv = PreprocVecEnv(preproc, self.learned_tvenv, G)
      self.tvenv = self.real_tvenv if not G.lenv else self.learned_tvenv
      self.obs_space = self.env.observation_space
    self.goal_key = ('goal:object'
                     if type(self.tenv).__name__ == 'CubeGoalEnv'
                     else 'goal:proprio')

  def get_av(self, o):
    raise NotImplementedError

  def test_agent(self, itr, use_lenv=False):
    """Run the policy in the (real or learned) env; log EpRet/EpLen/success
    (reference: rl/_base.py:83-175)."""
    _env = self.learned_tvenv if use_lenv else self.real_tvenv
    prefix = 'lenv_' if use_lenv else ''
    o = _env.reset()
    ep_ret = np.zeros(TN)
    ep_len = np.zeros(TN)
    succeeded = np.zeros(TN, bool)
    ep_done = np.zeros(TN, bool)
    for t in range(self.G.ep_len):
      # the reference samples stochastic actions at test time despite its
      # "deterministic" comment (pponets.py:102-113 — act() -> pi.sample());
      # match that protocol (the G flag opts into the mean-action variant)
      a = np.asarray(self.get_a(
          o, deterministic=bool(self.G.get('test_deterministic', 0))))
      o, rew, done, info = _env.step(a)
      rew = np.asarray(rew)
      done = np.asarray(done)
      ep_ret += rew * ~ep_done
      ep_len += ~ep_done
      if isinstance(info, list):
        succ = np.array([i.get('success', False) for i in info])
      else:
        succ = np.asarray(info.get('success', np.zeros(TN, bool)))
      succeeded |= (succ & ~ep_done)
      ep_done |= done
      if ep_done.all():
        break
    self.logger[f'{prefix}test/EpRet'] = ep_ret.mean()
    self.logger[f'{prefix}test/EpLen'] = ep_len.mean()
    self.logger[f'{prefix}test/success_rate'] = succeeded.mean()
    return succeeded.mean()

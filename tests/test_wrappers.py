"""Wrapper tests: spaces/shape contracts + goal reward semantics — the test
the reference left as a TODO stub (reference: research/wrappers/test_wrappers.py)."""
import numpy as np
import pytest

import boxlcd_tpu
from boxlcd_tpu.utils import AttrDict


def rl_G(**kw):
  from research.define_config import config
  G = config()
  G.update(goal_thresh=0.05, rew_scale=1.0, state_rew=1, diff_delt=0)
  G.update(**kw)
  return G


def test_body_goal_env():
  from research.wrappers import BodyGoalEnv
  G = rl_G(env='Luxo')
  env = boxlcd_tpu.env_map['Luxo'](G)
  genv = BodyGoalEnv(env, G)
  genv.seed(0)
  obs = genv.reset()
  assert 'goal:lcd' in obs and 'goal:proprio' in obs
  assert obs['goal:lcd'].shape == obs['lcd'].shape
  obs2, rew, done, info = genv.step(np.zeros(env.act_size))
  assert 'delta' in info
  assert rew <= 1.0
  # reward is negative delta (plus possible success bonus)
  if not info.get('success'):
    assert rew < 0


def test_vec_env_goal_batching():
  from research.wrappers import VecEnv
  G = rl_G(env='Luxo')
  env = boxlcd_tpu.env_map['Luxo'](G)
  venv = VecEnv(env, 4, G, goal_mode='body')
  obs = venv.reset()
  assert obs['lcd'].shape == (4, env.lcd_h, env.lcd_w)
  assert obs['goal:proprio'].shape == (4, max(1, env.pobs_size))
  a = np.zeros((4, env.act_size), np.float32)
  obs, rew, done, infos = venv.step(a)
  assert rew.shape == (4,) and done.shape == (4,)
  assert len(infos) == 4 and 'timeout' in infos[0]
  # partial reset targets only the masked envs
  before = obs['proprio'].copy()
  obs2 = venv.reset(idxs=[0])
  assert not np.allclose(obs2['proprio'][0], before[0])
  assert np.allclose(obs2['proprio'][1:], before[1:], atol=1e-6)


def test_vec_env_autoreset():
  from research.wrappers import VecEnv
  G = rl_G(env='Dropbox')
  env = boxlcd_tpu.env_map['Dropbox'](G)
  venv = VecEnv(env, 2, G, goal_mode=None)
  venv.reset()
  ep_len = env.G.ep_len
  for t in range(ep_len):
    obs, rew, done, infos = venv.step(np.zeros((2, env.act_size), np.float32))
  assert done.all(), 'episodes should time out at ep_len'
  # after autoreset the counters restart: next step must not be done
  obs, rew, done, infos = venv.step(np.zeros((2, env.act_size), np.float32))
  assert not done.any()

from research.wrappers.body_goal import BodyGoalEnv
from research.wrappers.cube_goal import CubeGoalEnv
from research.wrappers.vec_env import VecEnv
from research.wrappers.learned_env import LearnedEnv, RewardLenv
from research.wrappers.preproc_vec_env import PreprocVecEnv

__all__ = ['BodyGoalEnv', 'CubeGoalEnv', 'VecEnv', 'LearnedEnv', 'RewardLenv', 'PreprocVecEnv']

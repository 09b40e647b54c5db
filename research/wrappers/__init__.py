from research.wrappers.body_goal import BodyGoalEnv
from research.wrappers.cube_goal import CubeGoalEnv
from research.wrappers.vec_env import VecEnv
from research.wrappers.learned_env import LearnedEnv, RewardLenv
from research.wrappers.preproc_vec_env import PreprocVecEnv
from research.wrappers.sync_vector_env import SyncVectorEnv
from research.wrappers.wrapped_gym import WrappedGym

__all__ = ['BodyGoalEnv', 'CubeGoalEnv', 'VecEnv', 'LearnedEnv', 'RewardLenv', 'PreprocVecEnv', 'SyncVectorEnv', 'WrappedGym']

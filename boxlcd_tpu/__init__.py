"""boxlcd_tpu — a TPU-native learned-simulator research testbed.

A ground-up JAX/XLA re-architecture of the capabilities of matwilso/boxLCD:
fixed-shape batched 2D rigid-body physics + binarized LCD rendering as pure
jittable functions, with the world-model research stack (data collection,
autoencoders, video models, evaluation, RL in the learned simulator) built on
the same substrate.
"""
__version__ = '0.1.0'

from boxlcd_tpu.utils import AttrDict, A
from boxlcd_tpu.world_defs import Object, Body, Joint, Robot, WorldDef
from boxlcd_tpu.envs import Env, WorldEnv, env_map
from boxlcd_tpu.envs.env import Env as _Env

ENV_DG = AttrDict(_Env.ENV_DG)

__all__ = ['AttrDict', 'A', 'Object', 'Body', 'Joint', 'Robot', 'WorldDef',
           'Env', 'WorldEnv', 'env_map', 'ENV_DG']

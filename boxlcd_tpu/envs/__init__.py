"""Environment zoo + reflection registry (reference: boxLCD/__init__.py:14-17)."""
import inspect
import sys

from boxlcd_tpu.envs import zoo
from boxlcd_tpu.envs.env import Env, WorldEnv

env_map = {}
for _name, _obj in inspect.getmembers(zoo):
  if inspect.isclass(_obj) and issubclass(_obj, WorldEnv) and _obj is not WorldEnv:
    env_map[_name] = _obj

__all__ = ['Env', 'WorldEnv', 'env_map'] + list(env_map)
globals().update(env_map)

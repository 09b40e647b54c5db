"""The concrete environment zoo (reference: boxLCD/envs.py).

Same 17 worlds, same config overrides, same WorldDef contents — compiled to
the TPU-native engine instead of Box2D.
"""
from __future__ import annotations

from boxlcd_tpu import utils
from boxlcd_tpu.envs.env import WorldEnv
from boxlcd_tpu.world_defs import Object, Robot, WorldDef


def cc(**kwargs):
  """Override class-level env config defaults (reference: boxLCD/envs.py:5-14)."""
  def decorator(cls):
    dg = utils.AttrDict(WorldEnv.ENV_DG)
    dg.update(kwargs)
    cls.ENV_DG = dg
    return cls
  return decorator


# -- basic passive envs --------------------------------------------------------

@cc(ep_len=25, wh_ratio=1.0)
class Dropbox(WorldEnv):
  def __init__(self, G=None):
    w = WorldDef(robots=[], objects=[Object('object0', shape='box', size=0.7,
                                            density=0.1)])
    super().__init__(w, G)


@cc(ep_len=50, wh_ratio=1.0)
class Bounce(WorldEnv):
  def __init__(self, G=None):
    w = WorldDef(robots=[], objects=[Object('object0', shape='circle', size=0.5,
                                            density=0.1, restitution=0.8)])
    super().__init__(w, G)


@cc(ep_len=50, wh_ratio=1.0)
class Bounce2(WorldEnv):
  def __init__(self, G=None):
    w = WorldDef(robots=[], objects=[
        Object(f'object{i}', shape='circle', size=0.5, density=0.1,
               restitution=0.8) for i in range(2)])
    super().__init__(w, G)


@cc(ep_len=50, wh_ratio=1.0)
class Object2(WorldEnv):
  def __init__(self, G=None):
    w = WorldDef(robots=[], objects=[
        Object(f'object{i}', shape='random', size=0.5, density=0.1,
               restitution=0.8) for i in range(2)])
    super().__init__(w, G)


@cc(ep_len=50, wh_ratio=1.0)
class Object3(WorldEnv):
  def __init__(self, G=None):
    w = WorldDef(robots=[], objects=[
        Object(f'object{i}', shape='random', size=0.5, density=0.1,
               restitution=0.8) for i in range(3)])
    super().__init__(w, G)


# -- simple robots ---------------------------------------------------------------

@cc(ep_len=100)
class Urchin(WorldEnv):
  def __init__(self, G=None):
    w = WorldDef(robots=[Robot(type='urchin', name='urchin0')], objects=[])
    super().__init__(w, G)


@cc(ep_len=100)
class Luxo(WorldEnv):
  def __init__(self, G=None):
    w = WorldDef(robots=[Robot(type='luxo', name='luxo0')], objects=[])
    super().__init__(w, G)


# -- robot + object manipulation ---------------------------------------------------

cube_settings = dict(shape='box', size=0.4, density=0.5, linearDamping=1.0,
                     angularDamping=0.2)
ball_settings = dict(shape='circle', size=0.5, density=0.2, restitution=0.8)


@cc(ep_len=150, wh_ratio=1.5)
class UrchinCube(WorldEnv):
  def __init__(self, G=None):
    w = WorldDef(robots=[Robot(type='urchin', name='urchin0')],
                 objects=[Object('object0', **cube_settings)])
    super().__init__(w, G)


@cc(ep_len=150, wh_ratio=1.5)
class LuxoCube(WorldEnv):
  def __init__(self, G=None):
    w = WorldDef(robots=[Robot(type='luxo', name='luxo0')],
                 objects=[Object('object0', **cube_settings)])
    super().__init__(w, G)


@cc(ep_len=150, wh_ratio=1.5)
class UrchinBall(WorldEnv):
  def __init__(self, G=None):
    w = WorldDef(robots=[Robot(type='urchin', name='urchin0')],
                 objects=[Object('object0', **ball_settings)])
    super().__init__(w, G)


@cc(ep_len=150, wh_ratio=1.5)
class LuxoBall(WorldEnv):
  def __init__(self, G=None):
    w = WorldDef(robots=[Robot(type='luxo', name='luxo0')],
                 objects=[Object('object0', **ball_settings)])
    super().__init__(w, G)


class UrchinBalls(WorldEnv):
  def __init__(self, G=None):
    w = WorldDef(robots=[Robot(type='urchin', name='urchin0')],
                 objects=[Object(f'object{i}', **ball_settings) for i in range(3)])
    super().__init__(w, G)


class LuxoBalls(WorldEnv):
  def __init__(self, G=None):
    w = WorldDef(robots=[Robot(type='luxo', name='luxo0')],
                 objects=[Object(f'object{i}', **ball_settings) for i in range(3)])
    super().__init__(w, G)


class UrchinCubes(WorldEnv):
  def __init__(self, G=None):
    w = WorldDef(robots=[Robot(type='urchin', name='urchin0')],
                 objects=[Object(f'object{i}', **cube_settings) for i in range(3)])
    super().__init__(w, G)


class LuxoCubes(WorldEnv):
  def __init__(self, G=None):
    w = WorldDef(robots=[Robot(type='luxo', name='luxo0')],
                 objects=[Object(f'object{i}', **cube_settings) for i in range(3)])
    super().__init__(w, G)


# -- advanced ------------------------------------------------------------------------

@cc(lcd_base=32)
class Crab(WorldEnv):
  def __init__(self, G=None):
    w = WorldDef(robots=[Robot(type='crab', name='crab0')])
    super().__init__(w, G)


@cc(lcd_base=32)
class CrabCube(WorldEnv):
  def __init__(self, G=None):
    w = WorldDef(robots=[Robot(type='crab', name='crab0')],
                 objects=[Object('object0', shape='box', size=0.4, density=1.0,
                                 friction=1.0)])
    super().__init__(w, G)


@cc(lcd_base=32)
class SpiderCube(WorldEnv):
  def __init__(self, G=None):
    w = WorldDef(robots=[Robot(type='spider', name='spider0')],
                 objects=[Object('object0', shape='box', size=0.3, density=0.1,
                                 friction=1.0)])
    super().__init__(w, G)

"""TPU-native 2D rigid-body physics engine.

A fixed-shape, struct-of-arrays re-architecture of the Box2D feature set the
reference testbed relies on (reference: boxLCD/world_env.py:446-452 and the
Box2D C++ library underneath): all-pairs broadphase, circle/polygon/wall
narrowphase manifolds, sequential-impulse velocity solver with warm starting
and restitution, NGS position correction, and revolute joints with motors and
angle limits. Every function is pure and `vmap`s over a leading worlds axis.
"""
from boxlcd_tpu.engine.spec import WorldSpec, compile_world
from boxlcd_tpu.engine.physics import WorldState, init_state, step_world

__all__ = ['WorldSpec', 'compile_world', 'WorldState', 'init_state', 'step_world']

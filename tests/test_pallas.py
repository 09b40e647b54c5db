"""Pallas fused velocity-solver kernel vs the jnp reference path
(interpret mode on CPU; the real kernel runs on TPU via bench/step_world_batch)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import boxlcd_tpu
from boxlcd_tpu.engine import physics
from boxlcd_tpu.engine.pallas_solver import (
    BLOCK, make_batched_solver, make_substep_solver)


def _warm_states(env, B, steps=3):
  spec = env.spec
  keys = jax.random.split(jax.random.PRNGKey(0), B)
  states = jax.vmap(lambda k: boxlcd_tpu.Env.reset(env, k))(keys)
  acts = jax.random.uniform(jax.random.PRNGKey(1), (B, env.act_size),
                            minval=-1, maxval=1)
  # a few steps to build contacts before the comparison step
  warm = jax.jit(lambda s, a: physics.step_world_batch(spec, s, a))
  for _ in range(steps):
    states = warm(states, acts)
  return states, acts


@pytest.mark.parametrize('env_name', ['UrchinBall'])
def test_pallas_velocity_solver_matches_jnp(env_name):
  env = boxlcd_tpu.env_map[env_name]()
  spec = env.spec
  states, acts = _warm_states(env, BLOCK)

  ref = physics.step_world_batch(spec, states, acts)
  solver = make_batched_solver(spec, interpret=True)
  pal = physics.step_world_batch(spec, states, acts, velocity_solver=solver)

  for field in ['v', 'w', 'c', 'a']:
    r = np.asarray(getattr(ref, field))
    p = np.asarray(getattr(pal, field))
    err = np.abs(r - p).max()
    assert err < 1e-4, f'{field} mismatch {err}'


@pytest.mark.parametrize('env_name', ['UrchinBall', 'LuxoCube'])
def test_pallas_substep_solver_matches_jnp(env_name):
  """The fused substep kernel (velocity + integrate + NGS position) must
  reproduce the jnp path including warm-start caches and joint impulses."""
  env = boxlcd_tpu.env_map[env_name]()
  spec = env.spec
  states, acts = _warm_states(env, BLOCK)

  ref = physics.step_world_batch(spec, states, acts)
  solver = make_substep_solver(spec, interpret=True)
  pal = physics.step_world_batch(spec, states, acts, substep_solver=solver)

  # 2e-3: the in-kernel 3x3 joint block evaluates its Cramer products in a
  # different fused order than the jnp path, so agreement is FP-noise-bound;
  # additionally the NGS early-exit flags (physics._position_solve) are hard
  # thresholds — a 1-ulp disagreement on the exit iteration costs one whole
  # extra position iteration on one path (~5e-4 on c)
  for field in ['v', 'w', 'c', 'a', 'wc_imp', 'pc_imp', 'j_imp', 'j_mot',
                'j_lim', 'sleep_time']:
    r = np.asarray(getattr(ref, field))
    p = np.asarray(getattr(pal, field))
    err = np.abs(r - p).max()
    assert err < 2e-3, f'{field} mismatch {err}'

"""Engine cross-validation against the CPU Box2D oracle.

The reference has no test suite (SURVEY.md §4); these tests are the golden
behavioral contract: starting both engines from identical poses, trajectories
must agree within contact-resolution tolerance.
"""
import numpy as np
import pytest

import boxlcd_tpu
from boxlcd_tpu.engine import physics
from tests.oracle import HAVE_BOX2D, Box2DOracle

import jax
import jax.numpy as jnp


def rollout_pair(env_name, steps, seed=0, action_fn=None, iters=None):
  """Run our engine and the Box2D oracle from the same initial state."""
  G = {}
  if iters:
    G = {'vel_iters': iters[0], 'pos_iters': iters[1]}
  env = boxlcd_tpu.env_map[env_name](G)
  oracle = Box2DOracle(env)
  env.seed(seed)
  env.reset()
  st = env.state
  origin = np.asarray(physics.origin_pos(env.spec, st))
  angle = np.asarray(st.a)
  is_circle = np.asarray(st.is_circle)
  oracle.reset_from(origin, angle, is_circle)

  rng = np.random.RandomState(seed)
  ours, theirs = [], []
  for t in range(steps):
    act = (action_fn(rng) if action_fn else np.zeros(env.act_size))
    env.step(act)
    oracle.step(act)
    o = np.asarray(physics.origin_pos(env.spec, env.state))
    g, ga = oracle.poses()
    ours.append((o, np.asarray(env.state.a)))
    theirs.append((g, ga))
  return env, ours, theirs


@pytest.mark.skipif(not HAVE_BOX2D, reason='pybox2d not available')
@pytest.mark.parametrize('env_name,steps,tol', [
    # tolerances pinned ~2x above values measured in PARITY.md (0.027/0.118)
    ('Dropbox', 25, 0.05),
    ('Bounce', 50, 0.20),
])
def test_passive_golden(env_name, steps, tol):
  env, ours, theirs = rollout_pair(env_name, steps)
  errs = [np.abs(o[0] - t[0]).max() for o, t in zip(ours, theirs)]
  # mean position error across the episode within tolerance (world is 5x5m)
  assert np.mean(errs) < tol, f'mean traj err {np.mean(errs):.3f}'


@pytest.mark.skipif(not HAVE_BOX2D, reason='pybox2d not available')
def test_urchin_golden():
  """Actuated robot vs Box2D over a short horizon (the dynamics are chaotic,
  so long-horizon pointwise comparison is meaningless — see SURVEY.md §7 on
  the trajectory-divergence metric)."""
  env, ours, theirs = rollout_pair(
      'Urchin', 6,
      action_fn=lambda rng: rng.uniform(-1, 1, 3).astype(np.float32))
  errs = [np.abs(o[0] - t[0]).max() for o, t in zip(ours, theirs)]
  assert errs[0] < 0.15, f'step-0 err {errs[0]:.3f}'
  assert np.mean(errs[:4]) < 0.3, f'4-step mean err {np.mean(errs[:4]):.3f}'


def test_energy_sanity():
  """A resting box must stay put; no explosion, no sinking through floor."""
  env = boxlcd_tpu.env_map['Dropbox']()
  env.seed(3)
  env.reset()
  ys = []
  for _ in range(25):
    env.step(np.zeros(env.act_size))
    ys.append(float(physics.origin_pos(env.spec, env.state)[0, 1]))
  # settled on the floor: y ~ half-size (0.7) and stable at the end
  assert 0.5 < ys[-1] < 0.95, f'final y {ys[-1]}'
  assert abs(ys[-1] - ys[-5]) < 0.02


def test_vmap_batching():
  """Batched reset/step over a worlds axis must work and stay finite."""
  env = boxlcd_tpu.env_map['Urchin']()
  B = 16
  keys = jax.random.split(jax.random.PRNGKey(0), B)
  states = jax.vmap(lambda k: boxlcd_tpu.Env.reset(env, k))(keys)
  acts = jnp.zeros((B, env.act_size))
  step = jax.jit(jax.vmap(lambda s, a: boxlcd_tpu.Env.step(env, s, a)[0]))
  for _ in range(5):
    states = step(states, acts)
  assert bool(jnp.isfinite(states.c).all())
  assert states.c.shape == (B, env.spec.n, 2)


def test_sleeping():
  """Settled bodies must sleep and freeze exactly (Box2D island sleeping)."""
  env = boxlcd_tpu.env_map['Dropbox']()
  env.seed(5)
  env.reset()
  poses = []
  for t in range(25):
    env.step(np.zeros(env.act_size))
    poses.append((np.asarray(env.state.c).copy(), np.asarray(env.state.a).copy()))
  # by the end the box is asleep: consecutive poses bitwise identical
  assert (poses[-1][0] == poses[-2][0]).all() and (poses[-1][1] == poses[-2][1]).all(), \
      'settled body should be asleep (frozen pose)'
  assert np.asarray(env.state.sleep_time).min() > 0


@pytest.mark.skipif(not HAVE_BOX2D, reason='pybox2d not available')
def test_luxo_golden():
  env, ours, theirs = rollout_pair(
      'Luxo', 6,
      action_fn=lambda rng: rng.uniform(-1, 1, 3).astype(np.float32))
  errs = [np.abs(o[0] - t[0]).max() for o, t in zip(ours, theirs)]
  assert errs[0] < 0.15, f'step-0 err {errs[0]:.3f}'
  assert np.mean(errs[:4]) < 0.35, f'4-step mean err {np.mean(errs[:4]):.3f}'


def test_offset_obs_roundtrip():
  """root_offset/angular_offset obs encodings roundtrip through teleport
  (reference: world_env.py:95-100, 369, 377-379, 412-418)."""
  env = boxlcd_tpu.env_map['Urchin']({'root_offset': 1, 'angular_offset': 1})
  env.seed(11)
  obs = env.reset()
  target = obs['full_state'].copy()
  obs2 = env.reset(full_state=target)
  err = np.abs(obs2['full_state'] - target).max()
  assert err < 1e-4, f'teleport roundtrip err {err}'


def test_object3_teleport_random_shapes():
  """reset(full_state=) roundtrip for objects whose shape is chosen
  per-episode ('random', reference world_env.py:273-274)."""
  env = boxlcd_tpu.env_map['Object3']()
  env.seed(7)
  obs = env.reset()
  target = obs['full_state'].copy()
  obs2 = env.reset(full_state=target)
  err = np.abs(obs2['full_state'] - target).max()
  assert err < 1e-4, f'teleport roundtrip err {err}'


def test_prefactored_solvers_match_originals():
  """The megakernel's hoisted solves (_joint_block_pre via
  joint_block_prefactor, _block_lcp_pre) must agree with the per-sweep
  originals to reassociation noise on random well-conditioned inputs."""
  import jax.numpy as jnp
  from boxlcd_tpu.engine.physics import (
      _block_lcp, _block_lcp_pre, _joint_block, _joint_block_pre,
      joint_block_prefactor)
  rng = np.random.RandomState(0)
  N = 4096
  # joint block: random SPD-ish 3x3 built like the revolute K
  mA, mB = rng.uniform(0.5, 3, N), rng.uniform(0.5, 3, N)
  iA, iB = rng.uniform(0.2, 5, N), rng.uniform(0.2, 5, N)
  rAx, rAy = rng.uniform(-1, 1, N), rng.uniform(-1, 1, N)
  rBx, rBy = rng.uniform(-1, 1, N), rng.uniform(-1, 1, N)
  k11 = mA + mB + iA * rAy ** 2 + iB * rBy ** 2
  k12 = -iA * rAx * rAy - iB * rBx * rBy
  k13 = -iA * rAy - iB * rBy
  k22 = mA + mB + iA * rAx ** 2 + iB * rBx ** 2
  k23 = iA * rAx + iB * rBx
  k33 = iA + iB
  args = [jnp.asarray(x, jnp.float32) for x in
          (rng.randint(0, 4, N).astype(np.float32),
           rng.randn(N), rng.randn(N), rng.randn(N), rng.randn(N))]
  Ks = [jnp.asarray(x, jnp.float32) for x in (k11, k12, k13, k22, k23, k33)]
  ref = _joint_block(*args, *Ks)
  pre = _joint_block_pre(*args, *joint_block_prefactor(*Ks))
  for r, p in zip(ref, pre):
    d = np.abs(np.asarray(r) - np.asarray(p))
    assert d.max() < 1e-4, f'joint block mismatch {d.max()}'
  # contact 2x2 block LCP
  kn1 = np.float32(rng.uniform(0.5, 5, N))
  kn2 = np.float32(rng.uniform(0.5, 5, N))
  c12 = np.float32(rng.uniform(-0.5, 0.5, N))
  det = kn1 * kn2 - c12 * c12
  idet = np.where(np.abs(det) > 1e-12, 1.0 / np.where(det == 0, 1, det), 0.0)
  b1, b2 = np.float32(rng.randn(N)), np.float32(rng.randn(N))
  a1, a2 = np.float32(rng.uniform(0, 1, N)), np.float32(rng.uniform(0, 1, N))
  nm1, nm2 = 1.0 / kn1, 1.0 / kn2
  ref = _block_lcp(b1, b2, a1, a2, kn1, kn2, c12, nm1, nm2)
  pre = _block_lcp_pre(b1, b2, a1, a2, kn1, kn2, c12,
                       kn2 * idet, c12 * idet, kn1 * idet, nm1, nm2)
  for r, p in zip(ref, pre):
    d = np.abs(np.asarray(r) - np.asarray(p))
    assert d.max() < 1e-4, f'block lcp mismatch {d.max()}'

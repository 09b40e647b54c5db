"""Rollout megakernel (engine/mega.py) vs the jnp step path.

The megakernel re-implements the full substep pipeline (narrowphase ->
presolve -> velocity GS -> integrate -> NGS -> sleep) in tile form; these
tests pin it to physics.step_world_batch — which is itself golden-tested
against real pybox2d (tests/test_engine.py) — over multi-step rollouts
with contacts, motors and sleeping in play.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import boxlcd_tpu
from boxlcd_tpu.engine import mega, physics
from boxlcd_tpu.envs.env import Env

FIELDS = ['c', 'a', 'v', 'w', 'sleep_time', 'wc_imp', 'j_imp', 'j_mot',
          'j_lim', 'j_state', 'prev_motor', 'pc_imp', 'pc_id']


# Urchin/Luxo cover the pairless-robot (v1) path; v2 adds body-body contact
# pairs (LuxoCube poly-poly + robot, Bounce2 circle-circle, UrchinBall
# mixed circle/poly + robot) and per-episode RANDOM shapes (Object3).
#
# Per-env bounds (median, tail threshold, tail fraction, min sleep rate):
# bouncy object envs are chaotic at T=34 — the jnp path vs ITSELF with a
# single 1e-7 perturbation at t=0 diverges to median 4e-5 / p90 2.4e-3 /
# 6.7% tail>5e-3 on Object3 (restitution 0.8, pair contacts rotate the
# contact normal, SAT face choice is discrete), and the kernel injects
# fresh op-order noise every step. Bounds there are the measured chaos
# floor with ~2x headroom; robots keep the tight v1 bounds. Bounce2/Object3
# never settle (2-3% sleepers), so the sleep-engagement premise only
# applies to envs that do.
BOUNDS = {
    'Urchin': (1e-4, 5e-3, 0.03, 0.2),
    'Luxo': (1e-4, 5e-3, 0.03, 0.2),
    'LuxoCube': (1e-4, 5e-3, 0.03, 0.2),
    'UrchinBall': (1e-4, 5e-3, 0.03, 0.2),
    'Bounce2': (1e-4, 5e-3, 0.03, None),
    'Object3': (1.5e-3, 5e-2, 0.2, None),
}


@pytest.mark.parametrize('env_name', list(BOUNDS))
def test_mega_rollout_matches_step_world_batch(env_name):
  med_bound, tail_at, tail_frac, sleep_min = BOUNDS[env_name]
  env = boxlcd_tpu.env_map[env_name]()
  spec = env.spec
  if not mega.supports(spec):
    pytest.skip('megakernel does not support this env')
  B = mega.BLOCK
  keys = jax.random.split(jax.random.PRNGKey(0), B)
  states = jax.jit(jax.vmap(lambda k: Env.reset(env, k)))(keys)
  # 4 random-action steps (contacts + motors churning), then 30 zero-action
  # steps so velocities settle and the island sleep path engages
  T = 34
  acts = jnp.concatenate([
      jax.random.uniform(jax.random.PRNGKey(1), (4, B, env.act_size),
                         minval=-1, maxval=1),
      jnp.zeros((30, B, env.act_size))], axis=0)
  # reference: T steps through the jnp path, recording poses per step
  ref = states
  ref_traj = []
  step = jax.jit(lambda s, a: physics.step_world_batch(spec, s, a))
  for t in range(T):
    ref = step(ref, acts[t])
    ref_traj.append((np.asarray(ref.c), np.asarray(ref.a)))

  # megakernel: same motor-speed mapping as step_world_batch
  has_act = spec.j_act >= 0
  idx = np.maximum(spec.j_act, 0)
  ms = jnp.where(jnp.asarray(has_act)[None, None],
                 jnp.clip(acts, -1, 1)[:, :, idx]
                 * jnp.asarray(spec.j_speed)[None, None], 0.0)
  rollout = mega.make_rollout(spec, T, interpret=True)
  new_states, traj = jax.jit(rollout)(states, ms)

  # agreement is FP-noise-limited: the kernel accumulates warm-start /
  # Gauss-Seidel sums in a different (sequential) order than the jnp path's
  # vector reduces, and contact dynamics amplify that ~1e-6 noise
  # exponentially in a small tail of worlds (measured: median per-world
  # error flat at ~2e-6 over 34 steps while the max grows to ~7e-2 in ~1.5%
  # of worlds). Assert tight medians and a bounded divergent tail.
  for f in FIELDS:
    r = np.asarray(getattr(ref, f), np.float32)
    m = np.asarray(getattr(new_states, f), np.float32)
    err = np.abs(r - m).reshape(B, -1).max(axis=1)   # per-world
    assert np.median(err) < med_bound, f'{f} median mismatch {np.median(err)}'
    assert (err > tail_at).mean() < tail_frac, \
        f'{f} tail {(err > tail_at).mean()}'
  # pre-chaos steps must match tightly everywhere
  for t in (0, 2):
    rc, ra = ref_traj[t]
    assert np.abs(np.asarray(traj['c'][t]) - rc).max() < 1e-4, f'traj c @{t}'
    assert np.abs(np.asarray(traj['a'][t]) - ra).max() < 1e-4, f'traj a @{t}'
  # sleeping must engage at the same rate; the engagement premise only
  # holds for envs that settle (bouncy object envs stay awake)
  f_ref = (np.asarray(ref.sleep_time) > 0).mean()
  f_mega = (np.asarray(new_states.sleep_time) > 0).mean()
  if sleep_min is not None:
    assert f_ref > sleep_min
  assert abs(f_ref - f_mega) < 0.02, (f_ref, f_mega)


def test_mega_collect_layout_and_reset_obs():
  """Megakernel collection writes the same barrel layout as the jnp path,
  and — since both derive reset keys identically — the t=0 observations
  must match bitwise."""
  from boxlcd_tpu.data.collect import make_mega_rollout_fn, make_rollout_fn
  env = boxlcd_tpu.env_map['Luxo']({'ep_len': 6})
  if not mega.supports(env.spec):
    pytest.skip('unsupported')
  key = jax.random.PRNGKey(3)
  fn_j, T = make_rollout_fn(env, pack_lcd=True)
  fn_m, Tm = make_mega_rollout_fn(env, pack_lcd=True, interpret=True,
                                  chunk=3)
  assert T == Tm == 6
  B = 8  # mega pads to BLOCK internally and slices back
  out_j = jax.tree_util.tree_map(np.asarray, fn_j(key, B))
  out_m = jax.tree_util.tree_map(np.asarray, fn_m(key, B))
  # silent-corruption tripwire must be present and green (see collect.py)
  assert bool(out_m.pop('obs_ok'))
  assert set(out_j) == set(out_m)
  for k in out_j:
    assert out_j[k].shape == out_m[k].shape, k
    assert out_j[k].dtype == out_m[k].dtype, k
  for k in ('lcd', 'full_state', 'proprio'):
    assert np.array_equal(out_j[k][:, 0], out_m[k][:, 0]), f'{k} @t=0'


def test_mega_skip_inert_bit_exact(monkeypatch):
  """BOXLCD_MEGA_SKIP (batch-granular inert-constraint skip, default on) must
  be bit-exact vs BOXLCD_MEGA_SKIP=force — the SAME cond-guarded graph with
  every activity flag forced true, so inert blocks actually execute and must
  be no-ops (zero effective masses + where(touch,..)-masked accumulators).
  The unguarded (skip=0) kernel is NOT a bit-exact oracle: lax.cond is an
  XLA fusion boundary, so inlining the sweeps changes FMA-contraction
  choices by ~1 ulp on ACTIVE blocks; vs skip=0 we only assert a loose
  tolerance (ulp seed x bounded chaotic growth over the short horizon)."""
  env = boxlcd_tpu.env_map['LuxoCube']()   # walls + body-body pair + joints
  spec = env.spec
  if not mega.supports(spec):
    pytest.skip('megakernel does not support this env')
  B = mega.BLOCK
  keys = jax.random.split(jax.random.PRNGKey(3), B)
  states = jax.jit(jax.vmap(lambda k: Env.reset(env, k)))(keys)
  T = 8
  acts = jnp.concatenate([
      jax.random.uniform(jax.random.PRNGKey(4), (4, B, env.act_size),
                         minval=-1, maxval=1),
      jnp.zeros((T - 4, B, env.act_size))], axis=0)
  has_act = spec.j_act >= 0
  idx = np.maximum(spec.j_act, 0)
  ms = jnp.where(jnp.asarray(has_act)[None, None],
                 jnp.clip(acts, -1, 1)[:, :, idx]
                 * jnp.asarray(spec.j_speed)[None, None], 0.0)

  outs = {}
  for flag in ('1', 'force', '0'):
    monkeypatch.setenv('BOXLCD_MEGA_SKIP', flag)
    rollout = mega.make_rollout(spec, T, interpret=True)
    new_states, traj = jax.jit(rollout)(states, ms)
    outs[flag] = (new_states, traj)

  for f in FIELDS:
    a = np.asarray(getattr(outs['1'][0], f))
    b = np.asarray(getattr(outs['force'][0], f))
    # +0.0 normalizes -0.0 so only the sign of exact zeros may differ
    assert np.array_equal(a + 0.0, b + 0.0), f'state field {f}'
    c = np.asarray(getattr(outs['0'][0], f))
    assert np.allclose(a, c, atol=5e-4), f'state field {f} vs unguarded'
  for k in outs['1'][1]:
    a = np.asarray(outs['1'][1][k]) + 0.0
    b = np.asarray(outs['force'][1][k]) + 0.0
    assert np.array_equal(a, b), f'traj field {k}'

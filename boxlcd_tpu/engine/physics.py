"""Fixed-shape rigid-body step: the TPU-native replacement for b2World::Step.

Implements the Box2D solver pipeline the reference leans on
(reference: boxLCD/world_env.py:446-452 — `Step(1/(3*fps), 180, 60)` x3):

  integrate velocities -> narrowphase -> warm start -> sequential-impulse
  velocity iterations (joints, then contacts, Gauss-Seidel over constraint
  slots) -> integrate positions -> non-linear Gauss-Seidel position
  iterations (joint limits/points + contact penetration).

All shapes are static: contacts live in fixed arenas (bodies x walls x 2 and
precompiled body pairs x 2) with validity masks. One world's step is pure;
batching is `jax.vmap` over a leading worlds axis, sharding is `shard_map`
over a device mesh on top of that.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from boxlcd_tpu.engine import collision
from boxlcd_tpu.engine.collision import Geom, make_geom, rot_mat
from boxlcd_tpu.engine.spec import WorldSpec

# Solver loops stay compact (unroll=1): a round-3 A/B showed full
# constraint-slot unrolling does NOT help on TPU (18.0 vs 19.5 ms/step —
# cost tracks HLO op count, not flops; PROGRESS.md round-3 finding 3), and
# compact scans compile ~10x faster. The fused-kernel answer to launch
# overhead is engine/mega.py, not unrolling this path.

# Box2D b2Settings constants
BAUMGARTE = 0.2
LINEAR_SLOP = 0.005
ANGULAR_SLOP = 2.0 / 180.0 * jnp.pi
MAX_LINEAR_CORRECTION = 0.2
MAX_ANGULAR_CORRECTION = 8.0 / 180.0 * jnp.pi
VELOCITY_THRESHOLD = 1.0
TIME_TO_SLEEP = 0.5                      # b2_timeToSleep
LIN_SLEEP_TOL_SQ = 0.01 ** 2             # b2_linearSleepTolerance^2
ANG_SLEEP_TOL_SQ = (2.0 / 180.0 * 3.14159265) ** 2


def cross_sv(w, r):
  """scalar x vector: w x r = (-w*ry, w*rx)."""
  return jnp.stack([-w * r[..., 1], w * r[..., 0]], axis=-1)


def cross_vv(a, b):
  return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def perp(n):
  """tangent = cross(n, 1) = (ny, -nx)."""
  return jnp.stack([n[..., 1], -n[..., 0]], axis=-1)


def _block_lcp(b1, b2, a1, a2, k11, k22, k12, nm1, nm2):
  """Box2D's 2-point normal block solve: the 2x2 LCP case enumeration from
  b2ContactSolver::SolveVelocityConstraints. b1/b2 are the biased relative
  normal velocities at the two points, a1/a2 the accumulated impulses, K the
  2-point effective-mass matrix, nm1/nm2 the per-point normal masses.
  Returns impulse deltas (d1, d2); if no case holds, Box2D leaves the
  impulses unchanged (delta 0). All math is elementwise (any batch shape).
  """
  # b' = b - K a
  b1p = b1 - (k11 * a1 + k12 * a2)
  b2p = b2 - (k12 * a1 + k22 * a2)
  det = k11 * k22 - k12 * k12
  idet = jnp.where(jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1.0, det),
                   0.0)
  # case 1: both points active -> x = -K^-1 b'
  x1_1 = -(k22 * b1p - k12 * b2p) * idet
  x2_1 = -(k11 * b2p - k12 * b1p) * idet
  ok1 = (x1_1 >= 0.0) & (x2_1 >= 0.0)
  # case 2: point 2 inactive
  x1_2 = -nm1 * b1p
  ok2 = (x1_2 >= 0.0) & (k12 * x1_2 + b2p >= 0.0)
  # case 3: point 1 inactive
  x2_3 = -nm2 * b2p
  ok3 = (x2_3 >= 0.0) & (k12 * x2_3 + b1p >= 0.0)
  # case 4: both inactive
  ok4 = (b1p >= 0.0) & (b2p >= 0.0)
  x1 = jnp.where(ok1, x1_1,
                 jnp.where(ok2, x1_2,
                           jnp.where(ok3, 0.0, jnp.where(ok4, 0.0, a1))))
  x2 = jnp.where(ok1, x2_1,
                 jnp.where(ok2, 0.0,
                           jnp.where(ok3, x2_3, jnp.where(ok4, 0.0, a2))))
  return x1 - a1, x2 - a2


def _block_lcp_pre(b1, b2, a1, a2, k11, k22, k12, i11, i12, i22, nm1, nm2):
  """_block_lcp with the 2x2 inverse prefactored (i11=k22/det, i12=k12/det,
  i22=k11/det, guarded like _block_lcp's idet). The effective-mass matrix is
  constant across a substep's velocity sweeps (Box2D precomputes it in
  b2ContactSolver::InitializeVelocityConstraints), so the megakernel hoists
  the determinant + divide out of the 180-iteration loop; results differ
  from _block_lcp only by mul-by-reciprocal reassociation (ulp class)."""
  b1p = b1 - (k11 * a1 + k12 * a2)
  b2p = b2 - (k12 * a1 + k22 * a2)
  x1_1 = -(i11 * b1p - i12 * b2p)
  x2_1 = -(i22 * b2p - i12 * b1p)
  ok1 = (x1_1 >= 0.0) & (x2_1 >= 0.0)
  x1_2 = -nm1 * b1p
  ok2 = (x1_2 >= 0.0) & (k12 * x1_2 + b2p >= 0.0)
  x2_3 = -nm2 * b2p
  ok3 = (x2_3 >= 0.0) & (k12 * x2_3 + b1p >= 0.0)
  ok4 = (b1p >= 0.0) & (b2p >= 0.0)
  x1 = jnp.where(ok1, x1_1,
                 jnp.where(ok2, x1_2,
                           jnp.where(ok3, 0.0, jnp.where(ok4, 0.0, a1))))
  x2 = jnp.where(ok1, x2_1,
                 jnp.where(ok2, 0.0,
                           jnp.where(ok3, x2_3, jnp.where(ok4, 0.0, a2))))
  return x1 - a1, x2 - a2


def joint_block_prefactor(k11, k12, k13, k22, k23, k33):
  """Prefactor the revolute 3x3 effective mass for _joint_block_pre: the
  Cramer cofactors/determinants of _joint_block divided through once (they
  are constant across a substep's velocity iterations). Returns the tuple
  _joint_block_pre expects after (state, cd1x, cd1y, cd2, jlim)."""
  a11 = k22 * k33 - k23 * k23
  a12 = k13 * k23 - k12 * k33
  a13 = k12 * k23 - k13 * k22
  a22 = k11 * k33 - k13 * k13
  a23 = k13 * k12 - k11 * k23
  a33 = k11 * k22 - k12 * k12
  det3 = k11 * a11 + k12 * a12 + k13 * a13
  det3 = jnp.where(jnp.abs(det3) > 1e-12, det3, 1.0)
  det2 = k11 * k22 - k12 * k12
  det2 = jnp.where(jnp.abs(det2) > 1e-12, det2, 1.0)
  return (a11 / det3, a12 / det3, a13 / det3, a22 / det3, a23 / det3,
          a33 / det3, k22 / det2, k12 / det2, k11 / det2, k13, k23)


def _joint_block_pre(state, cd1x, cd1y, cd2, jlim,
                     m11, m12, m13, m22, m23, m33, e11, e12, e22, k13, k23):
  """_joint_block with the 3x3/2x2 inverses prefactored (see
  joint_block_prefactor); identical case logic, divides hoisted out of the
  velocity loop. Differs from _joint_block only by reassociation (ulp)."""
  ix = -(m11 * cd1x + m12 * cd1y + m13 * cd2)
  iy = -(m12 * cd1x + m22 * cd1y + m23 * cd2)
  iz = -(m13 * cd1x + m23 * cd1y + m33 * cd2)
  r1 = -cd1x + jlim * k13
  r2 = -cd1y + jlim * k23
  rx = e11 * r1 - e12 * r2
  ry = e22 * r2 - e12 * r1
  new_z = jlim + iz
  lo_clamp = (state == 1) & (new_z < 0.0)
  hi_clamp = (state == 2) & (new_z > 0.0)
  clamp = lo_clamp | hi_clamp
  dx_act = jnp.where(clamp, rx, ix)
  dy_act = jnp.where(clamp, ry, iy)
  dz_act = jnp.where(clamp, -jlim, iz)
  px = -(e11 * cd1x - e12 * cd1y)
  py = -(e22 * cd1y - e12 * cd1x)
  active = state > 0
  dx = jnp.where(active, dx_act, px)
  dy = jnp.where(active, dy_act, py)
  dz = jnp.where(active, dz_act, 0.0)
  return dx, dy, dz


def _joint_block(state, cd1x, cd1y, cd2, jlim,
                 k11, k12, k13, k22, k23, k33):
  """Box2D 2.3's coupled revolute limit+point velocity solve
  (b2RevoluteJoint::SolveVelocityConstraints): when the limit is active
  (state 1=lower/2=upper/3=equal), point (x,y) and limit (z) are one 3x3
  system with case-wise clamping that re-solves the reduced 2x2 when the
  accumulated limit impulse would cross zero; when inactive (0), the point
  solves alone. K is the symmetric 3x3 effective mass (k13=ez.x, k23=ez.y).
  Elementwise over any batch shape. Returns (dx, dy, dz) impulse deltas
  (dz accumulates into the limit impulse)."""
  # -- full 3x3 solve: impulse = -K^-1 Cdot (Cramer on the symmetric K)
  a11 = k22 * k33 - k23 * k23
  a12 = k13 * k23 - k12 * k33
  a13 = k12 * k23 - k13 * k22
  a22 = k11 * k33 - k13 * k13
  a23 = k13 * k12 - k11 * k23
  a33 = k11 * k22 - k12 * k12
  det3 = k11 * a11 + k12 * a12 + k13 * a13
  det3 = jnp.where(jnp.abs(det3) > 1e-12, det3, 1.0)
  ix = -(a11 * cd1x + a12 * cd1y + a13 * cd2) / det3
  iy = -(a12 * cd1x + a22 * cd1y + a23 * cd2) / det3
  iz = -(a13 * cd1x + a23 * cd1y + a33 * cd2) / det3
  # -- reduced 2x2 re-solve when the limit accumulator would cross zero:
  # rhs = -Cdot1 + jlim * ez_xy ; reduced = K22^-1 rhs ; dz = -jlim
  det2 = k11 * k22 - k12 * k12
  det2 = jnp.where(jnp.abs(det2) > 1e-12, det2, 1.0)
  r1 = -cd1x + jlim * k13
  r2 = -cd1y + jlim * k23
  rx = (k22 * r1 - k12 * r2) / det2
  ry = (k11 * r2 - k12 * r1) / det2
  new_z = jlim + iz
  lo_clamp = (state == 1) & (new_z < 0.0)
  hi_clamp = (state == 2) & (new_z > 0.0)
  clamp = lo_clamp | hi_clamp
  dx_act = jnp.where(clamp, rx, ix)
  dy_act = jnp.where(clamp, ry, iy)
  dz_act = jnp.where(clamp, -jlim, iz)
  # -- inactive limit: plain point 2x2
  px = -(k22 * cd1x - k12 * cd1y) / det2
  py = -(k11 * cd1y - k12 * cd1x) / det2
  active = state > 0
  dx = jnp.where(active, dx_act, px)
  dy = jnp.where(active, dy_act, py)
  dz = jnp.where(active, dz_act, 0.0)
  return dx, dy, dz


class WorldState(NamedTuple):
  """Dynamic state of one world (vmap over a leading axis for batches)."""
  c: jnp.ndarray          # (N, 2) world center-of-mass positions
  a: jnp.ndarray          # (N,)   angles
  v: jnp.ndarray          # (N, 2) linear velocities (of com)
  w: jnp.ndarray          # (N,)   angular velocities
  is_circle: jnp.ndarray  # (N,)   bool, per-episode shape choice
  ep_t: jnp.ndarray       # ()     int32 step counter
  # warm-start caches (persist across substeps and steps)
  wc_imp: jnp.ndarray     # (N, W, 2, 2) wall-contact [pn, pt]
  wc_id: jnp.ndarray      # (N, W, 2) int32
  pc_imp: jnp.ndarray     # (P, 2, 2) pair-contact [pn, pt]
  pc_id: jnp.ndarray      # (P, 2) int32
  j_imp: jnp.ndarray      # (J, 2) joint point impulse
  j_mot: jnp.ndarray      # (J,) motor impulse
  j_lim: jnp.ndarray      # (J,) limit impulse (Box2D 2.3 single accumulator)
  j_state: jnp.ndarray    # (J,) int32 limit state: 0 inactive, 1 lower, 2 upper, 3 equal
  j_ref: jnp.ndarray      # (J,) reference angle, set at reset: pybox2d's
                          # revoluteJointDef(bodyA=..., bodyB=...) initializes
                          # referenceAngle to the spawn relative angle, so
                          # limits are relative to the spawn configuration
  sleep_time: jnp.ndarray  # (N,) seconds below the sleep velocity tolerances
  prev_motor: jnp.ndarray  # (J,) last motor speeds (changes wake the island,
                           # as pybox2d's SetMotorSpeed does)


def init_state(spec: WorldSpec) -> WorldState:
  n = spec.n
  nw = len(spec.wall_offset)
  p = len(spec.pair_a)
  j = len(spec.j_parent)
  return WorldState(
      c=jnp.zeros((n, 2)), a=jnp.zeros(n), v=jnp.zeros((n, 2)),
      w=jnp.zeros(n), is_circle=jnp.asarray(spec.shape_static == 0),
      ep_t=jnp.zeros((), jnp.int32),
      wc_imp=jnp.zeros((n, nw, 2, 2)), wc_id=jnp.full((n, nw, 2), -1, jnp.int32),
      pc_imp=jnp.zeros((p, 2, 2)), pc_id=jnp.full((p, 2), -1, jnp.int32),
      j_imp=jnp.zeros((j, 2)), j_mot=jnp.zeros(j),
      j_lim=jnp.zeros(j), j_state=jnp.zeros(j, jnp.int32),
      j_ref=jnp.zeros(j), sleep_time=jnp.zeros(n), prev_motor=jnp.zeros(j))


def body_inv_mass(spec: WorldSpec, is_circle):
  inv_m = jnp.where(is_circle, spec.inv_m[:, 0], spec.inv_m[:, 1])
  inv_i = jnp.where(is_circle, spec.inv_i[:, 0], spec.inv_i[:, 1])
  return inv_m, inv_i


def local_center(spec: WorldSpec, is_circle):
  return jnp.where(is_circle[:, None], spec.local_center[:, 0],
                   spec.local_center[:, 1])


def origin_pos(spec: WorldSpec, state: WorldState):
  """Body-origin positions (what Box2D reports as body.position)."""
  lc = local_center(spec, state.is_circle)
  rot = rot_mat(state.a)
  return state.c - jnp.einsum('nij,nj->ni', rot, lc)


def com_from_origin(spec: WorldSpec, is_circle, origin, angle):
  lc = local_center(spec, is_circle)
  rot = rot_mat(angle)
  return origin + jnp.einsum('nij,nj->ni', rot, lc)


def _match_impulses(new_ids, touch, old_ids, old_imp):
  """Carry accumulated impulses for persisting contact points (warm start)."""
  # (..., 2 new, 2 old) id equality; old impulses were zeroed if not touching
  eq = new_ids[..., :, None] == old_ids[..., None, :]
  imp = jnp.einsum('...no,...oc->...nc', eq.astype(old_imp.dtype), old_imp)
  return jnp.where(touch[..., None], imp, 0.0)


class SolveBundle(NamedTuple):
  """Everything the velocity-iteration loop consumes/produces for one world.

  The loop is the solver hot spot; isolating its I/O lets a batched caller
  swap in the Pallas kernel (engine/pallas_solver.py) between the vmapped
  pre/post stages."""
  # mutable carry
  v: jnp.ndarray          # (N, 2)
  w: jnp.ndarray          # (N,)
  j_imp: jnp.ndarray      # (J, 2)
  j_mot: jnp.ndarray      # (J,)
  j_lim: jnp.ndarray      # (J,)
  wc: jnp.ndarray         # (N, W, 2, 2)
  pc: jnp.ndarray         # (P, 2, 2)
  # constants for this substep
  inv_m: jnp.ndarray      # (N,)
  inv_i: jnp.ndarray      # (N,)
  j_rA: jnp.ndarray       # (J, 2)
  j_rB: jnp.ndarray       # (J, 2)
  j_axmass: jnp.ndarray   # (J,)
  j_state: jnp.ndarray    # (J,) int32
  j_mA: jnp.ndarray       # (J,)
  j_mB: jnp.ndarray
  j_iA: jnp.ndarray
  j_iB: jnp.ndarray
  motor_speed: jnp.ndarray  # (J,)
  w_rB: jnp.ndarray       # (N, W, 2, 2)
  w_nmass: jnp.ndarray    # (N, W, 2)
  w_tmass: jnp.ndarray    # (N, W, 2)
  w_bias: jnp.ndarray     # (N, W, 2)
  w_mu: jnp.ndarray       # (N,)
  w_k: jnp.ndarray        # (N, W, 2) raw normal-direction effective masses k11,k22
  w_k12: jnp.ndarray      # (N, W) off-diagonal of the 2-point K matrix
  w_block: jnp.ndarray    # (N, W) bool: solve both points as a 2x2 block
  p_n: jnp.ndarray        # (P, 2)
  p_rA: jnp.ndarray       # (P, 2, 2)
  p_rB: jnp.ndarray       # (P, 2, 2)
  p_nmass: jnp.ndarray    # (P, 2)
  p_tmass: jnp.ndarray    # (P, 2)
  p_bias: jnp.ndarray     # (P, 2)
  p_mu: jnp.ndarray       # (P,)
  p_imA: jnp.ndarray      # (P,)
  p_imB: jnp.ndarray
  p_iiA: jnp.ndarray
  p_iiB: jnp.ndarray
  p_k: jnp.ndarray        # (P, 2) raw k11,k22
  p_k12: jnp.ndarray      # (P,)
  p_block: jnp.ndarray    # (P,) bool


class PostAux(NamedTuple):
  """Pre-solve products the position/sleep stages need."""
  wallm: object
  pairm: object
  j_state: jnp.ndarray
  lc: jnp.ndarray


def _vel_iteration(spec: WorldSpec, b: SolveBundle):
  """Build the one-iteration Gauss-Seidel body for one world's velocity solve.

  Returns `(vel_iter_core, init)` where `vel_iter_core(carry) -> (carry, dm)`
  runs one full sweep (joints -> walls -> pairs, Box2D island order baked
  into the spec) and `dm` is the sweep's largest |impulse delta|. Used by
  `velocity_solve` and by research/scripts/exit_probe.py to record
  per-iteration residuals.
  """
  dt = spec.dt
  nw = len(spec.wall_offset)
  wall_n = jnp.asarray(spec.wall_normal)
  j_pa, j_ch = jnp.asarray(spec.j_parent), jnp.asarray(spec.j_child)
  pair_a, pair_b = jnp.asarray(spec.pair_a), jnp.asarray(spec.pair_b)
  j_equal = jnp.asarray(spec.j_limited & (spec.j_lower == spec.j_upper))
  j_valid = jnp.asarray(spec.j_valid)
  max_torque = jnp.asarray(spec.j_torque)

  def joint_pass(carry):
    # `dm` tracks the iteration's largest |impulse delta| for the optional
    # convergence exit; on the fixed-trip path it is unused and DCE'd.
    v, w, j_imp, j_mot, j_lim, dm = carry

    def one_joint(vw, j):
      v, w, j_imp, j_mot, j_lim, dm = vw
      pa, ch = j_pa[j], j_ch[j]
      iA, iB, mA, mB = b.j_iA[j], b.j_iB[j], b.j_mA[j], b.j_mB[j]
      rA, rB = b.j_rA[j], b.j_rB[j]
      # motor (inactive when limits are equal; reference keeps motors enabled
      # on every joint, world_env.py:255-267)
      cdot = w[ch] - w[pa] - b.motor_speed[j]
      imp = -b.j_axmass[j] * cdot
      cap = max_torque[j] * dt
      new = jnp.clip(j_mot[j] + imp, -cap, cap)
      d = jnp.where(j_equal[j], 0.0, new - j_mot[j]) * j_valid[j]
      j_mot = j_mot.at[j].add(d)
      w = w.at[pa].add(-iA * d).at[ch].add(iB * d)
      # coupled limit+point solve (b2RevoluteJoint 3x3; _joint_block)
      state = b.j_state[j]
      cdot1 = v[ch] + cross_sv(w[ch], rB) - v[pa] - cross_sv(w[pa], rA)
      cdot2 = w[ch] - w[pa]
      k11 = mA + mB + iA * rA[1] ** 2 + iB * rB[1] ** 2
      k12 = -iA * rA[0] * rA[1] - iB * rB[0] * rB[1]
      k13 = -iA * rA[1] - iB * rB[1]
      k22 = mA + mB + iA * rA[0] ** 2 + iB * rB[0] ** 2
      k23 = iA * rA[0] + iB * rB[0]
      k33 = iA + iB
      dx, dy, dz = _joint_block(state, cdot1[0], cdot1[1], cdot2, j_lim[j],
                                k11, k12, k13, k22, k23, k33)
      P = jnp.stack([dx, dy]) * j_valid[j]
      dz = dz * j_valid[j]
      j_imp = j_imp.at[j].add(P)
      j_lim = j_lim.at[j].add(dz)
      v = v.at[pa].add(-mA * P).at[ch].add(mB * P)
      w = w.at[pa].add(-iA * (cross_vv(rA, P) + dz))
      w = w.at[ch].add(iB * (cross_vv(rB, P) + dz))
      dm = jnp.maximum(dm, jnp.maximum(jnp.abs(d), jnp.maximum(
          jnp.abs(P).max(), jnp.abs(dz))))
      return (v, w, j_imp, j_mot, j_lim, dm), None

    (v, w, j_imp, j_mot, j_lim, dm), _ = jax.lax.scan(
        one_joint, (v, w, j_imp, j_mot, j_lim, dm),
        jnp.arange(len(spec.j_parent)), unroll=False)
    return v, w, j_imp, j_mot, j_lim, dm

  def wall_pass(v, w, wc, dm):
    # walls touch distinct (body) rows independently: parallel over bodies,
    # sequential over walls; per contact, Box2D order: friction for both
    # points, then the normal constraints as a 2x2 block (or sequentially
    # when the block is inactive) — b2ContactSolver::SolveVelocityConstraints
    def one_wall(carry, wi):
      v, w, wc, dm = carry
      n = wall_n[wi]
      t = jnp.stack([n[1], -n[0]])
      for k in range(2):  # friction, both points
        rB = b.w_rB[:, wi, k]                                      # (N,2)
        dv = v + cross_sv(w, rB)
        vt = (dv * t).sum(-1)
        lam = -b.w_tmass[:, wi, k] * vt
        maxf = b.w_mu * wc[:, wi, k, 0]
        new = jnp.clip(wc[:, wi, k, 1] + lam, -maxf, maxf)
        d = new - wc[:, wi, k, 1]
        wc = wc.at[:, wi, k, 1].set(new)
        P = d[:, None] * t
        v = v + b.inv_m[:, None] * P
        w = w + b.inv_i * cross_vv(rB, P)
        dm = jnp.maximum(dm, jnp.abs(d).max())
      # normal: sequential candidate deltas (applied virtually in order)
      rB1, rB2 = b.w_rB[:, wi, 0], b.w_rB[:, wi, 1]
      a1, a2 = wc[:, wi, 0, 0], wc[:, wi, 1, 0]
      vs, ws = v, w
      d_seq = []
      for k, (rB, acc) in enumerate(((rB1, a1), (rB2, a2))):
        dv = vs + cross_sv(ws, rB)
        vn = (dv * n).sum(-1)
        lam = -b.w_nmass[:, wi, k] * (vn - b.w_bias[:, wi, k])
        new = jnp.maximum(acc + lam, 0.0)
        dk = new - acc
        d_seq.append(dk)
        P = dk[:, None] * n
        vs = vs + b.inv_m[:, None] * P
        ws = ws + b.inv_i * cross_vv(rB, P)
      # block candidate (2x2 LCP, b2ContactSolver case enumeration)
      vn1 = ((v + cross_sv(w, rB1)) * n).sum(-1)
      vn2 = ((v + cross_sv(w, rB2)) * n).sum(-1)
      k11, k22 = b.w_k[:, wi, 0], b.w_k[:, wi, 1]
      k12 = b.w_k12[:, wi]
      d1b, d2b = _block_lcp(
          vn1 - b.w_bias[:, wi, 0], vn2 - b.w_bias[:, wi, 1], a1, a2,
          k11, k22, k12, b.w_nmass[:, wi, 0], b.w_nmass[:, wi, 1])
      blk = b.w_block[:, wi]
      d1 = jnp.where(blk, d1b, d_seq[0])
      d2 = jnp.where(blk, d2b, d_seq[1])
      v = v + b.inv_m[:, None] * ((d1 + d2)[:, None] * n)
      w = w + b.inv_i * (cross_vv(rB1, d1[:, None] * n)
                         + cross_vv(rB2, d2[:, None] * n))
      wc = wc.at[:, wi, 0, 0].set(a1 + d1).at[:, wi, 1, 0].set(a2 + d2)
      dm = jnp.maximum(dm, jnp.maximum(jnp.abs(d1).max(), jnp.abs(d2).max()))
      return (v, w, wc, dm), None

    (v, w, wc, dm), _ = jax.lax.scan(one_wall, (v, w, wc, dm),
                                     jnp.arange(nw), unroll=False)
    return v, w, wc, dm

  def pair_pass(v, w, pc, dm):
    def one_pair(carry, p):
      v, w, pc, dm = carry
      a, bb = pair_a[p], pair_b[p]
      n = b.p_n[p]
      t = jnp.stack([n[1], -n[0]])
      imA, imB, iA, iB = b.p_imA[p], b.p_imB[p], b.p_iiA[p], b.p_iiB[p]

      def one_fric(carry, k):
        v, w, pc, dm = carry
        rA, rB = b.p_rA[p, k], b.p_rB[p, k]
        dv = v[bb] + cross_sv(w[bb], rB) - v[a] - cross_sv(w[a], rA)
        vt = (dv * t).sum(-1)
        lam = -b.p_tmass[p, k] * vt
        maxf = b.p_mu[p] * pc[p, k, 0]
        new = jnp.clip(pc[p, k, 1] + lam, -maxf, maxf)
        d = new - pc[p, k, 1]
        pc = pc.at[p, k, 1].set(new)
        P = d * t
        v = v.at[a].add(-imA * P).at[bb].add(imB * P)
        w = w.at[a].add(-iA * cross_vv(rA, P)).at[bb].add(iB * cross_vv(rB, P))
        dm = jnp.maximum(dm, jnp.abs(d))
        return (v, w, pc, dm), None

      (v, w, pc, dm), _ = jax.lax.scan(one_fric, (v, w, pc, dm),
                                       jnp.arange(2), unroll=False)

      # normal: sequential candidate deltas from the post-friction state
      rA1, rB1 = b.p_rA[p, 0], b.p_rB[p, 0]
      rA2, rB2 = b.p_rA[p, 1], b.p_rB[p, 1]
      a1, a2 = pc[p, 0, 0], pc[p, 1, 0]
      vs, ws = v, w
      d_seq = []
      for k, (rA, rB, acc) in enumerate(((rA1, rB1, a1), (rA2, rB2, a2))):
        dv = vs[bb] + cross_sv(ws[bb], rB) - vs[a] - cross_sv(ws[a], rA)
        vn = (dv * n).sum(-1)
        lam = -b.p_nmass[p, k] * (vn - b.p_bias[p, k])
        new = jnp.maximum(acc + lam, 0.0)
        dk = new - acc
        d_seq.append(dk)
        P = dk * n
        vs = vs.at[a].add(-imA * P).at[bb].add(imB * P)
        ws = ws.at[a].add(-iA * cross_vv(rA, P)).at[bb].add(iB * cross_vv(rB, P))
      # block candidate from the same pre-normal state
      dv1 = v[bb] + cross_sv(w[bb], rB1) - v[a] - cross_sv(w[a], rA1)
      dv2 = v[bb] + cross_sv(w[bb], rB2) - v[a] - cross_sv(w[a], rA2)
      d1b, d2b = _block_lcp(
          (dv1 * n).sum(-1) - b.p_bias[p, 0],
          (dv2 * n).sum(-1) - b.p_bias[p, 1], a1, a2,
          b.p_k[p, 0], b.p_k[p, 1], b.p_k12[p],
          b.p_nmass[p, 0], b.p_nmass[p, 1])
      blk = b.p_block[p]
      d1 = jnp.where(blk, d1b, d_seq[0])
      d2 = jnp.where(blk, d2b, d_seq[1])
      P = (d1 + d2) * n
      v = v.at[a].add(-imA * P).at[bb].add(imB * P)
      dw = cross_vv(rA1, d1 * n) + cross_vv(rA2, d2 * n)
      dwB = cross_vv(rB1, d1 * n) + cross_vv(rB2, d2 * n)
      w = w.at[a].add(-iA * dw).at[bb].add(iB * dwB)
      pc = pc.at[p, 0, 0].set(a1 + d1).at[p, 1, 0].set(a2 + d2)
      dm = jnp.maximum(dm, jnp.maximum(jnp.abs(d1), jnp.abs(d2)))
      return (v, w, pc, dm), None

    (v, w, pc, dm), _ = jax.lax.scan(one_pair, (v, w, pc, dm),
                                     jnp.arange(len(spec.pair_a)),
                                     unroll=False)
    return v, w, pc, dm

  def vel_iter_core(carry):
    v, w, j_imp, j_mot, j_lim, wc, pc = carry
    dm = jnp.asarray(0.0, jnp.float32)
    v, w, j_imp, j_mot, j_lim, dm = joint_pass(
        (v, w, j_imp, j_mot, j_lim, dm))
    v, w, wc, dm = wall_pass(v, w, wc, dm)
    v, w, pc, dm = pair_pass(v, w, pc, dm)
    return (v, w, j_imp, j_mot, j_lim, wc, pc), dm

  init = (b.v, b.w, b.j_imp, b.j_mot, b.j_lim, b.wc, b.pc)
  return vel_iter_core, init


def velocity_solve(spec: WorldSpec, b: SolveBundle) -> SolveBundle:
  """Sequential-impulse velocity iterations for one world (jnp path)."""
  vel_iter_core, init = _vel_iteration(spec, b)
  tol = float(getattr(spec, 'solver_exit_tol', 0.0))
  if tol > 0.0:
    # convergence exit: stop once an iteration's largest impulse delta is
    # below tol (the remaining Box2D trips would move velocities by
    # < tol * inv_m each — orders below the engine's pybox2d-parity floor)
    def w_cond(c):
      return (c[0] < spec.vel_iters) & (c[1] > tol)

    def w_body(c):
      out, dm = vel_iter_core(c[2:])
      return (c[0] + 1, dm) + out

    fin = jax.lax.while_loop(
        w_cond, w_body,
        (jnp.asarray(0, jnp.int32), jnp.asarray(jnp.inf, jnp.float32))
        + init)
    v, w, j_imp, j_mot, j_lim, wc, pc = fin[2:]
  else:
    # exact fixed trip count (the dm max-chain is unused here and DCE'd)
    def vel_iter(_, carry):
      return vel_iter_core(carry)[0]

    v, w, j_imp, j_mot, j_lim, wc, pc = jax.lax.fori_loop(
        0, spec.vel_iters, vel_iter, init, unroll=1)
  return b._replace(v=v, w=w, j_imp=j_imp, j_mot=j_mot, j_lim=j_lim,
                    wc=wc, pc=pc)


def step_world(spec: WorldSpec, state: WorldState, action: jnp.ndarray
               ) -> WorldState:
  """Advance one env step = spec.substeps physics substeps.

  Action semantics follow the reference (boxLCD/world_env.py:434-444):
  speed control sets motor speed to gain * clip(action, -1, 1) with fixed max
  torque. Joints with equal limits are locked and take no action.
  """
  act = jnp.clip(action, -1.0, 1.0)
  has_act = spec.j_act >= 0
  a_j = act[jnp.maximum(spec.j_act, 0)] * has_act
  motor_speed = spec.j_speed * a_j

  # a changed motor speed wakes the joint's bodies (pybox2d SetMotorSpeed)
  motor_changed = (motor_speed != state.prev_motor) & jnp.asarray(spec.j_valid)

  def sub(st, _):
    return _substep(spec, st, motor_speed, motor_changed), None

  state, _ = jax.lax.scan(sub, state, None, length=spec.substeps,
                          unroll=False)
  return state._replace(ep_t=state.ep_t + 1, prev_motor=motor_speed)


def _substep(spec: WorldSpec, st: WorldState, motor_speed,
             motor_changed) -> WorldState:
  bundle, aux = _presolve(spec, st, motor_speed)
  bundle = velocity_solve(spec, bundle)
  return _postsolve(spec, st, bundle, aux, motor_changed)


def step_world_batch(spec: WorldSpec, states: WorldState, actions,
                     velocity_solver=None, substep_solver=None) -> WorldState:
  """Batched env step over a leading worlds axis.

  Equivalent to `jax.vmap(step_world)`, but the solver stages run on the
  WHOLE batch so fused batched kernels (engine/pallas_solver.py) can be
  swapped in: `substep_solver(states, bundle, aux)` replaces velocity
  iterations + position integration + NGS position iterations (the hot 99%
  of the step) and returns `(bundle', c, a)`; `velocity_solver(bundle)`
  replaces only the velocity iterations.
  """
  act = jnp.clip(actions, -1.0, 1.0)
  has_act = spec.j_act >= 0
  a_j = act[:, np.maximum(spec.j_act, 0)] * has_act[None]
  motor_speed = spec.j_speed[None] * a_j                          # (B, J)
  motor_changed = (motor_speed != states.prev_motor) \
      & jnp.asarray(spec.j_valid)[None]

  def sub(states, _):
    bundle, aux = jax.vmap(
        lambda s, ms: _presolve(spec, s, ms))(states, motor_speed)
    if substep_solver is not None:
      bundle, c, a = substep_solver(states, bundle, aux)
    else:
      if velocity_solver is None:
        bundle = jax.vmap(lambda bb: velocity_solve(spec, bb))(bundle)
      else:
        bundle = velocity_solver(bundle)
      c, a = jax.vmap(lambda s, bb, ax: _position_solve(spec, s, bb, ax))(
          states, bundle, aux)
    new_states = jax.vmap(
        lambda s, bb, ax, mc, cc, aa: _finalize(spec, s, bb, ax, mc, cc, aa))(
            states, bundle, aux, motor_changed, c, a)
    return new_states, None

  states, _ = jax.lax.scan(sub, states, None, length=spec.substeps,
                           unroll=False)
  return states._replace(ep_t=states.ep_t + 1, prev_motor=motor_speed)


def _presolve(spec: WorldSpec, st: WorldState, motor_speed):
  """Steps 1-5: integrate velocities, narrowphase, warm start; build the
  solver bundle."""
  dt = spec.dt
  inv_dt = 1.0 / dt
  inv_m, inv_i = body_inv_mass(spec, st.is_circle)
  lc = local_center(spec, st.is_circle)

  # ---- 1. integrate velocities + damping ---------------------------------
  v = (st.v + dt * spec.gravity[None, :]) / (1.0 + dt * spec.lin_damp)[:, None]
  w = st.w / (1.0 + dt * spec.ang_damp)

  # ---- 2. narrowphase ------------------------------------------------------
  geom = make_geom(spec, st.is_circle, st.c, st.a)
  n_bodies = spec.n
  nw = len(spec.wall_offset)
  wall_n = jnp.asarray(spec.wall_normal)      # (W, 2)
  wall_off = jnp.asarray(spec.wall_offset)

  wallm = jax.vmap(lambda b: jax.vmap(
      lambda wi: collision.collide_wall(geom, b, wall_n[wi], wall_off[wi])
  )(jnp.arange(nw)))(jnp.arange(n_bodies))    # fields: (N, W, ...)

  pair_a = jnp.asarray(spec.pair_a)
  pair_b = jnp.asarray(spec.pair_b)
  pairm = jax.vmap(lambda a, b: collision.collide_pair(geom, a, b))(
      pair_a, pair_b)                          # fields: (P, ...)
  pair_touch = pairm.touch & jnp.asarray(spec.pair_valid)[:, None]
  pairm = pairm._replace(touch=pair_touch)

  # ---- 3. warm-start matching ---------------------------------------------
  wc_imp = _match_impulses(wallm.ids, wallm.touch, st.wc_id, st.wc_imp)
  pc_imp = _match_impulses(pairm.ids, pairm.touch, st.pc_id, st.pc_imp)

  # ---- 4. constraint init ---------------------------------------------------
  # wall contacts: static wall is "body A" with zero mass
  w_n = wall_n[None, :, None, :]                                  # (1,W,1,2)
  w_t = perp(w_n)
  w_rB = wallm.points - st.c[:, None, None, :]                    # (N,W,2,2)
  w_imB = inv_m[:, None, None]
  w_iiB = inv_i[:, None, None]
  w_rn = cross_vv(w_rB, w_n)                                      # (N,W,2)
  w_kn = w_imB + w_iiB * w_rn ** 2
  w_kt = w_imB + w_iiB * cross_vv(w_rB, w_t) ** 2
  # 2-point block solve (b2ContactSolver::InitializeVelocityConstraints):
  # use the 2x2 K when both points touch and K is well-conditioned, else
  # Box2D degrades the velocity constraint to pointCount=1 (drops point 2)
  w_k12 = w_imB[..., 0] + w_iiB[..., 0] * w_rn[..., 0] * w_rn[..., 1]
  w_det = w_kn[..., 0] * w_kn[..., 1] - w_k12 * w_k12
  w_cond = w_kn[..., 0] * w_kn[..., 0] < 1000.0 * w_det
  w_both = wallm.touch[..., 0] & wallm.touch[..., 1]
  w_block = w_both & w_cond
  w_degrade = w_both & ~w_cond
  w_vtouch = wallm.touch.at[..., 1].set(wallm.touch[..., 1] & ~w_degrade)
  wc_imp = jnp.where(w_vtouch[..., None], wc_imp, 0.0)
  w_nmass = jnp.where(w_vtouch, 1.0 / jnp.maximum(w_kn, 1e-12), 0.0)
  w_tmass = jnp.where(w_vtouch, 1.0 / jnp.maximum(w_kt, 1e-12), 0.0)
  # contact friction is the geometric mix with the wall's (Box2D default 0.2)
  w_mu = jnp.sqrt(0.2 * spec.friction)[:, None, None]
  w_e = spec.restitution[:, None, None]
  w_dv0 = v[:, None, None, :] + cross_sv(w[:, None, None], w_rB)
  w_vn0 = (w_dv0 * w_n).sum(-1)
  w_bias = jnp.where(w_vn0 < -VELOCITY_THRESHOLD, -w_e * w_vn0, 0.0)

  # pair contacts (index spec's numpy tables with numpy indices: static gathers)
  p_a, p_b = spec.pair_a, spec.pair_b
  p_n = pairm.normal[:, None, :]                                   # (P,1,2)
  p_t = perp(p_n)
  p_rA = pairm.points - st.c[p_a][:, None, :]                      # (P,2,2)
  p_rB = pairm.points - st.c[p_b][:, None, :]
  p_imA, p_imB = inv_m[p_a][:, None], inv_m[p_b][:, None]
  p_iiA, p_iiB = inv_i[p_a][:, None], inv_i[p_b][:, None]
  p_rnA = cross_vv(p_rA, p_n)                                      # (P,2)
  p_rnB = cross_vv(p_rB, p_n)
  p_kn = p_imA + p_imB + p_iiA * p_rnA ** 2 + p_iiB * p_rnB ** 2
  p_kt = p_imA + p_imB + p_iiA * cross_vv(p_rA, p_t) ** 2 \
      + p_iiB * cross_vv(p_rB, p_t) ** 2
  p_k12 = (p_imA[:, 0] + p_imB[:, 0]
           + p_iiA[:, 0] * p_rnA[:, 0] * p_rnA[:, 1]
           + p_iiB[:, 0] * p_rnB[:, 0] * p_rnB[:, 1])
  p_det = p_kn[:, 0] * p_kn[:, 1] - p_k12 * p_k12
  p_cond = p_kn[:, 0] * p_kn[:, 0] < 1000.0 * p_det
  p_both = pair_touch[:, 0] & pair_touch[:, 1]
  p_block = p_both & p_cond
  p_degrade = p_both & ~p_cond
  p_vtouch = pair_touch.at[:, 1].set(pair_touch[:, 1] & ~p_degrade)
  pc_imp = jnp.where(p_vtouch[..., None], pc_imp, 0.0)
  p_nmass = jnp.where(p_vtouch, 1.0 / jnp.maximum(p_kn, 1e-12), 0.0)
  p_tmass = jnp.where(p_vtouch, 1.0 / jnp.maximum(p_kt, 1e-12), 0.0)
  p_mu = jnp.asarray(
      np.sqrt(spec.friction[p_a] * spec.friction[p_b]))[:, None]
  p_e = jnp.asarray(
      np.maximum(spec.restitution[p_a], spec.restitution[p_b]))[:, None]
  p_dv0 = (v[p_b][:, None] + cross_sv(w[p_b][:, None], p_rB)
           - v[p_a][:, None] - cross_sv(w[p_a][:, None], p_rA))
  p_vn0 = (p_dv0 * p_n).sum(-1)
  p_bias = jnp.where(p_vn0 < -VELOCITY_THRESHOLD, -p_e * p_vn0, 0.0)

  # joints (jnp copies of per-joint tables so scan bodies can index by tracer)
  j_pa, j_ch = jnp.asarray(spec.j_parent), jnp.asarray(spec.j_child)
  j_lower = jnp.asarray(spec.j_lower)
  j_upper = jnp.asarray(spec.j_upper)
  j_limited = jnp.asarray(spec.j_limited)
  j_anchor_a = jnp.asarray(spec.j_anchor_a)
  j_anchor_b = jnp.asarray(spec.j_anchor_b)
  lc_j = jnp.asarray(lc)
  rotA, rotB = geom.rot[j_pa], geom.rot[j_ch]
  j_rA = jnp.einsum('jik,jk->ji', rotA, spec.j_anchor_a - lc[j_pa])
  j_rB = jnp.einsum('jik,jk->ji', rotB, spec.j_anchor_b - lc[j_ch])
  j_mA, j_mB = inv_m[j_pa], inv_m[j_ch]
  j_iA, j_iB = inv_i[j_pa], inv_i[j_ch]
  j_axmass_raw = j_iA + j_iB
  j_axmass = jnp.where(j_axmass_raw > 0, 1.0 / jnp.maximum(j_axmass_raw, 1e-12), 0.0)
  j_axmass = j_axmass * jnp.asarray(spec.j_valid)
  j_angle = st.a[j_ch] - st.a[j_pa] - st.j_ref
  j_equal = jnp.asarray(spec.j_limited) & (spec.j_lower == spec.j_upper)
  j_valid = jnp.asarray(spec.j_valid)
  # limit state at init (2.3 semantics); accumulated impulse resets on change
  j_state = jnp.where(
      ~(j_limited & j_valid), 0,
      jnp.where(j_equal, 3,
                jnp.where(j_angle <= j_lower, 1,
                          jnp.where(j_angle >= j_upper, 2, 0))))
  # NOTE: Box2D 2.3's velocity limit-state check uses NO angular slop
  # (b2RevoluteJoint::InitVelocityConstraints); slop applies only in the
  # position correction below.
  j_state = j_state.astype(jnp.int32)
  j_lim_i = jnp.where(j_state == st.j_state, st.j_lim, 0.0) * j_valid

  # ---- 5. warm start (linear accumulation -> scatter-add) -------------------
  # wall impulses act only on the body
  w_P = wc_imp[..., 0:1] * w_n + wc_imp[..., 1:2] * w_t            # (N,W,2,2)
  v = v + inv_m[:, None] * w_P.sum(axis=(1, 2))
  w = w + inv_i * cross_vv(w_rB, w_P).sum(axis=(1, 2))
  # pair impulses
  p_P = pc_imp[..., 0:1] * p_n + pc_imp[..., 1:2] * p_t            # (P,2,2)
  pPsum = p_P.sum(axis=1)                                          # (P,2)
  v = v.at[p_a].add(-inv_m[p_a, None] * pPsum)
  v = v.at[p_b].add(inv_m[p_b, None] * pPsum)
  w = w.at[p_a].add(-inv_i[p_a] * cross_vv(p_rA, p_P).sum(axis=1))
  w = w.at[p_b].add(inv_i[p_b] * cross_vv(p_rB, p_P).sum(axis=1))
  # joints
  j_ax = (st.j_mot * j_valid + j_lim_i)
  jP = st.j_imp * j_valid[:, None]
  v = v.at[j_pa].add(-j_mA[:, None] * jP)
  w = w.at[j_pa].add(-j_iA * (cross_vv(j_rA, jP) + j_ax))
  v = v.at[j_ch].add(j_mB[:, None] * jP)
  w = w.at[j_ch].add(j_iB * (cross_vv(j_rB, jP) + j_ax))

  j_mot_i = st.j_mot * j_valid
  j_imp_i = jP

  bundle = SolveBundle(
      v=v, w=w, j_imp=j_imp_i, j_mot=j_mot_i, j_lim=j_lim_i,
      wc=wc_imp, pc=pc_imp, inv_m=inv_m, inv_i=inv_i,
      j_rA=j_rA, j_rB=j_rB, j_axmass=j_axmass, j_state=j_state,
      j_mA=j_mA, j_mB=j_mB, j_iA=j_iA, j_iB=j_iB, motor_speed=motor_speed,
      w_rB=w_rB, w_nmass=w_nmass, w_tmass=w_tmass, w_bias=w_bias,
      w_mu=w_mu[:, 0, 0], w_k=w_kn, w_k12=w_k12, w_block=w_block,
      p_n=pairm.normal, p_rA=p_rA, p_rB=p_rB, p_nmass=p_nmass,
      p_tmass=p_tmass, p_bias=p_bias, p_mu=p_mu[:, 0],
      p_imA=p_imA[:, 0], p_imB=p_imB[:, 0], p_iiA=p_iiA[:, 0],
      p_iiB=p_iiB[:, 0], p_k=p_kn, p_k12=p_k12, p_block=p_block)
  return bundle, PostAux(wallm=wallm, pairm=pairm, j_state=j_state, lc=lc)


def _position_solve(spec: WorldSpec, st: WorldState, b: SolveBundle,
                    aux: PostAux, record_done=False):
  """Steps 7-8: integrate positions + NGS corrections (jnp path). Returns
  (c, a); the batched caller can swap in the fused Pallas substep kernel
  (engine/pallas_solver.py) for this stage. With record_done=True returns
  (c, a, dones) where dones[i] is the Box2D exit flag after iteration i
  (research/scripts/exit_probe.py diagnostics)."""
  dt = spec.dt
  wallm, pairm, j_state, lc = aux.wallm, aux.pairm, aux.j_state, aux.lc
  inv_m, inv_i = b.inv_m, b.inv_i
  v, w = b.v, b.w
  nw = len(spec.wall_offset)
  wall_n = jnp.asarray(spec.wall_normal)
  wall_off = jnp.asarray(spec.wall_offset)
  j_pa, j_ch = jnp.asarray(spec.j_parent), jnp.asarray(spec.j_child)
  pair_a, pair_b = jnp.asarray(spec.pair_a), jnp.asarray(spec.pair_b)
  j_lower = jnp.asarray(spec.j_lower)
  j_upper = jnp.asarray(spec.j_upper)
  j_anchor_a = jnp.asarray(spec.j_anchor_a)
  j_anchor_b = jnp.asarray(spec.j_anchor_b)
  j_valid = jnp.asarray(spec.j_valid)
  j_axmass = b.j_axmass
  j_iA, j_iB, j_mA, j_mB = b.j_iA, b.j_iB, b.j_mA, b.j_mB
  lc_j = jnp.asarray(lc)

  # ---- 7. integrate positions --------------------------------------------------
  c = st.c + dt * v
  a = st.a + dt * w

  # ---- 8. position iterations (NGS) ---------------------------------------------
  # b2Island::Solve EXITS the position loop once the iteration's contact
  # minSeparation >= -3*linearSlop AND every joint reports
  # positionError <= linearSlop && angularError <= angularSlop — the loop
  # rarely runs all pos_iters. Replicated here with a `done` mask (the
  # tolerance flags are computed during the sweep exactly as Box2D does,
  # and the qualifying iteration's corrections are still applied).
  def pos_iter(_, cad):
    c, a, done = cad
    c0, a0 = c, a
    # Box2D island order per position iteration: contacts first, then joints
    # (b2Island::Solve — contactSolver.SolvePositionConstraints before the
    # joint loop); within contacts: walls then pairs (spec order)

    # joints: limit correction then point correction (Box2D order)
    def one_joint(ca, j):
      c, a, jerr = ca
      pa, ch = j_pa[j], j_ch[j]
      iA, iB, mA, mB = j_iA[j], j_iB[j], j_mA[j], j_mB[j]
      state = j_state[j]
      ang = a[ch] - a[pa] - st.j_ref[j]
      lo, hi = j_lower[j], j_upper[j]
      c_eq = jnp.clip(ang - lo, -MAX_ANGULAR_CORRECTION, MAX_ANGULAR_CORRECTION)
      c_lo = jnp.clip(ang - lo + ANGULAR_SLOP, -MAX_ANGULAR_CORRECTION, 0.0)
      c_hi = jnp.clip(ang - hi - ANGULAR_SLOP, 0.0, MAX_ANGULAR_CORRECTION)
      C = jnp.where(state == 3, c_eq,
                    jnp.where(state == 1, c_lo,
                              jnp.where(state == 2, c_hi, 0.0)))
      # b2RevoluteJoint angularError: |C| at equal limits, violation depth at
      # a one-sided limit, 0 when inactive
      ang_err = jnp.where(state == 3, jnp.abs(c_eq),
                          jnp.where(state == 1, lo - ang,
                                    jnp.where(state == 2, ang - hi, 0.0)))
      d = -j_axmass[j] * C
      a = a.at[pa].add(-iA * d).at[ch].add(iB * d)
      # point
      rotA, rotB = rot_mat(a[pa]), rot_mat(a[ch])
      rA = rotA @ (j_anchor_a[j] - lc_j[pa])
      rB = rotB @ (j_anchor_b[j] - lc_j[ch])
      Cv = c[ch] + rB - c[pa] - rA
      pos_err = jnp.linalg.norm(Cv)
      k11 = mA + mB + iA * rA[1] ** 2 + iB * rB[1] ** 2
      k12 = -iA * rA[0] * rA[1] - iB * rB[0] * rB[1]
      k22 = mA + mB + iA * rA[0] ** 2 + iB * rB[0] ** 2
      det = k11 * k22 - k12 * k12
      det = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
      P = -jnp.stack([k22 * Cv[0] - k12 * Cv[1],
                      k11 * Cv[1] - k12 * Cv[0]]) / det
      P = P * j_valid[j]
      c = c.at[pa].add(-mA * P).at[ch].add(mB * P)
      a = a.at[pa].add(-iA * cross_vv(rA, P)).at[ch].add(iB * cross_vv(rB, P))
      bad = j_valid[j] & ((pos_err > LINEAR_SLOP) | (ang_err > ANGULAR_SLOP))
      return (c, a, jerr | bad), None

    # wall contacts (parallel over bodies, sequential over W*2 slots)
    def one_wall_slot(ca, idx):
      c, a, minsep = ca
      wi, k = idx // 2, idx % 2
      n = wall_n[wi]
      rot = rot_mat(a)
      pt = c + jnp.einsum('nij,nj->ni', rot, wallm.lps[:, wi, k])
      sep = (pt * n).sum(-1) - wall_off[wi] - wallm.rad_sub[:, wi]
      minsep = jnp.minimum(
          minsep, jnp.where(wallm.touch[:, wi, k], sep, 0.0).min())
      C = jnp.clip(BAUMGARTE * (sep + LINEAR_SLOP), -MAX_LINEAR_CORRECTION, 0.0)
      rB = pt - c
      kn = inv_m + inv_i * cross_vv(rB, n[None]) ** 2
      imp = jnp.where(wallm.touch[:, wi, k], -C / jnp.maximum(kn, 1e-12), 0.0)
      P = imp[:, None] * n[None]
      c = c + inv_m[:, None] * P
      a = a + inv_i * cross_vv(rB, P)
      return (c, a, minsep), None

    (c, a, minsep), _ = jax.lax.scan(one_wall_slot,
                                     (c, a, jnp.asarray(0.0, c.dtype)),
                                     jnp.arange(nw * 2), unroll=False)

    # pair contacts
    def one_pair_slot(ca, idx):
      c, a, minsep = ca
      p, k = idx // 2, idx % 2
      ia, ib = pair_a[p], pair_b[p]
      rotA, rotB = rot_mat(a[ia]), rot_mat(a[ib])
      mt = pairm.mtype[p]
      # circles
      pA0 = c[ia]
      pB0 = c[ib] + rotB @ pairm.lps[p, 0]
      d0 = pB0 - pA0
      dist0 = jnp.linalg.norm(d0)
      n0 = jnp.where(dist0 > 1e-9, d0 / jnp.maximum(dist0, 1e-9),
                     jnp.array([0.0, 1.0]))
      sep0 = dist0 - pairm.rad_sub[p]
      pt0 = 0.5 * (pA0 + pB0)
      # faceA
      nf1 = rotA @ pairm.ln[p]
      plane1 = c[ia] + rotA @ pairm.lpp[p]
      clip1 = c[ib] + rotB @ pairm.lps[p, k]
      sep1 = ((clip1 - plane1) * nf1).sum() - pairm.rad_sub[p]
      # faceB
      nf2 = rotB @ pairm.ln[p]
      plane2 = c[ib] + rotB @ pairm.lpp[p]
      clip2 = c[ia] + rotA @ pairm.lps[p, k]
      sep2 = ((clip2 - plane2) * nf2).sum() - pairm.rad_sub[p]

      n = jnp.where(mt == 0, n0, jnp.where(mt == 1, nf1, -nf2))
      pt = jnp.where(mt == 0, pt0, jnp.where(mt == 1, clip1, clip2))
      sep = jnp.where(mt == 0, sep0, jnp.where(mt == 1, sep1, sep2))

      minsep = jnp.minimum(minsep, jnp.where(pairm.touch[p, k], sep, 0.0))
      C = jnp.clip(BAUMGARTE * (sep + LINEAR_SLOP), -MAX_LINEAR_CORRECTION, 0.0)
      rA = pt - c[ia]
      rB = pt - c[ib]
      kn = (inv_m[ia] + inv_m[ib] + inv_i[ia] * cross_vv(rA, n) ** 2
            + inv_i[ib] * cross_vv(rB, n) ** 2)
      imp = jnp.where(pairm.touch[p, k], -C / jnp.maximum(kn, 1e-12), 0.0)
      P = imp * n
      c = c.at[ia].add(-inv_m[ia] * P).at[ib].add(inv_m[ib] * P)
      a = a.at[ia].add(-inv_i[ia] * cross_vv(rA, P))
      a = a.at[ib].add(inv_i[ib] * cross_vv(rB, P))
      return (c, a, minsep), None

    (c, a, minsep), _ = jax.lax.scan(one_pair_slot, (c, a, minsep),
                                     jnp.arange(len(spec.pair_a) * 2),
                                     unroll=False)
    (c, a, jbad), _ = jax.lax.scan(one_joint, (c, a, jnp.asarray(False)),
                                   jnp.arange(len(spec.j_parent)),
                                   unroll=False)
    okay = (minsep >= -3.0 * LINEAR_SLOP) & ~jbad
    c = jnp.where(done, c0, c)
    a = jnp.where(done, a0, a)
    return c, a, done | okay

  if record_done:
    def p_scan(cad, _):
      c, a, done = pos_iter(None, cad)
      return (c, a, done), done

    (c, a, _), dones = jax.lax.scan(
        p_scan, (c, a, jnp.asarray(False)), None, length=spec.pos_iters)
    return c, a, dones
  if float(getattr(spec, 'solver_exit_tol', 0.0)) > 0.0:
    # actually BREAK at Box2D's own done condition instead of masking the
    # remaining trips — bit-identical results (post-done iterations above
    # are reverted no-ops), fewer loop trips
    def p_cond(cadi):
      return (cadi[3] < spec.pos_iters) & ~cadi[2]

    def p_body(cadi):
      c, a, done = pos_iter(None, cadi[:3])
      return (c, a, done, cadi[3] + 1)

    c, a, _, _ = jax.lax.while_loop(
        p_cond, p_body, (c, a, jnp.asarray(False),
                         jnp.asarray(0, jnp.int32)))
  else:
    c, a, _ = jax.lax.fori_loop(0, spec.pos_iters, pos_iter,
                                (c, a, jnp.asarray(False)))
  return c, a


def _finalize(spec: WorldSpec, st: WorldState, b: SolveBundle, aux: PostAux,
              motor_changed, c, a) -> WorldState:
  """Steps 9-10: sleeping + state writeback."""
  dt = spec.dt
  wallm, pairm, j_state = aux.wallm, aux.pairm, aux.j_state
  v, w = b.v, b.w
  j_imp, j_mot, j_lim = b.j_imp, b.j_mot, b.j_lim
  wc_imp, pc_imp = b.wc, b.pc
  j_pa, j_ch = jnp.asarray(spec.j_parent), jnp.asarray(spec.j_child)
  pair_a, pair_b = jnp.asarray(spec.pair_a), jnp.asarray(spec.pair_b)

  # ---- 9. sleeping (island-based, Box2D semantics) --------------------------
  sleep_time = st.sleep_time
  if spec.allow_sleep:
    n = spec.n
    # adjacency: joints + touching pair contacts (walls are static)
    adj = jnp.zeros((n, n), bool)
    jm = jnp.asarray(spec.j_valid)
    adj = adj.at[j_pa, j_ch].max(jm).at[j_ch, j_pa].max(jm)
    pair_touching = pairm.touch.any(-1)
    adj = adj.at[pair_a, pair_b].max(pair_touching)
    adj = adj.at[pair_b, pair_a].max(pair_touching)
    # islands via min-label propagation
    label = jnp.arange(n)

    def prop(_, lab):
      neigh = jnp.where(adj, lab[None, :], n)
      return jnp.minimum(lab, neigh.min(1))

    label = jax.lax.fori_loop(0, max(1, int(np.ceil(np.log2(max(n, 2)))) + 1),
                              prop, label)
    # per-body slow test + forced wake from motor-speed changes
    slow = ((v * v).sum(-1) <= LIN_SLEEP_TOL_SQ) & (w * w <= ANG_SLEEP_TOL_SQ)
    forced = jnp.zeros(n, bool).at[j_pa].max(motor_changed) \
        .at[j_ch].max(motor_changed)
    sleep_time = jnp.where(slow & ~forced, st.sleep_time + dt, 0.0)
    same = label[:, None] == label[None, :]
    isl_min = jnp.where(same, sleep_time[None, :], jnp.inf).min(1)
    asleep = isl_min >= TIME_TO_SLEEP
    v = jnp.where(asleep[:, None], 0.0, v)
    w = jnp.where(asleep, 0.0, w)
    c = jnp.where(asleep[:, None], st.c, c)
    a = jnp.where(asleep, st.a, a)

  # ---- 10. write back ------------------------------------------------------------
  return st._replace(
      c=c, a=a, v=v, w=w, sleep_time=sleep_time,
      wc_imp=jnp.where(wallm.touch[..., None], wc_imp, 0.0),
      wc_id=jnp.where(wallm.touch, wallm.ids, -1),
      pc_imp=jnp.where(pairm.touch[..., None], pc_imp, 0.0),
      pc_id=jnp.where(pairm.touch, pairm.ids, -1),
      j_imp=j_imp, j_mot=j_mot, j_lim=j_lim, j_state=j_state)


def _postsolve(spec: WorldSpec, st: WorldState, b: SolveBundle, aux: PostAux,
               motor_changed) -> WorldState:
  """Steps 7-10: integrate positions, NGS corrections, sleeping, writeback."""
  c, a = _position_solve(spec, st, b, aux)
  return _finalize(spec, st, b, aux, motor_changed, c, a)

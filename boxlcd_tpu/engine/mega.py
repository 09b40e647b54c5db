"""Rollout megakernel: T env steps inside ONE Pallas program.

Why: on this stack every XLA kernel launch and every executable dispatch
carries a large fixed overhead (per-step scan cost ~19 ms at 4096 worlds
regardless of iteration counts — PROGRESS.md round 3 audit), so the
sequential-impulse step, which lowers to thousands of tiny kernels, is
overhead-bound by ~1000x. This module fuses the ENTIRE rollout — per step:
velocity integration, wall narrowphase, warm-start matching, constraint
init, `vel_iters` Gauss-Seidel velocity iterations (joints + 2-point block
LCP wall contacts), position integration, `pos_iters` NGS position
iterations, and island sleeping, times `substeps` — into one Pallas TPU
kernel that loops over T steps in VMEM and streams per-step poses out.
Launch cost is paid once per rollout instead of ~10^4 times.

Scope (v2): everything the jnp path simulates — body-body contact pairs
(circle-circle, poly-circle, poly-poly SAT + incident-edge clipping, all
mirrored from engine/collision.py in tile form) and per-episode random
shapes (is_circle enters as per-world tiles; both shape variants are
computed and selected, exactly like collision.py's dispatch). This covers
the full env zoo incl. the manipulation tier (UrchinBall/LuxoCube/...,
reference: boxLCD/envs.py:66-137), which the reference steps through the
same Box2D solver as the robots (world_env.py:446-452). `supports(spec)`
reports eligibility; callers fall back to physics.step_world_batch.

Layout: worlds on the vector axes — every per-world scalar is one
(8, 128) f32 VMEM tile, one grid program owns 1024 worlds (same scheme as
engine/pallas_solver.py). All topology (bodies, walls, joints, vertex
counts) unrolls statically; Box2D constants and per-body masses bake in as
Python floats. Semantics mirror physics.py stage by stage (which is
golden-tested against real pybox2d); equality is asserted in
tests/test_mega.py via interpret mode.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from boxlcd_tpu.engine.collision import POLY_RADIUS
from boxlcd_tpu.engine.physics import (
    ANGULAR_SLOP, BAUMGARTE, LINEAR_SLOP, MAX_ANGULAR_CORRECTION,
    MAX_LINEAR_CORRECTION, TIME_TO_SLEEP, LIN_SLEEP_TOL_SQ, ANG_SLEEP_TOL_SQ,
    VELOCITY_THRESHOLD, WorldState, _block_lcp, _block_lcp_pre,
    _joint_block, _joint_block_pre, joint_block_prefactor)
from boxlcd_tpu.engine.spec import CIRCLE, POLY, RANDOM, WorldSpec

import os

# worlds per (sublane, lane) tile: SUB rows of 128 lanes. The VPU is natively
# (8, 128); taller tiles amortize per-op issue overhead at the cost of VMEM
# (BOXLCD_MEGA_SUB=16/32 for experiments — BLOCK consumers pad to it).
SUB = int(os.environ.get('BOXLCD_MEGA_SUB', 8))
LANE = 128
BLOCK = SUB * LANE
BIG = 1e9


def supports(spec: WorldSpec) -> bool:
  """v2 gate: contact pairs and random shapes are fused in-kernel. The only
  structural assumptions left are reference invariants: joints never attach
  to RANDOM-shape bodies (only objects are random, objects are never
  jointed — boxLCD/world_env.py:273-285), and a RANDOM body's two mass
  variants share a local center (circle and box both centered)."""
  for j in range(spec.jn):
    for b in (int(spec.j_parent[j]), int(spec.j_child[j])):
      if int(spec.shape_static[b]) == RANDOM:
        return False
  for i in range(spec.n):
    if int(spec.shape_static[i]) == RANDOM and not np.allclose(
        spec.local_center[i, 0], spec.local_center[i, 1]):
      return False
  return True


# ---- build-time constant folding for wall math ----------------------------
# Wall normals/tangents are Python-float constants, and for the env zoo they
# are axis-aligned (components 0/±1) — but XLA/Mosaic cannot fold x*0.0 or
# x+0.0*y (NaN/-0.0 semantics), so the generic expressions emitted roughly 2x
# the contact-solve ops and stretched the Gauss-Seidel dependency chains. The
# helpers below drop zero terms and strength-reduce ±1 multiplies at TRACE
# time. Numerically this only changes the sign of exact zeros (x + 0.0*y ==
# x except -0.0+0.0; x*1.0 == x; 0.0-x == -x except x=+0.0), which is far
# below the engine's pybox2d-parity tolerance and cannot flip any magnitude.

def _cmul(c, x):
  """c * x for Python-float c; None encodes an exactly-dropped zero term."""
  if c == 0.0:
    return None
  if c == 1.0:
    return x
  if c == -1.0:
    return -x
  return c * x


def _cadd2(a, b):
  """a + b where either side may be a dropped (None) term."""
  if a is None:
    return b
  if b is None:
    return a
  return a + b


def _csub2(a, b):
  """a - b where either side may be a dropped (None) term."""
  if a is None:
    return None if b is None else -b
  if b is None:
    return a
  return a - b


def _csubc(x, c):
  """x - c for Python-float c, dropping the op when c is exactly 0."""
  return x if c == 0.0 else x - c


def _bsel(p, a, b):
  """where(p, a, b) for BOOL tiles a/b, as pure mask logic.

  Mosaic supports vector<i1> as select *predicates* but not as select
  *data* operands — those get materialized through i8 and the lowering
  dies with "Unsupported target bitwidth for truncation" (vector i8->i1),
  which only surfaces on a real-chip compile (interpret mode passes).
  """
  return (p & a) | (~p & b)


def _to_tiles(x, B):
  """(B, *S) -> (*S, B/128, 128)."""
  s = x.shape[1:]
  return jnp.moveaxis(x, 0, -1).reshape(*s, B // LANE, LANE)


def _from_tiles(x, B):
  s = x.shape[:-2]
  return jnp.moveaxis(x.reshape(*s, B), -1, 0)


def _build_kernel(spec: WorldSpec, T: int):
  """Returns (kernel_fn, in_fields, out_traj_slots). State tuples are flat
  Python lists of (8,128) tiles; all topology is static."""
  n = spec.n
  nw = len(spec.wall_offset)
  jn_pad = len(spec.j_parent)
  jn = spec.jn
  dt = float(spec.dt)
  substeps = int(spec.substeps)
  vel_iters = int(spec.vel_iters)
  pos_iters = int(spec.pos_iters)
  # Prefactor the effective-mass inverses only when many velocity sweeps
  # amortize it: at 180/60 the hoist removes per-sweep determinants+divides
  # (+5% measured); at 8/4 the extra presolve tiles raise VMEM/register
  # pressure and cost far more than 8 sweeps save (-40% measured), so the
  # low-iteration path keeps the original in-sweep solves.
  use_prefactor = vel_iters >= 32
  exit_tol = float(getattr(spec, 'solver_exit_tol', 0.0))
  gx, gy = float(spec.gravity[0]), float(spec.gravity[1])
  allow_sleep = bool(spec.allow_sleep)
  # batch-granular inert-constraint skip (BOXLCD_MEGA_SKIP=0 opts out): wall/
  # pair blocks whose every world in the tile is untouched are guarded by a
  # scalar lax.cond per solver sweep — see the activity-flag comment below.
  # BOXLCD_MEGA_SKIP=force keeps the exact same cond-guarded graph but makes
  # every activity flag true (threshold -1 instead of 0): the branch
  # structure — and hence XLA's fusion/FMA-contraction choices — is
  # identical to the default, so "inert blocks are no-ops" is testable
  # bit-exactly (vs the UNGUARDED kernel, compilation differs at ~1 ulp on
  # active blocks because cond is a fusion boundary; see test_mega).
  _skip_mode = os.environ.get('BOXLCD_MEGA_SKIP', '1')
  skip_inert = _skip_mode != '0'
  skip_thr = -1.0 if _skip_mode == 'force' else 0.0

  kind = [int(spec.shape_static[i]) for i in range(n)]
  is_circ = [k == CIRCLE for k in kind]
  is_rand = [k == RANDOM for k in kind]
  shape_col = [0 if ic else 1 for ic in is_circ]
  # fixed-shape bodies bake inverse mass/inertia as Python floats; RANDOM
  # bodies select per world from these two variants (tiles built in-kernel)
  inv_m = [float(spec.inv_m[i, shape_col[i]]) for i in range(n)]
  inv_i = [float(spec.inv_i[i, shape_col[i]]) for i in range(n)]
  inv_m2 = [(float(spec.inv_m[i, 0]), float(spec.inv_m[i, 1]))
            for i in range(n)]
  inv_i2 = [(float(spec.inv_i[i, 0]), float(spec.inv_i[i, 1]))
            for i in range(n)]
  lc = [tuple(map(float, spec.local_center[i, shape_col[i]]))
        for i in range(n)]
  radius = [float(spec.radius[i]) for i in range(n)]
  lin_damp = [float(spec.lin_damp[i]) for i in range(n)]
  ang_damp = [float(spec.ang_damp[i]) for i in range(n)]
  mu = [float(np.sqrt(0.2 * spec.friction[i])) for i in range(n)]
  rest = [float(spec.restitution[i]) for i in range(n)]
  nverts = [int(spec.nverts[i]) for i in range(n)]
  # polygon vertices about the center of mass (com frame), and face normals
  verts_com = [[(float(spec.verts[i, v, 0] - lc[i][0]),
                 float(spec.verts[i, v, 1] - lc[i][1]))
                for v in range(nverts[i])] for i in range(n)]
  wall_n = [(float(spec.wall_normal[wi, 0]), float(spec.wall_normal[wi, 1]))
            for wi in range(nw)]
  wall_off = [float(spec.wall_offset[wi]) for wi in range(nw)]

  joints = []
  for j in range(jn):
    pa, ch = int(spec.j_parent[j]), int(spec.j_child[j])
    joints.append(dict(
        j=j, pa=pa, ch=ch,
        anc_a=(float(spec.j_anchor_a[j, 0] - lc[pa][0]),
               float(spec.j_anchor_a[j, 1] - lc[pa][1])),
        anc_b=(float(spec.j_anchor_b[j, 0] - lc[ch][0]),
               float(spec.j_anchor_b[j, 1] - lc[ch][1])),
        lower=float(spec.j_lower[j]), upper=float(spec.j_upper[j]),
        limited=bool(spec.j_limited[j]),
        equal=bool(spec.j_limited[j] and spec.j_lower[j] == spec.j_upper[j]),
        torque=float(spec.j_torque[j]),
        mA=inv_m[pa], mB=inv_m[ch], iA=inv_i[pa], iB=inv_i[ch]))
    axm_raw = inv_i[pa] + inv_i[ch]
    joints[-1]['axmass'] = (1.0 / axm_raw) if axm_raw > 0 else 0.0

  # ---- contact pairs (static topology; per-pair manifolds are dynamic) ----
  P_pad = len(spec.pair_a)
  pairs = []
  for p in range(P_pad):
    if not bool(spec.pair_valid[p]):
      continue
    pa_, pb_ = int(spec.pair_a[p]), int(spec.pair_b[p])
    pairs.append(dict(
        p=p, a=pa_, b=pb_,
        mu=float(np.sqrt(spec.friction[pa_] * spec.friction[pb_])),
        rest=float(max(spec.restitution[pa_], spec.restitution[pb_]))))
  # outward face normals in the body com frame (constants; rotate in-kernel)
  norms_loc = [[(float(spec.normals[i, v, 0]), float(spec.normals[i, v, 1]))
                for v in range(nverts[i])] for i in range(n)]
  # bodies whose polygon variant participates in pair narrowphase need world
  # verts+normals even if they are circles per-world (RANDOM)
  pair_poly_bodies = set()
  for pd in pairs:
    for i in (pd['a'], pd['b']):
      if kind[i] != CIRCLE:
        pair_poly_bodies.add(i)

  if len(pairs) == 0:
    # static sleep islands (joint graph only — exact when no pairs)
    label = list(range(n))
    for jd in joints:
      a, b = label[jd['pa']], label[jd['ch']]
      lo, hi = min(a, b), max(a, b)
      label = [lo if l == hi else l for l in label]
    islands = {}
    for i, l in enumerate(label):
      islands.setdefault(l, []).append(i)
    islands = list(islands.values())
  else:
    # pairs merge islands dynamically — computed per substep in-kernel with
    # the SAME one-hop min-label propagation count as physics._finalize
    islands = None
  label_iters = max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)
  joint_edges = [(jd['pa'], jd['ch']) for jd in joints]

  ANG_SLOP = float(ANGULAR_SLOP)
  MAX_ACORR = float(MAX_ANGULAR_CORRECTION)

  def wslot(i, wi, k):
    return (i * nw + wi) * 2 + k

  def kernel(c_ref, a_ref, v_ref, w_ref, wci_ref, wcid_ref, ji_ref, jm_ref,
             jl_ref, js_ref, jref_ref, slp_ref, pm_ref, pci_ref, pcid_ref,
             isc_ref, ms_ref,
             c_out, a_out, v_out, w_out, wci_out, wcid_out, ji_out, jm_out,
             jl_out, js_out, slp_out, pm_out, pci_out, pcid_out,
             tr_ref, tr_buf, tr_sem, ms_buf, ms_sem):
    # program_id must be read OUTSIDE lax loop bodies: the interpret-mode
    # evaluator only substitutes it at kernel top level
    g = pl.program_id(0)
    # ---- load state into flat tile tuples --------------------------------
    state0 = (
        tuple(c_ref[i, 0] for i in range(n)),       # cx
        tuple(c_ref[i, 1] for i in range(n)),       # cy
        tuple(a_ref[i] for i in range(n)),          # a
        tuple(v_ref[i, 0] for i in range(n)),       # vx
        tuple(v_ref[i, 1] for i in range(n)),       # vy
        tuple(w_ref[i] for i in range(n)),          # om
        tuple(wci_ref[i, wi, k, 0] for i in range(n) for wi in range(nw)
              for k in range(2)),                   # wcn
        tuple(wci_ref[i, wi, k, 1] for i in range(n) for wi in range(nw)
              for k in range(2)),                   # wct
        tuple(wcid_ref[i, wi, k] for i in range(n) for wi in range(nw)
              for k in range(2)),                   # wcid (f32)
        tuple(ji_ref[j, 0] for j in range(jn_pad)),  # jix
        tuple(ji_ref[j, 1] for j in range(jn_pad)),  # jiy
        tuple(jm_ref[j] for j in range(jn_pad)),     # jmot
        tuple(jl_ref[j] for j in range(jn_pad)),     # jlim
        tuple(js_ref[j] for j in range(jn_pad)),     # jstate (f32)
        tuple(slp_ref[i] for i in range(n)),         # sleep_time
        tuple(pm_ref[j] for j in range(jn_pad)),     # prev_motor
        tuple(pci_ref[pd['p'], k, 0] for pd in pairs
              for k in range(2)),                    # pcn
        tuple(pci_ref[pd['p'], k, 1] for pd in pairs
              for k in range(2)),                    # pct
        tuple(pcid_ref[pd['p'], k] for pd in pairs
              for k in range(2)),                    # pcid (f32)
    )
    jref = tuple(jref_ref[j] for j in range(jn_pad))
    # per-episode shape flags (constant over the rollout); per-world inverse
    # mass/inertia for RANDOM bodies, Python floats for fixed ones
    iscb = tuple((isc_ref[i] > 0.5) if is_rand[i] else None
                 for i in range(n))
    imv = [jnp.where(iscb[i], inv_m2[i][0], inv_m2[i][1])
           if is_rand[i] else inv_m[i] for i in range(n)]
    iiv = [jnp.where(iscb[i], inv_i2[i][0], inv_i2[i][1])
           if is_rand[i] else inv_i[i] for i in range(n)]

    def substep(st, ms, motor_changed):
      (cx, cy, aa, vx, vy, om, wcn, wct, wcid, jix, jiy, jmot, jlim, jstate,
       slp, pm, pcn, pct, pcid) = [list(x) for x in st]
      cx0, cy0, aa0 = list(cx), list(cy), list(aa)

      # ---- 1. integrate velocities + damping ----------------------------
      for i in range(n):
        vx[i] = (vx[i] + dt * gx) / (1.0 + dt * lin_damp[i])
        vy[i] = (vy[i] + dt * gy) / (1.0 + dt * lin_damp[i])
        om[i] = om[i] / (1.0 + dt * ang_damp[i])

      # ---- 2. wall narrowphase ------------------------------------------
      ca = [jnp.cos(aa[i]) for i in range(n)]
      sa = [jnp.sin(aa[i]) for i in range(n)]
      # world verts about com, per poly-capable body (POLY or RANDOM)
      wvx = {}
      wvy = {}
      for i in range(n):
        if not is_circ[i]:
          wvx[i] = [cx[i] + ca[i] * px - sa[i] * py for px, py in verts_com[i]]
          wvy[i] = [cy[i] + sa[i] * px + ca[i] * py for px, py in verts_com[i]]
      # world face normals, for bodies whose polygon variant meets a pair
      wnxb = {}
      wnyb = {}
      for i in sorted(pair_poly_bodies):
        wnxb[i] = [ca[i] * nx_ - sa[i] * ny_ for nx_, ny_ in norms_loc[i]]
        wnyb[i] = [sa[i] * nx_ + ca[i] * ny_ for nx_, ny_ in norms_loc[i]]

      # per-slot narrowphase results
      m_sep = [None] * (n * nw * 2)
      m_tch = [None] * (n * nw * 2)
      m_ids = [None] * (n * nw * 2)
      m_ptx = [None] * (n * nw * 2)
      m_pty = [None] * (n * nw * 2)
      m_lpx = [None] * (n * nw * 2)   # local anchor (com frame)
      m_lpy = [None] * (n * nw * 2)
      rad_sub = [[0.0] * nw for _ in range(n)]
      for i in range(n):
        for wi in range(nw):
          nx, ny = wall_n[wi]
          off = wall_off[wi]
          cvar = None
          pvar = None
          if kind[i] != POLY:    # circle variant
            sep_c = _csubc(_csubc(_csubc(
                _cadd2(_cmul(nx, cx[i]), _cmul(ny, cy[i])), off),
                radius[i]), POLY_RADIUS)
            ptx = _csubc(cx[i], radius[i] * nx)
            pty = _csubc(cy[i], radius[i] * ny)
            z = jnp.zeros_like(sep_c)
            cvar = [(sep_c, ptx, pty, z, z, z),
                    (jnp.full_like(sep_c, BIG), ptx, pty, z, z, z)]
          if kind[i] != CIRCLE:  # polygon variant
            nv = nverts[i]
            seps = [_csubc(_csubc(
                _cadd2(_cmul(nx, wvx[i][v]), _cmul(ny, wvy[i][v])), off),
                2 * POLY_RADIUS) for v in range(nv)]
            # stable top-2 (matches jnp.argsort tie behavior: first wins)
            s1 = seps[0]
            i1 = jnp.zeros_like(s1)
            for v in range(1, nv):
              upd = seps[v] < s1
              s1 = jnp.where(upd, seps[v], s1)
              i1 = jnp.where(upd, float(v), i1)
            s2 = None
            i2 = None
            for v in range(nv):
              cand = jnp.where(i1 == float(v), BIG, seps[v])
              if s2 is None:
                s2 = cand
                i2 = jnp.full_like(cand, float(v))
              else:
                upd = cand < s2
                s2 = jnp.where(upd, cand, s2)
                i2 = jnp.where(upd, float(v), i2)
            # gather the two selected vertices via select chains
            p1x = wvx[i][0]
            p1y = wvy[i][0]
            p2x = wvx[i][0]
            p2y = wvy[i][0]
            for v in range(1, nv):
              p1x = jnp.where(i1 == float(v), wvx[i][v], p1x)
              p1y = jnp.where(i1 == float(v), wvy[i][v], p1y)
            for v in range(1, nv):
              p2x = jnp.where(i2 == float(v), wvx[i][v], p2x)
              p2y = jnp.where(i2 == float(v), wvy[i][v], p2y)
            pvar = []
            for sep, px_, py_, id_ in ((s1, p1x, p1y, i1), (s2, p2x, p2y, i2)):
              # local anchor: R^T (pt - c)
              dx, dy = px_ - cx[i], py_ - cy[i]
              pvar.append((sep, px_, py_, id_,
                           ca[i] * dx + sa[i] * dy,
                           -sa[i] * dx + ca[i] * dy))
          if pvar is None:
            var = cvar
            rad_sub[i][wi] = radius[i] + POLY_RADIUS
          elif cvar is None:
            var = pvar
            rad_sub[i][wi] = 2 * POLY_RADIUS
          else:                  # RANDOM: select per world
            isc = iscb[i]
            var = [tuple(jnp.where(isc, cf, pf)
                         for cf, pf in zip(cvar[k], pvar[k]))
                   for k in range(2)]
            rad_sub[i][wi] = jnp.where(
                isc, radius[i] + POLY_RADIUS, 2 * POLY_RADIUS)
          for k, (sep, px_, py_, id_, lpx_, lpy_) in enumerate(var):
            s = wslot(i, wi, k)
            m_sep[s] = sep
            m_tch[s] = sep <= 0.0
            m_ids[s] = id_
            m_ptx[s] = px_
            m_pty[s] = py_
            m_lpx[s] = lpx_
            m_lpy[s] = lpy_

      # ---- 2b. pair narrowphase (mirrors engine/collision.py in tile form;
      # shape dispatch is static where shapes are fixed, per-world selects
      # where a body's shape is RANDOM) -----------------------------------
      def fsel(idx, vals):
        """vals[int(idx)] via a select chain (f32 index tiles; Mosaic has no
        per-lane vector gather)."""
        out = vals[0]
        for v in range(1, len(vals)):
          out = jnp.where(idx == float(v), vals[v], out)
        return out

      def mf_cc(a, b):
        """circle-circle (collision._collide_circles)."""
        dx = cx[b] - cx[a]
        dy = cy[b] - cy[a]
        dist = jnp.sqrt(dx * dx + dy * dy)
        ok = dist > 1e-9
        inv = 1.0 / jnp.maximum(dist, 1e-9)
        nxv = jnp.where(ok, dx * inv, 0.0)
        nyv = jnp.where(ok, dy * inv, 1.0)
        rA, rB = radius[a], radius[b]
        sep = dist - rA - rB
        ptx = 0.5 * ((cx[a] + rA * nxv) + (cx[b] - rB * nxv))
        pty = 0.5 * ((cy[a] + rA * nyv) + (cy[b] - rB * nyv))
        z = jnp.zeros_like(sep)
        return dict(nx=nxv, ny=nyv, p1x=ptx, p1y=pty, p2x=ptx, p2y=pty,
                    t1=sep <= 0.0, t2=sep > jnp.inf,
                    id1=z, id2=z, mt=0.0, lnx=z, lny=z, lppx=z, lppy=z,
                    l1x=z, l1y=z, l2x=z, l2y=z, rs=rA + rB)

      def mf_pc(i, j, flip):
        """poly(i) vs circle(j) (collision._collide_poly_circle); flip=True
        marks the poly as body B of the pair (normal negated, mtype 2)."""
        nv = nverts[i]
        seps = [wnxb[i][v] * (cx[j] - wvx[i][v])
                + wnyb[i][v] * (cy[j] - wvy[i][v]) for v in range(nv)]
        b_s = seps[0]
        b_i = jnp.zeros_like(b_s)
        for v in range(1, nv):      # argmax, first max wins (jnp.argmax)
          upd = seps[v] > b_s
          b_s = jnp.where(upd, seps[v], b_s)
          b_i = jnp.where(upd, float(v), b_i)
        nxt = jnp.where(b_i == float(nv - 1), 0.0, b_i + 1.0)
        v1x, v1y = fsel(b_i, wvx[i]), fsel(b_i, wvy[i])
        v2x, v2y = fsel(nxt, wvx[i]), fsel(nxt, wvy[i])
        fnx, fny = fsel(b_i, wnxb[i]), fsel(b_i, wnyb[i])
        u1 = (cx[j] - v1x) * (v2x - v1x) + (cy[j] - v1y) * (v2y - v1y)
        u2 = (cx[j] - v2x) * (v1x - v2x) + (cy[j] - v2y) * (v1y - v2y)
        d1x, d1y = cx[j] - v1x, cy[j] - v1y
        d2x, d2y = cx[j] - v2x, cy[j] - v2y
        l1 = jnp.sqrt(d1x * d1x + d1y * d1y)
        l2 = jnp.sqrt(d2x * d2x + d2y * d2y)
        n1x = jnp.where(l1 > 1e-9, d1x / jnp.maximum(l1, 1e-9), fnx)
        n1y = jnp.where(l1 > 1e-9, d1y / jnp.maximum(l1, 1e-9), fny)
        n2x = jnp.where(l2 > 1e-9, d2x / jnp.maximum(l2, 1e-9), fnx)
        n2y = jnp.where(l2 > 1e-9, d2y / jnp.maximum(l2, 1e-9), fny)
        inside = b_s < 1e-9
        use1 = (~inside) & (u1 <= 0.0)
        use2 = (~inside) & (u2 <= 0.0) & (~use1)
        nxv = jnp.where(use1, n1x, jnp.where(use2, n2x, fnx))
        nyv = jnp.where(use1, n1y, jnp.where(use2, n2y, fny))
        plx = jnp.where(use1, v1x, jnp.where(use2, v2x, 0.5 * (v1x + v2x)))
        ply = jnp.where(use1, v1y, jnp.where(use2, v2y, 0.5 * (v1y + v2y)))
        sep_raw = jnp.where(use1, l1, jnp.where(
            use2, l2, (cx[j] - plx) * fnx + (cy[j] - ply) * fny))
        rB = radius[j]
        sep = sep_raw - rB - POLY_RADIUS
        ptx = 0.5 * ((cx[j] - sep_raw * nxv) + (cx[j] - rB * nxv))
        pty = 0.5 * ((cy[j] - sep_raw * nyv) + (cy[j] - rB * nyv))
        dlx, dly = plx - cx[i], ply - cy[i]
        z = jnp.zeros_like(sep)
        return dict(
            nx=-nxv if flip else nxv, ny=-nyv if flip else nyv,
            p1x=ptx, p1y=pty, p2x=ptx, p2y=pty,
            t1=sep <= 0.0, t2=sep > jnp.inf,
            id1=z, id2=z, mt=2.0 if flip else 1.0,
            lnx=ca[i] * nxv + sa[i] * nyv, lny=-sa[i] * nxv + ca[i] * nyv,
            lppx=ca[i] * dlx + sa[i] * dly, lppy=-sa[i] * dlx + ca[i] * dly,
            l1x=z, l1y=z, l2x=z, l2y=z, rs=rB + POLY_RADIUS)

      def max_sep_dir(A, B):
        """collision._max_separation: max over A's faces of min over B's
        verts of face-plane separation. Returns (sep, face-index tile)."""
        best_s = None
        best_i = None
        for k2 in range(nverts[A]):
          off_k = wnxb[A][k2] * wvx[A][k2] + wnyb[A][k2] * wvy[A][k2]
          dmin = None
          for v in range(nverts[B]):
            d = wnxb[A][k2] * wvx[B][v] + wnyb[A][k2] * wvy[B][v] - off_k
            dmin = d if dmin is None else jnp.minimum(dmin, d)
          if best_s is None:
            best_s, best_i = dmin, jnp.zeros_like(dmin)
          else:
            upd = dmin > best_s
            best_s = jnp.where(upd, dmin, best_s)
            best_i = jnp.where(upd, float(k2), best_i)
        return best_s, best_i

      def clipseg(p1x, p1y, p2x, p2y, id1, id2, nx_, ny_, off):
        """collision._clip_segment."""
        d1 = nx_ * p1x + ny_ * p1y - off
        d2 = nx_ * p2x + ny_ * p2y - off
        den = d1 - d2
        t = d1 / jnp.where(jnp.abs(den) > 1e-12, den, 1e-12)
        pmx = p1x + t * (p2x - p1x)
        pmy = p1y + t * (p2y - p1y)
        q1x = jnp.where(d1 <= 0, p1x, pmx)
        q1y = jnp.where(d1 <= 0, p1y, pmy)
        i1 = jnp.where(d1 <= 0, id1, id2 + 16.0)
        q2x = jnp.where(d2 <= 0, p2x, pmx)
        q2y = jnp.where(d2 <= 0, p2y, pmy)
        i2_ = jnp.where(d2 <= 0, id2, id1 + 16.0)
        return q1x, q1y, q2x, q2y, i1, i2_, jnp.minimum(d1, d2) <= 0

      def clip_face(R, I, ref_face, flip):
        """collision._clip_face: clip I's incident face against R's
        reference face ref_face (f32 index tile)."""
        nvR, nvI = nverts[R], nverts[I]
        v1x, v1y = fsel(ref_face, wvx[R]), fsel(ref_face, wvy[R])
        i2 = jnp.where(ref_face == float(nvR - 1), 0.0, ref_face + 1.0)
        v2x, v2y = fsel(i2, wvx[R]), fsel(i2, wvy[R])
        rnx, rny = fsel(ref_face, wnxb[R]), fsel(ref_face, wnyb[R])
        best_d = None
        inc = None
        for v in range(nvI):        # argmin, first min wins (jnp.argmin)
          d = wnxb[I][v] * rnx + wnyb[I][v] * rny
          if best_d is None:
            best_d, inc = d, jnp.zeros_like(d)
          else:
            upd = d < best_d
            best_d = jnp.where(upd, d, best_d)
            inc = jnp.where(upd, float(v), inc)
        j2 = jnp.where(inc == float(nvI - 1), 0.0, inc + 1.0)
        p1x, p1y = fsel(inc, wvx[I]), fsel(inc, wvy[I])
        p2x, p2y = fsel(j2, wvx[I]), fsel(j2, wvy[I])
        tx_, ty_ = v2x - v1x, v2y - v1y
        tl = jnp.maximum(jnp.sqrt(tx_ * tx_ + ty_ * ty_), 1e-9)
        tx_, ty_ = tx_ / tl, ty_ / tl
        q1x, q1y, q2x, q2y, i1, i2_, ok1 = clipseg(
            p1x, p1y, p2x, p2y, inc, j2, -tx_, -ty_,
            -(tx_ * v1x + ty_ * v1y))
        q1x, q1y, q2x, q2y, i1, i2_, ok2 = clipseg(
            q1x, q1y, q2x, q2y, i1, i2_, tx_, ty_,
            tx_ * v2x + ty_ * v2y)
        ok = ok1 & ok2
        total_r = 2 * POLY_RADIUS
        sep1 = rnx * (q1x - v1x) + rny * (q1y - v1y) - total_r
        sep2 = rnx * (q2x - v1x) + rny * (q2y - v1y) - total_r
        midx, midy = 0.5 * (v1x + v2x) - cx[R], 0.5 * (v1y + v2y) - cy[R]
        dq1x, dq1y = q1x - cx[I], q1y - cy[I]
        dq2x, dq2y = q2x - cx[I], q2y - cy[I]
        idoff = 64.0 if flip else 0.0
        return dict(
            nx=-rnx if flip else rnx, ny=-rny if flip else rny,
            p1x=q1x - 0.5 * (sep1 + total_r) * rnx,
            p1y=q1y - 0.5 * (sep1 + total_r) * rny,
            p2x=q2x - 0.5 * (sep2 + total_r) * rnx,
            p2y=q2y - 0.5 * (sep2 + total_r) * rny,
            t1=ok & (sep1 <= 0), t2=ok & (sep2 <= 0),
            id1=i1 + idoff, id2=i2_ + idoff, mt=2.0 if flip else 1.0,
            lnx=ca[R] * rnx + sa[R] * rny, lny=-sa[R] * rnx + ca[R] * rny,
            lppx=ca[R] * midx + sa[R] * midy,
            lppy=-sa[R] * midx + ca[R] * midy,
            l1x=ca[I] * dq1x + sa[I] * dq1y,
            l1y=-sa[I] * dq1x + ca[I] * dq1y,
            l2x=ca[I] * dq2x + sa[I] * dq2y,
            l2y=-sa[I] * dq2x + ca[I] * dq2y,
            rs=total_r)

      def mf_pp(a, b):
        """poly-poly (collision._collide_polys): SAT + incident-edge clip."""
        sepA, faceA = max_sep_dir(a, b)
        sepB, faceB = max_sep_dir(b, a)
        total_r = 2 * POLY_RADIUS
        no_contact = (sepA > total_r) | (sepB > total_r)
        use_b = sepB > sepA + 0.1 * LINEAR_SLOP
        mA = clip_face(a, b, faceA, flip=False)
        mB = clip_face(b, a, faceB, flip=True)
        # bool tiles must be combined with mask logic, not jnp.where: a
        # select with vector<i1> DATA operands (as opposed to an i1
        # predicate over float data) makes Mosaic materialize the bools
        # through i8 and fail lowering with "Unsupported target bitwidth
        # for truncation" (same class as the constant-splat t2 bug, fixed
        # by deriving from compares) — observed on-chip for every pair env
        m = {k2: (_bsel(use_b, mB[k2], mA[k2])
                  if getattr(mA[k2], 'dtype', None) == jnp.bool_ else
                  jnp.where(use_b, mB[k2], mA[k2])) if k2 != 'rs'
             else total_r
             for k2 in mA}
        m['t1'] = m['t1'] & ~no_contact
        m['t2'] = m['t2'] & ~no_contact
        return m

      def mf_pair(pd):
        """collision.collide_pair: static kind dispatch; per-world select
        only where a body's shape is RANDOM."""
        a, b = pd['a'], pd['b']
        ka, kb = kind[a], kind[b]
        # reachable variants
        m_cc = mf_cc(a, b) if (ka != POLY and kb != POLY) else None
        m_pc = mf_pc(a, b, False) if (ka != CIRCLE and kb != POLY) else None
        m_cp = mf_pc(b, a, True) if (ka != POLY and kb != CIRCLE) else None
        m_pp = mf_pp(a, b) if (ka != CIRCLE and kb != CIRCLE) else None
        ms_ = [m for m in (m_cc, m_pc, m_cp, m_pp) if m is not None]
        if len(ms_) == 1:
          return ms_[0]
        out = {}
        for f in ms_[0]:
          def pick(mc, mp):     # select by b's circleness
            if mc is None and mp is None:
              return None
            if mc is None:
              return mp[f]
            if mp is None:
              return mc[f]
            if getattr(mc[f], 'dtype', None) == jnp.bool_:
              return _bsel(iscb[b], mc[f], mp[f])  # no select on i1 data
            return jnp.where(iscb[b], mc[f], mp[f])
          fb = pick(m_cc, m_cp)    # a is a circle
          fa = pick(m_pc, m_pp)    # a is a poly
          if fb is None:
            out[f] = fa
          elif fa is None:
            out[f] = fb
          elif getattr(fb, 'dtype', None) == jnp.bool_:
            out[f] = _bsel(iscb[a], fb, fa)
          else:
            out[f] = jnp.where(iscb[a], fb, fa)
        return out

      pman = [mf_pair(pd) for pd in pairs]

      # ---- 3. warm-start matching ---------------------------------------
      n_wcn = [None] * (n * nw * 2)
      n_wct = [None] * (n * nw * 2)
      for i in range(n):
        for wi in range(nw):
          for k in range(2):
            s = wslot(i, wi, k)
            o1, o2 = wslot(i, wi, 0), wslot(i, wi, 1)
            m1 = (m_ids[s] == wcid[o1]).astype(m_sep[s].dtype)
            m2 = (m_ids[s] == wcid[o2]).astype(m_sep[s].dtype)
            imp_n = m1 * wcn[o1] + m2 * wcn[o2]
            imp_t = m1 * wct[o1] + m2 * wct[o2]
            tchf = m_tch[s]
            n_wcn[s] = jnp.where(tchf, imp_n, 0.0)
            n_wct[s] = jnp.where(tchf, imp_t, 0.0)
      wcn, wct = n_wcn, n_wct
      # pair contacts: carry impulses for persisting feature ids
      n_pcn = [None] * (2 * len(pairs))
      n_pct = [None] * (2 * len(pairs))
      for q in range(len(pairs)):
        m = pman[q]
        o1, o2 = 2 * q, 2 * q + 1
        for k, (idk, tchk) in enumerate(((m['id1'], m['t1']),
                                         (m['id2'], m['t2']))):
          s = 2 * q + k
          m1 = (idk == pcid[o1]).astype(idk.dtype)
          m2 = (idk == pcid[o2]).astype(idk.dtype)
          imp_n = m1 * pcn[o1] + m2 * pcn[o2]
          imp_t = m1 * pct[o1] + m2 * pct[o2]
          n_pcn[s] = jnp.where(tchk, imp_n, 0.0)
          n_pct[s] = jnp.where(tchk, imp_t, 0.0)
      pcn, pct = n_pcn, n_pct

      # ---- 4. constraint init (walls) -----------------------------------
      w_rBx = [None] * (n * nw * 2)
      w_rBy = [None] * (n * nw * 2)
      w_nm = [None] * (n * nw * 2)
      w_tm = [None] * (n * nw * 2)
      w_bias = [None] * (n * nw * 2)
      w_k = [None] * (n * nw * 2)          # raw kn per point
      w_k12 = [None] * (n * nw)
      w_blk = [None] * (n * nw)
      # prefactored 2x2 block inverse (constant across the velocity sweeps;
      # guarded exactly like _block_lcp's idet)
      w_i11 = [None] * (n * nw)
      w_i12 = [None] * (n * nw)
      w_i22 = [None] * (n * nw)
      w_vtch = [None] * (n * nw * 2)
      for i in range(n):
        im, ii = imv[i], iiv[i]
        for wi in range(nw):
          nx, ny = wall_n[wi]
          tx, ty = ny, -nx
          rn = [None, None]
          kn = [None, None]
          kt = [None, None]
          for k in range(2):
            s = wslot(i, wi, k)
            rBx = m_ptx[s] - cx[i]
            rBy = m_pty[s] - cy[i]
            w_rBx[s], w_rBy[s] = rBx, rBy
            rn[k] = _csub2(_cmul(ny, rBx), _cmul(nx, rBy))
            kn[k] = im + ii * rn[k] * rn[k]
            rt = _csub2(_cmul(ty, rBx), _cmul(tx, rBy))
            kt[k] = im + ii * rt * rt
          k12 = im + ii * rn[0] * rn[1]
          det = kn[0] * kn[1] - k12 * k12
          cond = kn[0] * kn[0] < 1000.0 * det
          both = m_tch[wslot(i, wi, 0)] & m_tch[wslot(i, wi, 1)]
          blk = both & cond
          degrade = both & ~cond
          vtch = [m_tch[wslot(i, wi, 0)],
                  m_tch[wslot(i, wi, 1)] & ~degrade]
          w_k12[i * nw + wi] = k12
          w_blk[i * nw + wi] = blk
          if use_prefactor:
            idet = jnp.where(jnp.abs(det) > 1e-12,
                             1.0 / jnp.where(det == 0, 1.0, det), 0.0)
            w_i11[i * nw + wi] = kn[1] * idet
            w_i12[i * nw + wi] = k12 * idet
            w_i22[i * nw + wi] = kn[0] * idet
          for k in range(2):
            s = wslot(i, wi, k)
            w_vtch[s] = vtch[k]
            wcn[s] = jnp.where(vtch[k], wcn[s], 0.0)
            wct[s] = jnp.where(vtch[k], wct[s], 0.0)
            w_k[s] = kn[k]
            w_nm[s] = jnp.where(vtch[k], 1.0 / jnp.maximum(kn[k], 1e-12), 0.0)
            w_tm[s] = jnp.where(vtch[k], 1.0 / jnp.maximum(kt[k], 1e-12), 0.0)
            vn0 = _cadd2(
                None if nx == 0.0 else _cmul(nx, vx[i] - om[i] * w_rBy[s]),
                None if ny == 0.0 else _cmul(ny, vy[i] + om[i] * w_rBx[s]))
            w_bias[s] = jnp.where(vn0 < -VELOCITY_THRESHOLD,
                                  -rest[i] * vn0, 0.0)

      # ---- 4b. pair constraint init (mirrors physics._presolve p_*) ------
      np2 = 2 * len(pairs)
      p_rAx = [None] * np2
      p_rAy = [None] * np2
      p_rBx = [None] * np2
      p_rBy = [None] * np2
      p_nm = [None] * np2
      p_tm = [None] * np2
      p_bias = [None] * np2
      p_k = [None] * np2
      p_k12 = [None] * len(pairs)
      p_blk = [None] * len(pairs)
      p_i11 = [None] * len(pairs)
      p_i12 = [None] * len(pairs)
      p_i22 = [None] * len(pairs)
      p_vtch = [None] * np2
      for q, pd in enumerate(pairs):
        a, b = pd['a'], pd['b']
        m = pman[q]
        imA, iiA = imv[a], iiv[a]
        imB, iiB = imv[b], iiv[b]
        nxv, nyv = m['nx'], m['ny']
        txv, tyv = nyv, -nxv
        rn = [None, None]
        kn = [None, None]
        kt = [None, None]
        for k, (px_, py_) in enumerate(((m['p1x'], m['p1y']),
                                        (m['p2x'], m['p2y']))):
          s = 2 * q + k
          p_rAx[s], p_rAy[s] = px_ - cx[a], py_ - cy[a]
          p_rBx[s], p_rBy[s] = px_ - cx[b], py_ - cy[b]
          rnA = p_rAx[s] * nyv - p_rAy[s] * nxv
          rnB = p_rBx[s] * nyv - p_rBy[s] * nxv
          rn[k] = (rnA, rnB)
          kn[k] = imA + imB + iiA * rnA * rnA + iiB * rnB * rnB
          rtA = p_rAx[s] * tyv - p_rAy[s] * txv
          rtB = p_rBx[s] * tyv - p_rBy[s] * txv
          kt[k] = imA + imB + iiA * rtA * rtA + iiB * rtB * rtB
        k12 = (imA + imB + iiA * rn[0][0] * rn[1][0]
               + iiB * rn[0][1] * rn[1][1])
        det = kn[0] * kn[1] - k12 * k12
        cond = kn[0] * kn[0] < 1000.0 * det
        both = m['t1'] & m['t2']
        p_k12[q] = k12
        p_blk[q] = both & cond
        if use_prefactor:
          idet = jnp.where(jnp.abs(det) > 1e-12,
                           1.0 / jnp.where(det == 0, 1.0, det), 0.0)
          p_i11[q] = kn[1] * idet
          p_i12[q] = k12 * idet
          p_i22[q] = kn[0] * idet
        degrade = both & ~cond
        vtch = [m['t1'], m['t2'] & ~degrade]
        for k in range(2):
          s = 2 * q + k
          p_vtch[s] = vtch[k]
          pcn[s] = jnp.where(vtch[k], pcn[s], 0.0)
          pct[s] = jnp.where(vtch[k], pct[s], 0.0)
          p_k[s] = kn[k]
          p_nm[s] = jnp.where(vtch[k], 1.0 / jnp.maximum(kn[k], 1e-12), 0.0)
          p_tm[s] = jnp.where(vtch[k], 1.0 / jnp.maximum(kt[k], 1e-12), 0.0)
          dvx = (vx[b] - om[b] * p_rBy[s]) - (vx[a] - om[a] * p_rAy[s])
          dvy = (vy[b] + om[b] * p_rBx[s]) - (vy[a] + om[a] * p_rAx[s])
          vn0 = dvx * nxv + dvy * nyv
          p_bias[s] = jnp.where(vn0 < -VELOCITY_THRESHOLD,
                                -pd['rest'] * vn0, 0.0)

      # ---- 4c. batch-granular constraint activity ------------------------
      # A wall/pair block whose every world in this tile is untouched has
      # zero effective masses (w_nm/w_tm/p_nm/p_tm) AND zeroed accumulators
      # (wcn/wct/pcn/pct, cleared above), so all its velocity-sweep impulse
      # deltas are exactly 0 and its NGS impulses are where(touch,..)=0:
      # skipping the block is bit-exact modulo the sign of exact zeros (the
      # same class as the _cmul fold). Most blocks are inert most of the
      # time (exit_probe.py: Urchin runs ~6-7 of 16+1), and the flags are
      # fixed across the whole substep's iterations, so each sweep guards
      # the blocks with scalar lax.conds on these per-substep reductions.
      if skip_inert:
        w_act = []
        for wi in range(nw):
          acc = None
          for i in range(n):
            for k in range(2):
              nm = w_nm[wslot(i, wi, k)]
              acc = nm if acc is None else jnp.maximum(acc, nm)
          w_act.append(jnp.max(acc) > skip_thr)
        p_act = [jnp.max(jnp.maximum(p_nm[2 * q], p_nm[2 * q + 1])) > skip_thr
                 for q in range(len(pairs))]
        # NGS activity keys on the narrowphase touch masks (the position
        # impulse is where(touch, ..)-masked), per wall-point slot / pair
        ngs_w_act = []
        for wi in range(nw):
          for k in range(2):
            acc = None
            for i in range(n):
              t = jnp.where(m_tch[wslot(i, wi, k)], 1.0, 0.0)
              acc = t if acc is None else jnp.maximum(acc, t)
            ngs_w_act.append(jnp.max(acc) > skip_thr)
        ngs_p_act = [
            jnp.max(jnp.where(pman[q]['t1'] | pman[q]['t2'], 1.0, 0.0))
            > skip_thr for q in range(len(pairs))]

      # ---- joints presolve ----------------------------------------------
      j_rAx = [None] * jn_pad
      j_rAy = [None] * jn_pad
      j_rBx = [None] * jn_pad
      j_rBy = [None] * jn_pad
      jpre = [None] * jn_pad
      for jd in joints:
        j, pa, ch = jd['j'], jd['pa'], jd['ch']
        ax_, ay_ = jd['anc_a']
        bx_, by_ = jd['anc_b']
        j_rAx[j] = ca[pa] * ax_ - sa[pa] * ay_
        j_rAy[j] = sa[pa] * ax_ + ca[pa] * ay_
        j_rBx[j] = ca[ch] * bx_ - sa[ch] * by_
        j_rBy[j] = sa[ch] * bx_ + ca[ch] * by_
        ang = aa[ch] - aa[pa] - jref[j]
        if not jd['limited']:
          st_new = jnp.zeros_like(ang)
        elif jd['equal']:
          st_new = jnp.full_like(ang, 3.0)
        else:
          st_new = jnp.where(ang <= jd['lower'], 1.0,
                             jnp.where(ang >= jd['upper'], 2.0, 0.0))
        jlim[j] = jnp.where(st_new == jstate[j], jlim[j], 0.0)
        jstate[j] = st_new
        # effective-mass prefactor: constant across the velocity sweeps
        # (Box2D InitVelocityConstraints); hoists ~40 ops + 5 divides per
        # joint out of every one of the vel_iters iterations
        if use_prefactor:
          iA, iB, mA, mB = jd['iA'], jd['iB'], jd['mA'], jd['mB']
          k11 = mA + mB + iA * j_rAy[j] ** 2 + iB * j_rBy[j] ** 2
          k12 = -iA * j_rAx[j] * j_rAy[j] - iB * j_rBx[j] * j_rBy[j]
          k13 = -iA * j_rAy[j] - iB * j_rBy[j]
          k22 = mA + mB + iA * j_rAx[j] ** 2 + iB * j_rBx[j] ** 2
          k23 = iA * j_rAx[j] + iB * j_rBx[j]
          k33 = iA + iB
          jpre[j] = joint_block_prefactor(k11, k12, k13, k22, k23, k33)

      # ---- 5. warm start ------------------------------------------------
      for i in range(n):
        im, ii = imv[i], iiv[i]
        for wi in range(nw):
          nx, ny = wall_n[wi]
          tx, ty = ny, -nx
          for k in range(2):
            s = wslot(i, wi, k)
            Px = _cadd2(_cmul(nx, wcn[s]), _cmul(tx, wct[s]))
            Py = _cadd2(_cmul(ny, wcn[s]), _cmul(ty, wct[s]))
            vx[i] = vx[i] + im * Px
            vy[i] = vy[i] + im * Py
            om[i] = om[i] + ii * (w_rBx[s] * Py - w_rBy[s] * Px)
      for q, pd in enumerate(pairs):
        a, b = pd['a'], pd['b']
        m = pman[q]
        nxv, nyv = m['nx'], m['ny']
        txv, tyv = nyv, -nxv
        s1, s2 = 2 * q, 2 * q + 1
        P1x = pcn[s1] * nxv + pct[s1] * txv
        P1y = pcn[s1] * nyv + pct[s1] * tyv
        P2x = pcn[s2] * nxv + pct[s2] * txv
        P2y = pcn[s2] * nyv + pct[s2] * tyv
        Psx, Psy = P1x + P2x, P1y + P2y
        vx[a] = vx[a] - imv[a] * Psx
        vy[a] = vy[a] - imv[a] * Psy
        vx[b] = vx[b] + imv[b] * Psx
        vy[b] = vy[b] + imv[b] * Psy
        om[a] = om[a] - iiv[a] * ((p_rAx[s1] * P1y - p_rAy[s1] * P1x)
                                  + (p_rAx[s2] * P2y - p_rAy[s2] * P2x))
        om[b] = om[b] + iiv[b] * ((p_rBx[s1] * P1y - p_rBy[s1] * P1x)
                                  + (p_rBx[s2] * P2y - p_rBy[s2] * P2x))
      for jd in joints:
        j, pa, ch = jd['j'], jd['pa'], jd['ch']
        ax_imp = jmot[j] + jlim[j]
        vx[pa] = vx[pa] - jd['mA'] * jix[j]
        vy[pa] = vy[pa] - jd['mA'] * jiy[j]
        om[pa] = om[pa] - jd['iA'] * (
            j_rAx[j] * jiy[j] - j_rAy[j] * jix[j] + ax_imp)
        vx[ch] = vx[ch] + jd['mB'] * jix[j]
        vy[ch] = vy[ch] + jd['mB'] * jiy[j]
        om[ch] = om[ch] + jd['iB'] * (
            j_rBx[j] * jiy[j] - j_rBy[j] * jix[j] + ax_imp)

      # ---- 6. velocity iterations (fori: trace the body once — a python
      # unroll here made XLA/Mosaic compiles pathologically slow). With
      # spec.solver_exit_tol > 0 the loop becomes a while with a convergence
      # exit: dm accumulates the iteration's largest |impulse delta|
      # elementwise over the worlds tile, reduced to one scalar per trip.
      def vel_body_core(vcarry, compute_dm=True):
        # compute_dm=False (the fixed-trip-count fori path) drops every
        # |impulse-delta| max-reduction at TRACE time: the residual only
        # feeds the exit_tol while-loop condition, and Mosaic is not
        # guaranteed to DCE the dead chain inside the kernel. State math is
        # untouched (dm never feeds velocities/impulses), so this is exact.
        vx, vy, om, wcn, wct, jix, jiy, jmot, jlim, pcn, pct = \
            [list(x) for x in vcarry]
        dm = jnp.zeros_like(vx[0])

        def upd_dm(dm, *vals):
          if not compute_dm:
            return dm
          for v in vals:
            dm = jnp.maximum(dm, jnp.abs(v))
          return dm
        # joints (motor, limit, 2x2 point)
        for jd in joints:
          j, pa, ch = jd['j'], jd['pa'], jd['ch']
          iA, iB, mA, mB = jd['iA'], jd['iB'], jd['mA'], jd['mB']
          axm = jd['axmass']
          if not jd['equal']:
            cdot = om[ch] - om[pa] - ms[j]
            imp = -axm * cdot
            cap = jd['torque'] * dt
            new = jnp.clip(jmot[j] + imp, -cap, cap)
            d = new - jmot[j]
            jmot[j] = new
            om[pa] = om[pa] - iA * d
            om[ch] = om[ch] + iB * d
            dm = upd_dm(dm, d)
          # coupled limit+point solve (b2RevoluteJoint 3x3; _joint_block)
          cdx = vx[ch] - om[ch] * j_rBy[j] - (vx[pa] - om[pa] * j_rAy[j])
          cdy = vy[ch] + om[ch] * j_rBx[j] - (vy[pa] + om[pa] * j_rAx[j])
          cd2 = om[ch] - om[pa]
          if use_prefactor:
            px, py, dz = _joint_block_pre(jstate[j], cdx, cdy, cd2,
                                          jlim[j], *jpre[j])
          else:
            k11 = mA + mB + iA * j_rAy[j] ** 2 + iB * j_rBy[j] ** 2
            k12 = -iA * j_rAx[j] * j_rAy[j] - iB * j_rBx[j] * j_rBy[j]
            k13 = -iA * j_rAy[j] - iB * j_rBy[j]
            k22 = mA + mB + iA * j_rAx[j] ** 2 + iB * j_rBx[j] ** 2
            k23 = iA * j_rAx[j] + iB * j_rBx[j]
            k33 = iA + iB
            px, py, dz = _joint_block(jstate[j], cdx, cdy, cd2, jlim[j],
                                      k11, k12, k13, k22, k23, k33)
          jix[j] = jix[j] + px
          jiy[j] = jiy[j] + py
          jlim[j] = jlim[j] + dz
          vx[pa] = vx[pa] - mA * px
          vy[pa] = vy[pa] - mA * py
          vx[ch] = vx[ch] + mB * px
          vy[ch] = vy[ch] + mB * py
          om[pa] = om[pa] - iA * (j_rAx[j] * py - j_rAy[j] * px + dz)
          om[ch] = om[ch] + iB * (j_rBx[j] * py - j_rBy[j] * px + dz)
          dm = upd_dm(dm, px, py, dz)
        # wall contacts: friction both points, then normal block pair. Each
        # wall's sweep is a function of (vx, vy, om, the wall's 2n wcn/wct
        # slots, dm) so the skip path can guard it with one scalar cond.
        def wall_sweep(wi, vx, vy, om, cn, ct, dm):
          vx, vy, om = list(vx), list(vy), list(om)
          cn, ct = list(cn), list(ct)
          nx, ny = wall_n[wi]
          tx, ty = ny, -nx
          for i in range(n):
            im, ii = imv[i], iiv[i]
            for k in range(2):
              s = wslot(i, wi, k)
              c = i * 2 + k
              vt = _cadd2(
                  None if tx == 0.0 else _cmul(tx, vx[i] - om[i] * w_rBy[s]),
                  None if ty == 0.0 else _cmul(ty, vy[i] + om[i] * w_rBx[s]))
              lam = -w_tm[s] * vt
              maxf = mu[i] * cn[c]
              new = jnp.clip(ct[c] + lam, -maxf, maxf)
              d = new - ct[c]
              ct[c] = new
              dm = upd_dm(dm, d)
              if tx != 0.0:
                vx[i] = vx[i] + _cmul(tx, im * d)
              if ty != 0.0:
                vy[i] = vy[i] + _cmul(ty, im * d)
              om[i] = om[i] + ii * _csub2(_cmul(ty, w_rBx[s] * d),
                                          _cmul(tx, w_rBy[s] * d))
            s1, s2 = wslot(i, wi, 0), wslot(i, wi, 1)
            c1, c2 = i * 2, i * 2 + 1
            a1, a2 = cn[c1], cn[c2]
            # sequential candidate
            vxs, vys, oms = vx[i], vy[i], om[i]
            d_seq = []
            for k, s in enumerate((s1, s2)):
              vn = _cadd2(
                  None if nx == 0.0 else _cmul(nx, vxs - oms * w_rBy[s]),
                  None if ny == 0.0 else _cmul(ny, vys + oms * w_rBx[s]))
              lam = -w_nm[s] * (vn - w_bias[s])
              acc = (a1, a2)[k]
              new = jnp.maximum(acc + lam, 0.0)
              dk = new - acc
              d_seq.append(dk)
              if nx != 0.0:
                vxs = vxs + _cmul(nx, im * dk)
              if ny != 0.0:
                vys = vys + _cmul(ny, im * dk)
              oms = oms + ii * _csub2(_cmul(ny, w_rBx[s] * dk),
                                      _cmul(nx, w_rBy[s] * dk))
            # block candidate
            vn1 = _cadd2(
                None if nx == 0.0 else _cmul(nx, vx[i] - om[i] * w_rBy[s1]),
                None if ny == 0.0 else _cmul(ny, vy[i] + om[i] * w_rBx[s1]))
            vn2 = _cadd2(
                None if nx == 0.0 else _cmul(nx, vx[i] - om[i] * w_rBy[s2]),
                None if ny == 0.0 else _cmul(ny, vy[i] + om[i] * w_rBx[s2]))
            if use_prefactor:
              d1b, d2b = _block_lcp_pre(
                  vn1 - w_bias[s1], vn2 - w_bias[s2], a1, a2,
                  w_k[s1], w_k[s2], w_k12[i * nw + wi],
                  w_i11[i * nw + wi], w_i12[i * nw + wi],
                  w_i22[i * nw + wi], w_nm[s1], w_nm[s2])
            else:
              d1b, d2b = _block_lcp(
                  vn1 - w_bias[s1], vn2 - w_bias[s2], a1, a2,
                  w_k[s1], w_k[s2], w_k12[i * nw + wi],
                  w_nm[s1], w_nm[s2])
            blk = w_blk[i * nw + wi]
            d1 = jnp.where(blk, d1b, d_seq[0])
            d2 = jnp.where(blk, d2b, d_seq[1])
            if nx != 0.0:
              vx[i] = vx[i] + _cmul(nx, im * (d1 + d2))
            if ny != 0.0:
              vy[i] = vy[i] + _cmul(ny, im * (d1 + d2))
            om[i] = om[i] + ii * (
                _csub2(_cmul(ny, w_rBx[s1]), _cmul(nx, w_rBy[s1])) * d1
                + _csub2(_cmul(ny, w_rBx[s2]), _cmul(nx, w_rBy[s2])) * d2)
            cn[c1] = a1 + d1
            cn[c2] = a2 + d2
            dm = upd_dm(dm, d1, d2)
          return (tuple(vx), tuple(vy), tuple(om), tuple(cn), tuple(ct), dm)

        for wi in range(nw):
          cn_w = tuple(wcn[wslot(i, wi, k)]
                       for i in range(n) for k in range(2))
          ct_w = tuple(wct[wslot(i, wi, k)]
                       for i in range(n) for k in range(2))
          ops = (tuple(vx), tuple(vy), tuple(om), cn_w, ct_w, dm)
          if skip_inert:
            ops = jax.lax.cond(
                w_act[wi], lambda o, wi=wi: wall_sweep(wi, *o),
                lambda o: o, ops)
          else:
            ops = wall_sweep(wi, *ops)
          vx, vy, om = list(ops[0]), list(ops[1]), list(ops[2])
          for i in range(n):
            for k in range(2):
              wcn[wslot(i, wi, k)] = ops[3][i * 2 + k]
              wct[wslot(i, wi, k)] = ops[4][i * 2 + k]
          dm = ops[5]
        # pair contacts (mirrors physics.velocity_solve pair_pass): friction
        # at both points from the post-friction state, then the normal pair
        # as sequential candidates vs the 2x2 block LCP. Per-pair function
        # over the mutated tiles so the skip path can cond-guard it.
        def pair_sweep(q, vxa, vya, oma, vxb, vyb, omb, cn1, cn2, ct1, ct2,
                       dm):
          pd = pairs[q]
          a, b = pd['a'], pd['b']
          m = pman[q]
          imA, iiA = imv[a], iiv[a]
          imB, iiB = imv[b], iiv[b]
          nxv, nyv = m['nx'], m['ny']
          txv, tyv = nyv, -nxv
          ct = [ct1, ct2]
          cn = [cn1, cn2]
          for k in range(2):    # friction, both points
            s = 2 * q + k
            dvx = (vxb - omb * p_rBy[s]) - (vxa - oma * p_rAy[s])
            dvy = (vyb + omb * p_rBx[s]) - (vya + oma * p_rAx[s])
            vt = dvx * txv + dvy * tyv
            lam = -p_tm[s] * vt
            maxf = pd['mu'] * cn[k]
            new = jnp.clip(ct[k] + lam, -maxf, maxf)
            d = new - ct[k]
            ct[k] = new
            Px, Py = d * txv, d * tyv
            vxa = vxa - imA * Px
            vya = vya - imA * Py
            vxb = vxb + imB * Px
            vyb = vyb + imB * Py
            oma = oma - iiA * (p_rAx[s] * Py - p_rAy[s] * Px)
            omb = omb + iiB * (p_rBx[s] * Py - p_rBy[s] * Px)
            dm = upd_dm(dm, d)
          s1, s2 = 2 * q, 2 * q + 1
          a1, a2 = cn[0], cn[1]
          # sequential candidate (virtual application in order)
          vxa_, vya_, oma_ = vxa, vya, oma
          vxb_, vyb_, omb_ = vxb, vyb, omb
          d_seq = []
          for k, s in enumerate((s1, s2)):
            dvx = (vxb_ - omb_ * p_rBy[s]) - (vxa_ - oma_ * p_rAy[s])
            dvy = (vyb_ + omb_ * p_rBx[s]) - (vya_ + oma_ * p_rAx[s])
            vn = dvx * nxv + dvy * nyv
            lam = -p_nm[s] * (vn - p_bias[s])
            acc = (a1, a2)[k]
            new = jnp.maximum(acc + lam, 0.0)
            dk = new - acc
            d_seq.append(dk)
            Px, Py = dk * nxv, dk * nyv
            vxa_ = vxa_ - imA * Px
            vya_ = vya_ - imA * Py
            vxb_ = vxb_ + imB * Px
            vyb_ = vyb_ + imB * Py
            oma_ = oma_ - iiA * (p_rAx[s] * Py - p_rAy[s] * Px)
            omb_ = omb_ + iiB * (p_rBx[s] * Py - p_rBy[s] * Px)
          # block candidate from the pre-normal state
          dv1x = (vxb - omb * p_rBy[s1]) - (vxa - oma * p_rAy[s1])
          dv1y = (vyb + omb * p_rBx[s1]) - (vya + oma * p_rAx[s1])
          dv2x = (vxb - omb * p_rBy[s2]) - (vxa - oma * p_rAy[s2])
          dv2y = (vyb + omb * p_rBx[s2]) - (vya + oma * p_rAx[s2])
          vn1 = dv1x * nxv + dv1y * nyv
          vn2 = dv2x * nxv + dv2y * nyv
          if use_prefactor:
            d1b, d2b = _block_lcp_pre(vn1 - p_bias[s1], vn2 - p_bias[s2],
                                      a1, a2, p_k[s1], p_k[s2], p_k12[q],
                                      p_i11[q], p_i12[q], p_i22[q],
                                      p_nm[s1], p_nm[s2])
          else:
            d1b, d2b = _block_lcp(vn1 - p_bias[s1], vn2 - p_bias[s2],
                                  a1, a2, p_k[s1], p_k[s2], p_k12[q],
                                  p_nm[s1], p_nm[s2])
          blk = p_blk[q]
          d1 = jnp.where(blk, d1b, d_seq[0])
          d2 = jnp.where(blk, d2b, d_seq[1])
          Psx = (d1 + d2) * nxv
          Psy = (d1 + d2) * nyv
          vxa = vxa - imA * Psx
          vya = vya - imA * Psy
          vxb = vxb + imB * Psx
          vyb = vyb + imB * Psy
          dwA = ((p_rAx[s1] * nyv - p_rAy[s1] * nxv) * d1
                 + (p_rAx[s2] * nyv - p_rAy[s2] * nxv) * d2)
          dwB = ((p_rBx[s1] * nyv - p_rBy[s1] * nxv) * d1
                 + (p_rBx[s2] * nyv - p_rBy[s2] * nxv) * d2)
          oma = oma - iiA * dwA
          omb = omb + iiB * dwB
          return (vxa, vya, oma, vxb, vyb, omb,
                  a1 + d1, a2 + d2, ct[0], ct[1], dm)

        for q, pd in enumerate(pairs):
          a, b = pd['a'], pd['b']
          s1, s2 = 2 * q, 2 * q + 1
          ops = (vx[a], vy[a], om[a], vx[b], vy[b], om[b],
                 pcn[s1], pcn[s2], pct[s1], pct[s2], dm)
          if skip_inert:
            ops = jax.lax.cond(
                p_act[q], lambda o, q=q: pair_sweep(q, *o),
                lambda o: o, ops)
          else:
            ops = pair_sweep(q, *ops)
          (vx[a], vy[a], om[a], vx[b], vy[b], om[b],
           pcn[s1], pcn[s2], pct[s1], pct[s2], dm) = ops
        out = tuple(tuple(x) for x in
                    (vx, vy, om, wcn, wct, jix, jiy, jmot, jlim, pcn, pct))
        return out, jnp.max(dm)

      vinit = tuple(tuple(x) for x in
                    (vx, vy, om, wcn, wct, jix, jiy, jmot, jlim, pcn, pct))
      if exit_tol > 0.0:
        def w_cond(c):
          return (c[0] < vel_iters) & (c[1] > exit_tol)

        def w_body(c):
          out, dmax = vel_body_core(c[2:])
          return (c[0] + 1, dmax) + out

        fin = jax.lax.while_loop(
            w_cond, w_body,
            (jnp.asarray(0, jnp.int32), jnp.asarray(BIG, jnp.float32))
            + vinit)
        vcarry = fin[2:]
      else:
        vcarry = jax.lax.fori_loop(
            0, vel_iters,
            lambda _, c: vel_body_core(c, compute_dm=False)[0], vinit)
      vx, vy, om, wcn, wct, jix, jiy, jmot, jlim, pcn, pct = \
          [list(x) for x in vcarry]


      # ---- 7. integrate positions ---------------------------------------
      for i in range(n):
        cx[i] = cx[i] + dt * vx[i]
        cy[i] = cy[i] + dt * vy[i]
        aa[i] = aa[i] + dt * om[i]

      # ---- 8. NGS position iterations (contacts, then joints) -----------
      def pos_body(_, pcarry):
        # NOTE: the early-exit mask is carried as f32 (0/1), not bool — Mosaic
        # cannot legalize an i1 vector as an scf.for loop carry on TPU.
        cx, cy, aa, done_f = (*[list(x) for x in pcarry[:3]], pcarry[3])
        done = done_f > 0.5
        # b2Island::Solve position-loop early exit, as a per-world mask
        # (see physics._position_solve)
        cxp, cyp, aap = list(cx), list(cy), list(aa)
        minsep = jnp.zeros_like(cx[0])
        jbad = jnp.zeros_like(done)
        def ngs_wall_slot(idx, cx, cy, aa, minsep):
          cx, cy, aa = list(cx), list(cy), list(aa)
          wi, k = idx // 2, idx % 2
          nx, ny = wall_n[wi]
          off = wall_off[wi]
          for i in range(n):
            im, ii = imv[i], iiv[i]
            ca_, sa_ = jnp.cos(aa[i]), jnp.sin(aa[i])
            s = wslot(i, wi, k)
            ptx = cx[i] + ca_ * m_lpx[s] - sa_ * m_lpy[s]
            pty = cy[i] + sa_ * m_lpx[s] + ca_ * m_lpy[s]
            rs_ = rad_sub[i][wi]   # Python float, or a tile (RANDOM body)
            base = _csubc(_cadd2(_cmul(nx, ptx), _cmul(ny, pty)), off)
            sep = _csubc(base, rs_) if isinstance(rs_, float) else base - rs_
            minsep = jnp.minimum(minsep, jnp.where(m_tch[s], sep, 0.0))
            C = jnp.clip(BAUMGARTE * (sep + LINEAR_SLOP),
                         -MAX_LINEAR_CORRECTION, 0.0)
            rBx, rBy = ptx - cx[i], pty - cy[i]
            crn = _csub2(_cmul(ny, rBx), _cmul(nx, rBy))
            kn = im + ii * crn * crn
            imp = jnp.where(m_tch[s], -C / jnp.maximum(kn, 1e-12), 0.0)
            if nx != 0.0:
              cx[i] = cx[i] + _cmul(nx, im * imp)
            if ny != 0.0:
              cy[i] = cy[i] + _cmul(ny, im * imp)
            aa[i] = aa[i] + ii * crn * imp
          return (tuple(cx), tuple(cy), tuple(aa), minsep)

        for idx in range(nw * 2):
          ops = (tuple(cx), tuple(cy), tuple(aa), minsep)
          if skip_inert:
            # untouched slots contribute where(m_tch,..)=0 impulses and a
            # where(m_tch, sep, 0) minsep term (min(x, 0) == x: minsep
            # starts at 0 and only decreases) — the skip is exact
            ops = jax.lax.cond(
                ngs_w_act[idx], lambda o, idx=idx: ngs_wall_slot(idx, *o),
                lambda o: o, ops)
          else:
            ops = ngs_wall_slot(idx, *ops)
          cx, cy, aa = list(ops[0]), list(ops[1]), list(ops[2])
          minsep = ops[3]
        # pair contacts (mirrors physics._position_solve one_pair_slot):
        # recompute the manifold point from body-local data at the CURRENT
        # poses, per reachable manifold type, then a 1-point NGS correction
        def ngs_pair(q, cxa, cya, aaa, cxb, cyb, aab, minsep):
          pd = pairs[q]
          a, b = pd['a'], pd['b']
          cx = {a: cxa, b: cxb}
          cy = {a: cya, b: cyb}
          aa = {a: aaa, b: aab}
          m = pman[q]
          imA, iiA = imv[a], iiv[a]
          imB, iiB = imv[b], iiv[b]
          ka, kb = kind[a], kind[b]
          mts = set()
          if ka != POLY and kb != POLY:
            mts.add(0)
          if ka != CIRCLE:
            mts.add(1)
          if kb != CIRCLE:
            mts.add(2)
          for k in range(2):
            lkx = (m['l1x'], m['l2x'])[k]
            lky = (m['l1y'], m['l2y'])[k]
            tch = (m['t1'], m['t2'])[k]
            caA, saA = jnp.cos(aa[a]), jnp.sin(aa[a])
            caB, saB = jnp.cos(aa[b]), jnp.sin(aa[b])
            nxv = nyv = ptx = pty = sep = None
            if 0 in mts:     # circle-circle
              pB0x = cx[b] + caB * m['l1x'] - saB * m['l1y']
              pB0y = cy[b] + saB * m['l1x'] + caB * m['l1y']
              d0x, d0y = pB0x - cx[a], pB0y - cy[a]
              dist0 = jnp.sqrt(d0x * d0x + d0y * d0y)
              okd = dist0 > 1e-9
              inv0 = 1.0 / jnp.maximum(dist0, 1e-9)
              n0x = jnp.where(okd, d0x * inv0, 0.0)
              n0y = jnp.where(okd, d0y * inv0, 1.0)
              nxv, nyv = n0x, n0y
              sep = dist0 - m['rs']
              ptx = 0.5 * (cx[a] + pB0x)
              pty = 0.5 * (cy[a] + pB0y)
            if 1 in mts:     # faceA (owner a)
              nf1x = caA * m['lnx'] - saA * m['lny']
              nf1y = saA * m['lnx'] + caA * m['lny']
              pl1x = cx[a] + caA * m['lppx'] - saA * m['lppy']
              pl1y = cy[a] + saA * m['lppx'] + caA * m['lppy']
              cl1x = cx[b] + caB * lkx - saB * lky
              cl1y = cy[b] + saB * lkx + caB * lky
              sep1 = ((cl1x - pl1x) * nf1x + (cl1y - pl1y) * nf1y) - m['rs']
              if nxv is None:
                nxv, nyv, ptx, pty, sep = nf1x, nf1y, cl1x, cl1y, sep1
              else:
                mt1 = m['mt'] == 1.0
                nxv = jnp.where(mt1, nf1x, nxv)
                nyv = jnp.where(mt1, nf1y, nyv)
                ptx = jnp.where(mt1, cl1x, ptx)
                pty = jnp.where(mt1, cl1y, pty)
                sep = jnp.where(mt1, sep1, sep)
            if 2 in mts:     # faceB (owner b)
              nf2x = caB * m['lnx'] - saB * m['lny']
              nf2y = saB * m['lnx'] + caB * m['lny']
              pl2x = cx[b] + caB * m['lppx'] - saB * m['lppy']
              pl2y = cy[b] + saB * m['lppx'] + caB * m['lppy']
              cl2x = cx[a] + caA * lkx - saA * lky
              cl2y = cy[a] + saA * lkx + caA * lky
              sep2 = ((cl2x - pl2x) * nf2x + (cl2y - pl2y) * nf2y) - m['rs']
              if nxv is None:
                nxv, nyv, ptx, pty, sep = -nf2x, -nf2y, cl2x, cl2y, sep2
              else:
                mt2 = m['mt'] == 2.0
                nxv = jnp.where(mt2, -nf2x, nxv)
                nyv = jnp.where(mt2, -nf2y, nyv)
                ptx = jnp.where(mt2, cl2x, ptx)
                pty = jnp.where(mt2, cl2y, pty)
                sep = jnp.where(mt2, sep2, sep)
            minsep = jnp.minimum(minsep, jnp.where(tch, sep, 0.0))
            C = jnp.clip(BAUMGARTE * (sep + LINEAR_SLOP),
                         -MAX_LINEAR_CORRECTION, 0.0)
            rAx, rAy = ptx - cx[a], pty - cy[a]
            rBx, rBy = ptx - cx[b], pty - cy[b]
            crnA = rAx * nyv - rAy * nxv
            crnB = rBx * nyv - rBy * nxv
            kn = imA + imB + iiA * crnA * crnA + iiB * crnB * crnB
            imp = jnp.where(tch, -C / jnp.maximum(kn, 1e-12), 0.0)
            Px, Py = imp * nxv, imp * nyv
            cx[a] = cx[a] - imA * Px
            cy[a] = cy[a] - imA * Py
            cx[b] = cx[b] + imB * Px
            cy[b] = cy[b] + imB * Py
            aa[a] = aa[a] - iiA * (rAx * Py - rAy * Px)
            aa[b] = aa[b] + iiB * (rBx * Py - rBy * Px)
          return (cx[a], cy[a], aa[a], cx[b], cy[b], aa[b], minsep)

        for q, pd in enumerate(pairs):
          a, b = pd['a'], pd['b']
          ops = (cx[a], cy[a], aa[a], cx[b], cy[b], aa[b], minsep)
          if skip_inert:
            ops = jax.lax.cond(
                ngs_p_act[q], lambda o, q=q: ngs_pair(q, *o),
                lambda o: o, ops)
          else:
            ops = ngs_pair(q, *ops)
          cx[a], cy[a], aa[a], cx[b], cy[b], aa[b], minsep = ops
        for jd in joints:
          j, pa, ch = jd['j'], jd['pa'], jd['ch']
          iA, iB, mA, mB = jd['iA'], jd['iB'], jd['mA'], jd['mB']
          ang = aa[ch] - aa[pa] - jref[j]
          c_eq = jnp.clip(ang - jd['lower'], -MAX_ACORR, MAX_ACORR)
          c_lo = jnp.clip(ang - jd['lower'] + ANG_SLOP, -MAX_ACORR, 0.0)
          c_hi = jnp.clip(ang - jd['upper'] - ANG_SLOP, 0.0, MAX_ACORR)
          C = jnp.where(jstate[j] == 3.0, c_eq,
                        jnp.where(jstate[j] == 1.0, c_lo,
                                  jnp.where(jstate[j] == 2.0, c_hi, 0.0)))
          ang_err = jnp.where(
              jstate[j] == 3.0, jnp.abs(c_eq),
              jnp.where(jstate[j] == 1.0, jd['lower'] - ang,
                        jnp.where(jstate[j] == 2.0, ang - jd['upper'], 0.0)))
          d = -jd['axmass'] * C
          aa[pa] = aa[pa] - iA * d
          aa[ch] = aa[ch] + iB * d
          ca_, sa_ = jnp.cos(aa[pa]), jnp.sin(aa[pa])
          cb_, sb_ = jnp.cos(aa[ch]), jnp.sin(aa[ch])
          ax_, ay_ = jd['anc_a']
          bx_, by_ = jd['anc_b']
          rAx = ca_ * ax_ - sa_ * ay_
          rAy = sa_ * ax_ + ca_ * ay_
          rBx = cb_ * bx_ - sb_ * by_
          rBy = sb_ * bx_ + cb_ * by_
          Cvx = cx[ch] + rBx - cx[pa] - rAx
          Cvy = cy[ch] + rBy - cy[pa] - rAy
          jbad = jbad | ((Cvx * Cvx + Cvy * Cvy > LINEAR_SLOP * LINEAR_SLOP)
                         | (ang_err > ANG_SLOP))
          k11 = mA + mB + iA * rAy * rAy + iB * rBy * rBy
          k12 = -iA * rAx * rAy - iB * rBx * rBy
          k22 = mA + mB + iA * rAx * rAx + iB * rBx * rBx
          det = k11 * k22 - k12 * k12
          det = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
          px = -(k22 * Cvx - k12 * Cvy) / det
          py = -(k11 * Cvy - k12 * Cvx) / det
          cx[pa] = cx[pa] - mA * px
          cy[pa] = cy[pa] - mA * py
          cx[ch] = cx[ch] + mB * px
          cy[ch] = cy[ch] + mB * py
          aa[pa] = aa[pa] - iA * (rAx * py - rAy * px)
          aa[ch] = aa[ch] + iB * (rBx * py - rBy * px)

        okay = (minsep >= -3.0 * LINEAR_SLOP) & ~jbad
        for i in range(n):
          cx[i] = jnp.where(done, cxp[i], cx[i])
          cy[i] = jnp.where(done, cyp[i], cy[i])
          aa[i] = jnp.where(done, aap[i], aa[i])
        return (tuple(cx), tuple(cy), tuple(aa),
                jnp.maximum(done_f, okay.astype(jnp.float32)))

      pinit = (tuple(cx), tuple(cy), tuple(aa), jnp.zeros_like(cx[0]))
      if exit_tol > 0.0:
        # actually break at Box2D's done condition (bit-identical to the
        # masked fori: post-done trips are reverted no-ops)
        def p_cond(c):
          return (c[0] < pos_iters) & (jnp.min(c[1][3]) < 0.5)

        def p_body(c):
          return (c[0] + 1, pos_body(None, c[1]))

        _, (cx, cy, aa, _) = jax.lax.while_loop(
            p_cond, p_body, (jnp.asarray(0, jnp.int32), pinit))
      else:
        cx, cy, aa, _ = jax.lax.fori_loop(0, pos_iters, pos_body, pinit)
      cx, cy, aa = list(cx), list(cy), list(aa)

      # ---- 9. sleeping ---------------------------------------------------
      if allow_sleep:
        forced = [jnp.zeros_like(slp[i]) > 1.0 for i in range(n)]
        for jd in joints:
          mc = motor_changed[jd['j']]
          forced[jd['pa']] = forced[jd['pa']] | mc
          forced[jd['ch']] = forced[jd['ch']] | mc
        for i in range(n):
          slow = ((vx[i] * vx[i] + vy[i] * vy[i] <= LIN_SLEEP_TOL_SQ)
                  & (om[i] * om[i] <= float(ANG_SLEEP_TOL_SQ)))
          slp[i] = jnp.where(slow & ~forced[i], slp[i] + dt, 0.0)
        if islands is not None:
          # static islands (joint graph only — exact when no pairs)
          sleep_mask = [None] * n
          for isl in islands:
            mn = slp[isl[0]]
            for i in isl[1:]:
              mn = jnp.minimum(mn, slp[i])
            asleep = mn >= TIME_TO_SLEEP
            for i in isl:
              sleep_mask[i] = asleep
        else:
          # dynamic islands: joints + touching pairs merge bodies. Same
          # one-hop min-label propagation count as physics._finalize so the
          # two paths agree even where the propagation under-converges.
          tch_any = [pman[q]['t1'] | pman[q]['t2'] for q in range(len(pairs))]
          lab = [jnp.zeros_like(slp[i]) + float(i) for i in range(n)]
          for _ in range(label_iters):
            nl = list(lab)
            for (pa_, ch_) in joint_edges:
              nl[pa_] = jnp.minimum(nl[pa_], lab[ch_])
              nl[ch_] = jnp.minimum(nl[ch_], lab[pa_])
            for q, pd in enumerate(pairs):
              a, b = pd['a'], pd['b']
              nl[a] = jnp.minimum(nl[a], jnp.where(tch_any[q], lab[b], BIG))
              nl[b] = jnp.minimum(nl[b], jnp.where(tch_any[q], lab[a], BIG))
            lab = nl
          sleep_mask = []
          for i in range(n):
            mn = slp[i]
            for j2 in range(n):
              if j2 == i:
                continue
              mn = jnp.minimum(mn, jnp.where(lab[j2] == lab[i], slp[j2], BIG))
            sleep_mask.append(mn >= TIME_TO_SLEEP)
        for i in range(n):
          asleep = sleep_mask[i]
          vx[i] = jnp.where(asleep, 0.0, vx[i])
          vy[i] = jnp.where(asleep, 0.0, vy[i])
          om[i] = jnp.where(asleep, 0.0, om[i])
          cx[i] = jnp.where(asleep, cx0[i], cx[i])
          cy[i] = jnp.where(asleep, cy0[i], cy[i])
          aa[i] = jnp.where(asleep, aa0[i], aa[i])

      # ---- 10. warm-start cache writeback -------------------------------
      for s in range(n * nw * 2):
        wcn[s] = jnp.where(m_tch[s], wcn[s], 0.0)
        wct[s] = jnp.where(m_tch[s], wct[s], 0.0)
        wcid[s] = jnp.where(m_tch[s], m_ids[s], -1.0)
      for q in range(len(pairs)):
        m = pman[q]
        for k, (idk, tchk) in enumerate(((m['id1'], m['t1']),
                                         (m['id2'], m['t2']))):
          s = 2 * q + k
          pcn[s] = jnp.where(tchk, pcn[s], 0.0)
          pct[s] = jnp.where(tchk, pct[s], 0.0)
          pcid[s] = jnp.where(tchk, idk, -1.0)

      return tuple(tuple(x) for x in
                   (cx, cy, aa, vx, vy, om, wcn, wct, wcid, jix, jiy, jmot,
                    jlim, jstate, slp, pm, pcn, pct, pcid))

    def step_body(t, st):
      # motor speeds live in HBM (ANY) like the traj output: a VMEM-blocked
      # (T, ...) input put T*SUB under the 16M scoped-vmem cap. One tiny DMA
      # (jn_pad tiles) per step.
      cp_ms = pltpu.make_async_copy(
          ms_ref.at[t, :, pl.ds(g * SUB, SUB), :], ms_buf, ms_sem)
      cp_ms.start()
      cp_ms.wait()
      ms = [ms_buf[j] for j in range(jn_pad)]
      pm = st[15]
      motor_changed = [None] * jn_pad
      for j in range(jn_pad):
        valid = bool(spec.j_valid[j])
        motor_changed[j] = (ms[j] != pm[j]) if valid \
            else (ms[j] != ms[j])  # False
      st = jax.lax.fori_loop(0, substeps,
                             lambda _, s: substep(s, ms, motor_changed), st)
      st = st[:15] + (tuple(ms),) + st[16:]
      # stream per-step poses for the obs pipeline (velocities are not
      # observed — streaming them doubled the traj VMEM/HBM cost for nothing).
      # The traj output lives in HBM (ANY space): holding a (T, ...) block in
      # VMEM capped T and SUB at the 16M scoped-vmem limit, so each step DMAs
      # one (n, 3, SUB, LANE) pose tile out of a small VMEM staging buffer.
      cx, cy, aa = st[0], st[1], st[2]
      for i in range(n):
        tr_buf[i, 0] = cx[i]
        tr_buf[i, 1] = cy[i]
        tr_buf[i, 2] = aa[i]
      cp = pltpu.make_async_copy(
          tr_buf, tr_ref.at[t, :, :, pl.ds(g * SUB, SUB), :], tr_sem)
      cp.start()
      cp.wait()
      return st

    st = jax.lax.fori_loop(0, T, step_body, state0)
    (cx, cy, aa, vx, vy, om, wcn, wct, wcid, jix, jiy, jmot, jlim, jstate,
     slp, pm, pcn, pct, pcid) = st
    for i in range(n):
      c_out[i, 0] = cx[i]
      c_out[i, 1] = cy[i]
      a_out[i] = aa[i]
      v_out[i, 0] = vx[i]
      v_out[i, 1] = vy[i]
      w_out[i] = om[i]
      slp_out[i] = slp[i]
    for i in range(n):
      for wi in range(nw):
        for k in range(2):
          s = wslot(i, wi, k)
          wci_out[i, wi, k, 0] = wcn[s]
          wci_out[i, wi, k, 1] = wct[s]
          wcid_out[i, wi, k] = wcid[s]
    for j in range(jn_pad):
      ji_out[j, 0] = jix[j]
      ji_out[j, 1] = jiy[j]
      jm_out[j] = jmot[j]
      jl_out[j] = jlim[j]
      js_out[j] = jstate[j]
      pm_out[j] = pm[j]
    # pair warm-start caches: valid slots from the carry, padding slots get
    # the jnp path's untouched-slot values (imp 0, id -1)
    zero = jnp.zeros_like(slp[0])
    for p in range(P_pad):
      qs = [q for q, pd in enumerate(pairs) if pd['p'] == p]
      for k in range(2):
        if qs:
          s = 2 * qs[0] + k
          pci_out[p, k, 0] = pcn[s]
          pci_out[p, k, 1] = pct[s]
          pcid_out[p, k] = pcid[s]
        else:
          pci_out[p, k, 0] = zero
          pci_out[p, k, 1] = zero
          pcid_out[p, k] = zero - 1.0

  return kernel


def make_rollout(spec: WorldSpec, T: int, interpret: bool = False):
  """Returns rollout(states, motor_speed) -> (states', traj) where
  motor_speed is (T, B, J) and traj is a dict of (T, B, ...) pose arrays.
  states is a batched WorldState (leading worlds axis)."""
  assert supports(spec), 'megakernel: unsupported spec (see supports())'
  kernel = _build_kernel(spec, T)
  n = spec.n
  nw = len(spec.wall_offset)
  jn_pad = len(spec.j_parent)

  def rollout(states: WorldState, motor_speed):
    B = states.c.shape[0]
    assert B % BLOCK == 0, f'B={B} must be a multiple of {BLOCK}'

    def prep(x):
      if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)
      return _to_tiles(x, B)

    # motor_speed (T,B,J) -> (B,T,J) -> tiles (T,J,B/128,128)
    ins = [prep(states.c), prep(states.a), prep(states.v), prep(states.w),
           prep(states.wc_imp), prep(states.wc_id), prep(states.j_imp),
           prep(states.j_mot), prep(states.j_lim), prep(states.j_state),
           prep(states.j_ref), prep(states.sleep_time),
           prep(states.prev_motor), prep(states.pc_imp), prep(states.pc_id),
           prep(states.is_circle),
           _to_tiles(motor_speed.astype(jnp.float32).transpose(1, 0, 2), B)]

    grid = (B // BLOCK,)

    def spec_for(x):
      s = x.shape[:-2]
      return pl.BlockSpec(
          (*s, SUB, LANE),
          (lambda g, nl=len(s): (0,) * nl + (g, 0)),
          memory_space=pltpu.VMEM)

    out_shapes = [
        jax.ShapeDtypeStruct(ins[0].shape, jnp.float32),   # c
        jax.ShapeDtypeStruct(ins[1].shape, jnp.float32),   # a
        jax.ShapeDtypeStruct(ins[2].shape, jnp.float32),   # v
        jax.ShapeDtypeStruct(ins[3].shape, jnp.float32),   # w
        jax.ShapeDtypeStruct(ins[4].shape, jnp.float32),   # wc_imp
        jax.ShapeDtypeStruct(ins[5].shape, jnp.float32),   # wc_id
        jax.ShapeDtypeStruct(ins[6].shape, jnp.float32),   # j_imp
        jax.ShapeDtypeStruct(ins[7].shape, jnp.float32),   # j_mot
        jax.ShapeDtypeStruct(ins[8].shape, jnp.float32),   # j_lim
        jax.ShapeDtypeStruct(ins[9].shape, jnp.float32),   # j_state
        jax.ShapeDtypeStruct(ins[11].shape, jnp.float32),  # sleep_time
        jax.ShapeDtypeStruct(ins[12].shape, jnp.float32),  # prev_motor
        jax.ShapeDtypeStruct(ins[13].shape, jnp.float32),  # pc_imp
        jax.ShapeDtypeStruct(ins[14].shape, jnp.float32),  # pc_id
        jax.ShapeDtypeStruct((T, n, 3, B // LANE, LANE), jnp.float32),  # traj
    ]
    # traj stays in HBM (ANY) and is filled by per-step DMA from a staging
    # tile — a VMEM-resident (T, ...) block capped T*SUB at the 16M scoped
    # limit (and SUB>8 is the cheapest throughput lever: taller tiles
    # amortize Mosaic per-op issue overhead)
    out_specs = [spec_for(jnp.zeros(o.shape, o.dtype))
                 for o in out_shapes[:-1]]
    out_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
    # motor speeds (the only (T, ...) input) stay in HBM, DMA'd per step
    in_specs = [spec_for(x) for x in ins[:-1]]
    in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((n, 3, SUB, LANE), jnp.float32),  # tr_buf staging
            pltpu.SemaphoreType.DMA,                     # tr_sem
            pltpu.VMEM((jn_pad, SUB, LANE), jnp.float32),  # ms_buf staging
            pltpu.SemaphoreType.DMA,                       # ms_sem
        ],
        interpret=interpret,
    )(*ins)
    (c, a, v, w, wci, wcid, ji, jm, jl, js, slp, pm, pci, pcid, tr) = outs
    new_states = states._replace(
        c=_from_tiles(c, B), a=_from_tiles(a, B), v=_from_tiles(v, B),
        w=_from_tiles(w, B),
        wc_imp=_from_tiles(wci, B),
        wc_id=_from_tiles(wcid, B).astype(states.wc_id.dtype),
        j_imp=_from_tiles(ji, B), j_mot=_from_tiles(jm, B),
        j_lim=_from_tiles(jl, B),
        j_state=_from_tiles(js, B).astype(states.j_state.dtype),
        sleep_time=_from_tiles(slp, B),
        prev_motor=_from_tiles(pm, B),
        pc_imp=_from_tiles(pci, B),
        pc_id=_from_tiles(pcid, B).astype(states.pc_id.dtype),
        ep_t=states.ep_t + T)
    # traj tiles (T, n, 3, B/128, 128) -> (T, B, n, 3); 'tiles' exposes the
    # raw tile layout for consumers that avoid the transpose entirely
    # (render/traj_raster.py renders LCD frames straight from it)
    traj = jnp.moveaxis(tr.reshape(T, n, 3, B), -1, 1)
    return new_states, {'c': traj[..., 0:2], 'a': traj[..., 2],
                        'tiles': tr}

  return rollout

"""Pallas TPU kernel: fused sequential-impulse velocity iterations.

The velocity-iteration loop is the solver hot spot (SURVEY.md §7 names it
the Pallas-kernel candidate). This kernel runs the ENTIRE loop — joints,
wall contacts, pair contacts, all `vel_iters` Gauss-Seidel sweeps — in one
program with every operand resident in VMEM.

Layout: worlds are the vector axis. Each bundle field (B, *S) is transposed
to (*S, B/128, 128); one grid program owns a (*S, 8, 128) block = 1024
worlds, so every scalar slot quantity is exactly one (8, 128) vreg tile and
all constraint math is pure VPU ops. Slot topology unrolls with STATIC
indices; mutable state lives as per-slot tiles carried through the iteration
loop (plain SSA — Mosaic has no scatter), written back with static stores.

Validated against the jnp path in tests/test_pallas.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from boxlcd_tpu.engine.physics import SolveBundle, _block_lcp
from boxlcd_tpu.engine.spec import WorldSpec

SUB, LANE = 8, 128
BLOCK = SUB * LANE  # worlds per program


def _to_kernel_layout(x, B):
  """(B, *S) -> (*S, B/128, 128)."""
  s = x.shape[1:]
  return jnp.moveaxis(x, 0, -1).reshape(*s, B // LANE, LANE)


def _from_kernel_layout(x, B):
  """(*S, B/128, 128) -> (B, *S)."""
  s = x.shape[:-2]
  return jnp.moveaxis(x.reshape(*s, B), -1, 0)


def _make_kernel(spec: WorldSpec):
  """Build the kernel fn closed over all static topology."""
  n = spec.n
  nw = len(spec.wall_offset)
  jn_pad = len(spec.j_parent)
  pn_pad = len(spec.pair_a)
  dt = spec.dt
  vel_iters = spec.vel_iters
  joints = [(j, int(spec.j_parent[j]), int(spec.j_child[j]),
             bool(spec.j_limited[j] and spec.j_lower[j] == spec.j_upper[j]),
             float(spec.j_torque[j]))
            for j in range(spec.jn)]
  pairs = [(p, int(spec.pair_a[p]), int(spec.pair_b[p]))
           for p in range(pn_pad) if spec.pair_valid[p]]
  wall_n = np.asarray(spec.wall_normal)

  def kernel(v_ref, w_ref, j_imp_ref, j_mot_ref, j_lim_ref, wc_ref, pc_ref,
             inv_m_ref, inv_i_ref, j_rA_ref, j_rB_ref, j_axm_ref,
             j_state_ref, j_mA_ref, j_mB_ref, j_iA_ref, j_iB_ref, ms_ref,
             w_rB_ref, w_nm_ref, w_tm_ref, w_bias_ref, w_mu_ref,
             w_k_ref, w_k12_ref, w_blk_ref,
             p_n_ref, p_rA_ref, p_rB_ref, p_nm_ref, p_tm_ref, p_bias_ref,
             p_mu_ref, p_imA_ref, p_imB_ref, p_iiA_ref, p_iiB_ref,
             p_k_ref, p_k12_ref, p_blk_ref,
             v_out, w_out, j_imp_out, j_mot_out, j_lim_out, wc_out, pc_out):
    # mutable state as flat tuples of (8, 128) tiles
    vx0 = tuple(v_ref[i, 0] for i in range(n))
    vy0 = tuple(v_ref[i, 1] for i in range(n))
    om0 = tuple(w_ref[i] for i in range(n))
    jix0 = tuple(j_imp_ref[j, 0] for j in range(jn_pad))
    jiy0 = tuple(j_imp_ref[j, 1] for j in range(jn_pad))
    jm0 = tuple(j_mot_ref[j] for j in range(jn_pad))
    jl0 = tuple(j_lim_ref[j] for j in range(jn_pad))
    wcn0 = tuple(wc_ref[i, wi, k, 0]
                 for i in range(n) for wi in range(nw) for k in range(2))
    wct0 = tuple(wc_ref[i, wi, k, 1]
                 for i in range(n) for wi in range(nw) for k in range(2))
    pcn0 = tuple(pc_ref[p, k, 0] for p in range(pn_pad) for k in range(2))
    pct0 = tuple(pc_ref[p, k, 1] for p in range(pn_pad) for k in range(2))

    def wslot(i, wi, k):
      return (i * nw + wi) * 2 + k

    def body(_, carry):
      vx, vy, om, jix, jiy, jm, jl, wcn, wct, pcn, pct = \
          [list(c) for c in carry]
      # ---- joints (static unroll) -----------------------------------------
      for j, pa, ch, is_equal, torque in joints:
        iA, iB = j_iA_ref[j], j_iB_ref[j]
        mA, mB = j_mA_ref[j], j_mB_ref[j]
        rAx, rAy = j_rA_ref[j, 0], j_rA_ref[j, 1]
        rBx, rBy = j_rB_ref[j, 0], j_rB_ref[j, 1]
        axm = j_axm_ref[j]
        state = j_state_ref[j]
        if not is_equal:  # motor
          cdot = om[ch] - om[pa] - ms_ref[j]
          imp = -axm * cdot
          cap = torque * dt
          new = jnp.clip(jm[j] + imp, -cap, cap)
          d = new - jm[j]
          jm[j] = new
          om[pa] = om[pa] - iA * d
          om[ch] = om[ch] + iB * d
        # limit (Box2D 2.3 state-based accumulator)
        cdot = om[ch] - om[pa]
        imp = -axm * cdot
        acc = jl[j] + imp
        acc = jnp.where(state == 1, jnp.maximum(acc, 0.0),
                        jnp.where(state == 2, jnp.minimum(acc, 0.0), acc))
        d = jnp.where(state > 0, acc - jl[j], 0.0)
        jl[j] = jl[j] + d
        om[pa] = om[pa] - iA * d
        om[ch] = om[ch] + iB * d
        # point 2x2 (componentwise)
        cdx = vx[ch] - om[ch] * rBy - (vx[pa] - om[pa] * rAy)
        cdy = vy[ch] + om[ch] * rBx - (vy[pa] + om[pa] * rAx)
        k11 = mA + mB + iA * rAy * rAy + iB * rBy * rBy
        k12 = -iA * rAx * rAy - iB * rBx * rBy
        k22 = mA + mB + iA * rAx * rAx + iB * rBx * rBx
        det = k11 * k22 - k12 * k12
        det = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
        px = -(k22 * cdx - k12 * cdy) / det
        py = -(k11 * cdy - k12 * cdx) / det
        jix[j] = jix[j] + px
        jiy[j] = jiy[j] + py
        vx[pa] = vx[pa] - mA * px
        vy[pa] = vy[pa] - mA * py
        vx[ch] = vx[ch] + mB * px
        vy[ch] = vy[ch] + mB * py
        om[pa] = om[pa] - iA * (rAx * py - rAy * px)
        om[ch] = om[ch] + iB * (rBx * py - rBy * px)
      # ---- wall contacts (Box2D order: friction both points, then the
      # normal pair as a 2x2 block or sequentially) -------------------------
      for wi in range(nw):
        nx, ny = float(wall_n[wi, 0]), float(wall_n[wi, 1])
        tx, ty = ny, -nx
        for i in range(n):
          im, ii = inv_m_ref[i], inv_i_ref[i]
          for k in range(2):  # friction
            s = wslot(i, wi, k)
            rBx, rBy = w_rB_ref[i, wi, k, 0], w_rB_ref[i, wi, k, 1]
            dvx = vx[i] - om[i] * rBy
            dvy = vy[i] + om[i] * rBx
            vt = dvx * tx + dvy * ty
            lam = -w_tm_ref[i, wi, k] * vt
            maxf = w_mu_ref[i] * wcn[s]
            new = jnp.clip(wct[s] + lam, -maxf, maxf)
            d = new - wct[s]
            wct[s] = new
            vx[i] = vx[i] + im * d * tx
            vy[i] = vy[i] + im * d * ty
            om[i] = om[i] + ii * (rBx * d * ty - rBy * d * tx)
          # normal
          s1, s2 = wslot(i, wi, 0), wslot(i, wi, 1)
          rB1x, rB1y = w_rB_ref[i, wi, 0, 0], w_rB_ref[i, wi, 0, 1]
          rB2x, rB2y = w_rB_ref[i, wi, 1, 0], w_rB_ref[i, wi, 1, 1]
          a1, a2 = wcn[s1], wcn[s2]
          # sequential candidate
          vxs, vys, oms = vx[i], vy[i], om[i]
          d_seq = []
          for k, (rBx, rBy, acc) in enumerate(
              ((rB1x, rB1y, a1), (rB2x, rB2y, a2))):
            vn = (vxs - oms * rBy) * nx + (vys + oms * rBx) * ny
            lam = -w_nm_ref[i, wi, k] * (vn - w_bias_ref[i, wi, k])
            new = jnp.maximum(acc + lam, 0.0)
            dk = new - acc
            d_seq.append(dk)
            vxs = vxs + im * dk * nx
            vys = vys + im * dk * ny
            oms = oms + ii * (rBx * dk * ny - rBy * dk * nx)
          # block candidate
          vn1 = (vx[i] - om[i] * rB1y) * nx + (vy[i] + om[i] * rB1x) * ny
          vn2 = (vx[i] - om[i] * rB2y) * nx + (vy[i] + om[i] * rB2x) * ny
          d1b, d2b = _block_lcp(
              vn1 - w_bias_ref[i, wi, 0], vn2 - w_bias_ref[i, wi, 1],
              a1, a2, w_k_ref[i, wi, 0], w_k_ref[i, wi, 1], w_k12_ref[i, wi],
              w_nm_ref[i, wi, 0], w_nm_ref[i, wi, 1])
          blk = w_blk_ref[i, wi] > 0.5
          d1 = jnp.where(blk, d1b, d_seq[0])
          d2 = jnp.where(blk, d2b, d_seq[1])
          vx[i] = vx[i] + im * (d1 + d2) * nx
          vy[i] = vy[i] + im * (d1 + d2) * ny
          om[i] = om[i] + ii * ((rB1x * ny - rB1y * nx) * d1
                                + (rB2x * ny - rB2y * nx) * d2)
          wcn[s1] = a1 + d1
          wcn[s2] = a2 + d2
      # ---- pair contacts (same Box2D order as walls) ----------------------
      for p, a_i, b_i in pairs:
        nx, ny = p_n_ref[p, 0], p_n_ref[p, 1]
        tx, ty = ny, -nx
        imA, imB = p_imA_ref[p], p_imB_ref[p]
        iA, iB = p_iiA_ref[p], p_iiB_ref[p]
        for k in range(2):  # friction
          s = p * 2 + k
          rAx, rAy = p_rA_ref[p, k, 0], p_rA_ref[p, k, 1]
          rBx, rBy = p_rB_ref[p, k, 0], p_rB_ref[p, k, 1]
          dvx = vx[b_i] - om[b_i] * rBy - (vx[a_i] - om[a_i] * rAy)
          dvy = vy[b_i] + om[b_i] * rBx - (vy[a_i] + om[a_i] * rAx)
          vt = dvx * tx + dvy * ty
          lam = -p_tm_ref[p, k] * vt
          maxf = p_mu_ref[p] * pcn[s]
          new = jnp.clip(pct[s] + lam, -maxf, maxf)
          d = new - pct[s]
          pct[s] = new
          px, py = d * tx, d * ty
          vx[a_i] = vx[a_i] - imA * px
          vy[a_i] = vy[a_i] - imA * py
          vx[b_i] = vx[b_i] + imB * px
          vy[b_i] = vy[b_i] + imB * py
          om[a_i] = om[a_i] - iA * (rAx * py - rAy * px)
          om[b_i] = om[b_i] + iB * (rBx * py - rBy * px)
        # normal
        s1, s2 = p * 2, p * 2 + 1
        rA1x, rA1y = p_rA_ref[p, 0, 0], p_rA_ref[p, 0, 1]
        rB1x, rB1y = p_rB_ref[p, 0, 0], p_rB_ref[p, 0, 1]
        rA2x, rA2y = p_rA_ref[p, 1, 0], p_rA_ref[p, 1, 1]
        rB2x, rB2y = p_rB_ref[p, 1, 0], p_rB_ref[p, 1, 1]
        a1, a2 = pcn[s1], pcn[s2]

        def rel_vn(vxa, vya, oma, vxb, vyb, omb, rAx, rAy, rBx, rBy):
          dvx = vxb - omb * rBy - (vxa - oma * rAy)
          dvy = vyb + omb * rBx - (vya + oma * rAx)
          return dvx * nx + dvy * ny

        # sequential candidate
        sa = (vx[a_i], vy[a_i], om[a_i])
        sb = (vx[b_i], vy[b_i], om[b_i])
        d_seq = []
        for k, (rAx, rAy, rBx, rBy, acc) in enumerate(
            ((rA1x, rA1y, rB1x, rB1y, a1), (rA2x, rA2y, rB2x, rB2y, a2))):
          vn = rel_vn(*sa, *sb, rAx, rAy, rBx, rBy)
          lam = -p_nm_ref[p, k] * (vn - p_bias_ref[p, k])
          new = jnp.maximum(acc + lam, 0.0)
          dk = new - acc
          d_seq.append(dk)
          px, py = dk * nx, dk * ny
          sa = (sa[0] - imA * px, sa[1] - imA * py,
                sa[2] - iA * (rAx * py - rAy * px))
          sb = (sb[0] + imB * px, sb[1] + imB * py,
                sb[2] + iB * (rBx * py - rBy * px))
        # block candidate
        vn1 = rel_vn(vx[a_i], vy[a_i], om[a_i], vx[b_i], vy[b_i], om[b_i],
                     rA1x, rA1y, rB1x, rB1y)
        vn2 = rel_vn(vx[a_i], vy[a_i], om[a_i], vx[b_i], vy[b_i], om[b_i],
                     rA2x, rA2y, rB2x, rB2y)
        d1b, d2b = _block_lcp(
            vn1 - p_bias_ref[p, 0], vn2 - p_bias_ref[p, 1], a1, a2,
            p_k_ref[p, 0], p_k_ref[p, 1], p_k12_ref[p],
            p_nm_ref[p, 0], p_nm_ref[p, 1])
        blk = p_blk_ref[p] > 0.5
        d1 = jnp.where(blk, d1b, d_seq[0])
        d2 = jnp.where(blk, d2b, d_seq[1])
        px, py = (d1 + d2) * nx, (d1 + d2) * ny
        vx[a_i] = vx[a_i] - imA * px
        vy[a_i] = vy[a_i] - imA * py
        vx[b_i] = vx[b_i] + imB * px
        vy[b_i] = vy[b_i] + imB * py
        om[a_i] = om[a_i] - iA * ((rA1x * ny - rA1y * nx) * d1
                                  + (rA2x * ny - rA2y * nx) * d2)
        om[b_i] = om[b_i] + iB * ((rB1x * ny - rB1y * nx) * d1
                                  + (rB2x * ny - rB2y * nx) * d2)
        pcn[s1] = a1 + d1
        pcn[s2] = a2 + d2
      return tuple(tuple(c) for c in
                   (vx, vy, om, jix, jiy, jm, jl, wcn, wct, pcn, pct))

    carry = (vx0, vy0, om0, jix0, jiy0, jm0, jl0, wcn0, wct0, pcn0, pct0)
    vx, vy, om, jix, jiy, jm, jl, wcn, wct, pcn, pct = jax.lax.fori_loop(
        0, vel_iters, body, carry)

    for i in range(n):
      v_out[i, 0] = vx[i]
      v_out[i, 1] = vy[i]
      w_out[i] = om[i]
    for j in range(jn_pad):
      j_imp_out[j, 0] = jix[j]
      j_imp_out[j, 1] = jiy[j]
      j_mot_out[j] = jm[j]
      j_lim_out[j] = jl[j]
    for i in range(n):
      for wi in range(nw):
        for k in range(2):
          s = wslot(i, wi, k)
          wc_out[i, wi, k, 0] = wcn[s]
          wc_out[i, wi, k, 1] = wct[s]
    for p in range(pn_pad):
      for k in range(2):
        pc_out[p, k, 0] = pcn[p * 2 + k]
        pc_out[p, k, 1] = pct[p * 2 + k]

  return kernel


# bundle fields the kernel consumes, in ref order
_IN_FIELDS = ['v', 'w', 'j_imp', 'j_mot', 'j_lim', 'wc', 'pc',
              'inv_m', 'inv_i', 'j_rA', 'j_rB', 'j_axmass', 'j_state',
              'j_mA', 'j_mB', 'j_iA', 'j_iB', 'motor_speed',
              'w_rB', 'w_nmass', 'w_tmass', 'w_bias', 'w_mu',
              'w_k', 'w_k12', 'w_block',
              'p_n', 'p_rA', 'p_rB', 'p_nmass', 'p_tmass', 'p_bias',
              'p_mu', 'p_imA', 'p_imB', 'p_iiA', 'p_iiB',
              'p_k', 'p_k12', 'p_block']
_OUT_FIELDS = ['v', 'w', 'j_imp', 'j_mot', 'j_lim', 'wc', 'pc']


def make_batched_solver(spec: WorldSpec, interpret: bool = False):
  """Returns velocity_solver(bundle) for step_world_batch: the fused Pallas
  velocity-iteration kernel over the whole world batch."""
  kernel = _make_kernel(spec)

  def solver(b: SolveBundle) -> SolveBundle:
    B = b.v.shape[0]
    pad = (-B) % BLOCK
    Bp = B + pad

    def prep(x):
      if x.dtype == jnp.bool_:
        x = x.astype(jnp.float32)  # Mosaic tiles want numeric dtypes
      if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad, *x.shape[1:]), x.dtype)], axis=0)
      return _to_kernel_layout(x, Bp)

    ins = [prep(getattr(b, f)) for f in _IN_FIELDS]
    grid = (Bp // BLOCK,)

    def spec_for(x):
      s = x.shape[:-2]
      block = (*s, SUB, LANE)
      return pl.BlockSpec(
          block,
          functools.partial(lambda g, nlead: (0,) * nlead + (g, 0),
                            nlead=len(s)),
          memory_space=pltpu.VMEM)

    out_shapes = [jax.ShapeDtypeStruct(ins[_IN_FIELDS.index(f)].shape,
                                       ins[_IN_FIELDS.index(f)].dtype)
                  for f in _OUT_FIELDS]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_for(x) for x in ins],
        out_specs=[spec_for(jnp.zeros(o.shape, o.dtype)) for o in out_shapes],
        out_shape=out_shapes,
        interpret=interpret,
    )(*ins)
    updates = {f: _from_kernel_layout(o, Bp)[:B]
               for f, o in zip(_OUT_FIELDS, outs)}
    return b._replace(**updates)

  return solver

"""Pallas TPU kernels: fused constraint solving for the physics substep.

Two kernels share one body-builder:
- the velocity kernel (`make_batched_solver`) runs the sequential-impulse
  velocity iterations — joints, wall contacts, pair contacts, all
  `vel_iters` Gauss-Seidel sweeps — in one program with every operand
  resident in VMEM.
- the substep kernel (`make_substep_solver`) extends it with position
  integration and the non-linear Gauss-Seidel position iterations, fusing
  the whole post-narrowphase substep (velocity solve + integrate + NGS).
  The NGS stage is the measured hot spot on TPU: as sequential XLA scans it
  costs ~5.6 ms per substep at 4096 worlds (~99% of the step), because each
  tiny constraint-slot update becomes its own dispatched op; in-kernel the
  same updates are back-to-back VPU tile ops.

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

from boxlcd_tpu.engine.physics import (
    ANGULAR_SLOP, BAUMGARTE, LINEAR_SLOP, MAX_ANGULAR_CORRECTION,
    MAX_LINEAR_CORRECTION, SolveBundle, _block_lcp, _joint_block)
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


def _make_kernel(spec: WorldSpec, with_position: bool = False):
  """Build the kernel fn closed over all static topology."""
  n = spec.n
  nw = len(spec.wall_offset)
  jn_pad = len(spec.j_parent)
  pn_pad = len(spec.pair_a)
  dt = spec.dt
  vel_iters = spec.vel_iters
  pos_iters = spec.pos_iters
  joints = [(j, int(spec.j_parent[j]), int(spec.j_child[j]),
             bool(spec.j_limited[j] and spec.j_lower[j] == spec.j_upper[j]),
             float(spec.j_torque[j]))
            for j in range(spec.jn)]
  jlims = [(float(spec.j_lower[j]), float(spec.j_upper[j]))
           for j in range(jn_pad)]
  pairs = [(p, int(spec.pair_a[p]), int(spec.pair_b[p]))
           for p in range(pn_pad) if spec.pair_valid[p]]
  wall_n = np.asarray(spec.wall_normal)
  wall_off = np.asarray(spec.wall_offset)
  # numpy copies of the Box2D constants (jnp module constants would become
  # captured device arrays inside the kernel)
  ANG_SLOP = float(ANGULAR_SLOP)
  MAX_ACORR = float(MAX_ANGULAR_CORRECTION)

  def kernel(v_ref, w_ref, j_imp_ref, j_mot_ref, j_lim_ref, wc_ref, pc_ref,
             inv_m_ref, inv_i_ref, j_rA_ref, j_rB_ref, j_axm_ref,
             j_state_ref, j_mA_ref, j_mB_ref, j_iA_ref, j_iB_ref, ms_ref,
             w_rB_ref, w_nm_ref, w_tm_ref, w_bias_ref, w_mu_ref,
             w_k_ref, w_k12_ref, w_blk_ref,
             p_n_ref, p_rA_ref, p_rB_ref, p_nm_ref, p_tm_ref, p_bias_ref,
             p_mu_ref, p_imA_ref, p_imB_ref, p_iiA_ref, p_iiB_ref,
             p_k_ref, p_k12_ref, p_blk_ref,
             *rest):
    if with_position:
      (c0_ref, a0_ref, w_lps_ref, w_rads_ref, w_tch_ref,
       p_lps_ref, p_ln_ref, p_lpp_ref, p_rads_ref, p_mt_ref, p_tch_ref,
       j_ref_ref, j_anca_ref, j_ancb_ref,
       v_out, w_out, j_imp_out, j_mot_out, j_lim_out, wc_out, pc_out,
       c_out, a_out) = rest
    else:
      (v_out, w_out, j_imp_out, j_mot_out, j_lim_out, wc_out,
       pc_out) = rest
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
        # coupled limit+point solve (b2RevoluteJoint 3x3; physics._joint_block)
        cdx = vx[ch] - om[ch] * rBy - (vx[pa] - om[pa] * rAy)
        cdy = vy[ch] + om[ch] * rBx - (vy[pa] + om[pa] * rAx)
        cd2 = om[ch] - om[pa]
        k11 = mA + mB + iA * rAy * rAy + iB * rBy * rBy
        k12 = -iA * rAx * rAy - iB * rBx * rBy
        k13 = -iA * rAy - iB * rBy
        k22 = mA + mB + iA * rAx * rAx + iB * rBx * rBx
        k23 = iA * rAx + iB * rBx
        k33 = iA + iB
        px, py, dz = _joint_block(state, cdx, cdy, cd2, jl[j],
                                  k11, k12, k13, k22, k23, k33)
        jix[j] = jix[j] + px
        jiy[j] = jiy[j] + py
        jl[j] = jl[j] + dz
        vx[pa] = vx[pa] - mA * px
        vy[pa] = vy[pa] - mA * py
        vx[ch] = vx[ch] + mB * px
        vy[ch] = vy[ch] + mB * py
        om[pa] = om[pa] - iA * (rAx * py - rAy * px + dz)
        om[ch] = om[ch] + iB * (rBx * py - rBy * px + dz)
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

    if with_position:
      # ---- integrate positions + NGS iterations (mirrors
      # physics._position_solve: walls, pairs, then joints per iteration) ---
      cx0 = tuple(c0_ref[i, 0] + dt * vx[i] for i in range(n))
      cy0 = tuple(c0_ref[i, 1] + dt * vy[i] for i in range(n))
      aa0 = tuple(a0_ref[i] + dt * om[i] for i in range(n))

      def pos_body(_, carry):
        cx, cy, aa, done = (*[list(c) for c in carry[:3]], carry[3])
        # b2Island::Solve position-loop early exit, as a per-world mask
        # (see physics._position_solve)
        cxp, cyp, aap = list(cx), list(cy), list(aa)
        minsep = jnp.zeros_like(cx[0])
        jbad = jnp.zeros_like(done)
        # wall contacts: slots (wi, k) sequential, bodies independent
        for idx in range(nw * 2):
          wi, k = idx // 2, idx % 2
          nx, ny = float(wall_n[wi, 0]), float(wall_n[wi, 1])
          off = float(wall_off[wi])
          for i in range(n):
            im, ii = inv_m_ref[i], inv_i_ref[i]
            ca_, sa_ = jnp.cos(aa[i]), jnp.sin(aa[i])
            lx = w_lps_ref[i, wi, k, 0]
            ly = w_lps_ref[i, wi, k, 1]
            ptx = cx[i] + ca_ * lx - sa_ * ly
            pty = cy[i] + sa_ * lx + ca_ * ly
            sep = ptx * nx + pty * ny - off - w_rads_ref[i, wi]
            minsep = jnp.minimum(
                minsep, jnp.where(w_tch_ref[i, wi, k] > 0.5, sep, 0.0))
            C = jnp.clip(BAUMGARTE * (sep + LINEAR_SLOP),
                         -MAX_LINEAR_CORRECTION, 0.0)
            rBx, rBy = ptx - cx[i], pty - cy[i]
            crn = rBx * ny - rBy * nx
            kn = im + ii * crn * crn
            imp = jnp.where(w_tch_ref[i, wi, k] > 0.5,
                            -C / jnp.maximum(kn, 1e-12), 0.0)
            cx[i] = cx[i] + im * imp * nx
            cy[i] = cy[i] + im * imp * ny
            aa[i] = aa[i] + ii * crn * imp
        # pair contacts: slots (p, k) sequential
        for p, ia, ib in pairs:
          imA, imB = inv_m_ref[ia], inv_m_ref[ib]
          iiA, iiB = inv_i_ref[ia], inv_i_ref[ib]
          mt = p_mt_ref[p]
          rad = p_rads_ref[p]
          lnx, lny = p_ln_ref[p, 0], p_ln_ref[p, 1]
          lppx, lppy = p_lpp_ref[p, 0], p_lpp_ref[p, 1]
          for k in range(2):
            ca_, sa_ = jnp.cos(aa[ia]), jnp.sin(aa[ia])
            cb_, sb_ = jnp.cos(aa[ib]), jnp.sin(aa[ib])
            # circle-circle candidate (always from clip point 0)
            l0x, l0y = p_lps_ref[p, 0, 0], p_lps_ref[p, 0, 1]
            pB0x = cx[ib] + cb_ * l0x - sb_ * l0y
            pB0y = cy[ib] + sb_ * l0x + cb_ * l0y
            d0x, d0y = pB0x - cx[ia], pB0y - cy[ia]
            dist0 = jnp.sqrt(d0x * d0x + d0y * d0y)
            ok0 = dist0 > 1e-9
            inv0 = 1.0 / jnp.maximum(dist0, 1e-9)
            n0x = jnp.where(ok0, d0x * inv0, 0.0)
            n0y = jnp.where(ok0, d0y * inv0, 1.0)
            sep0 = dist0 - rad
            pt0x = 0.5 * (cx[ia] + pB0x)
            pt0y = 0.5 * (cy[ia] + pB0y)
            # faceA candidate
            lkx, lky = p_lps_ref[p, k, 0], p_lps_ref[p, k, 1]
            nf1x = ca_ * lnx - sa_ * lny
            nf1y = sa_ * lnx + ca_ * lny
            pl1x = cx[ia] + ca_ * lppx - sa_ * lppy
            pl1y = cy[ia] + sa_ * lppx + ca_ * lppy
            cl1x = cx[ib] + cb_ * lkx - sb_ * lky
            cl1y = cy[ib] + sb_ * lkx + cb_ * lky
            sep1 = (cl1x - pl1x) * nf1x + (cl1y - pl1y) * nf1y - rad
            # faceB candidate
            nf2x = cb_ * lnx - sb_ * lny
            nf2y = sb_ * lnx + cb_ * lny
            pl2x = cx[ib] + cb_ * lppx - sb_ * lppy
            pl2y = cy[ib] + sb_ * lppx + cb_ * lppy
            cl2x = cx[ia] + ca_ * lkx - sa_ * lky
            cl2y = cy[ia] + sa_ * lkx + ca_ * lky
            sep2 = (cl2x - pl2x) * nf2x + (cl2y - pl2y) * nf2y - rad
            mt0 = mt < 0.5
            mt1 = (mt > 0.5) & (mt < 1.5)
            nx = jnp.where(mt0, n0x, jnp.where(mt1, nf1x, -nf2x))
            ny = jnp.where(mt0, n0y, jnp.where(mt1, nf1y, -nf2y))
            ptx = jnp.where(mt0, pt0x, jnp.where(mt1, cl1x, cl2x))
            pty = jnp.where(mt0, pt0y, jnp.where(mt1, cl1y, cl2y))
            sep = jnp.where(mt0, sep0, jnp.where(mt1, sep1, sep2))
            minsep = jnp.minimum(
                minsep, jnp.where(p_tch_ref[p, k] > 0.5, sep, 0.0))
            C = jnp.clip(BAUMGARTE * (sep + LINEAR_SLOP),
                         -MAX_LINEAR_CORRECTION, 0.0)
            rAx, rAy = ptx - cx[ia], pty - cy[ia]
            rBx, rBy = ptx - cx[ib], pty - cy[ib]
            crA = rAx * ny - rAy * nx
            crB = rBx * ny - rBy * nx
            kn = imA + imB + iiA * crA * crA + iiB * crB * crB
            imp = jnp.where(p_tch_ref[p, k] > 0.5,
                            -C / jnp.maximum(kn, 1e-12), 0.0)
            px, py = imp * nx, imp * ny
            cx[ia] = cx[ia] - imA * px
            cy[ia] = cy[ia] - imA * py
            cx[ib] = cx[ib] + imB * px
            cy[ib] = cy[ib] + imB * py
            aa[ia] = aa[ia] - iiA * (rAx * py - rAy * px)
            aa[ib] = aa[ib] + iiB * (rBx * py - rBy * px)
        # joints: limit correction then point correction
        for j, pa, ch, is_equal, _torque in joints:
          lo, hi = jlims[j]
          iA, iB = j_iA_ref[j], j_iB_ref[j]
          mA, mB = j_mA_ref[j], j_mB_ref[j]
          state = j_state_ref[j]
          ang = aa[ch] - aa[pa] - j_ref_ref[j]
          c_eq = jnp.clip(ang - lo, -MAX_ACORR, MAX_ACORR)
          c_lo = jnp.clip(ang - lo + ANG_SLOP, -MAX_ACORR, 0.0)
          c_hi = jnp.clip(ang - hi - ANG_SLOP, 0.0, MAX_ACORR)
          C = jnp.where(state == 3, c_eq,
                        jnp.where(state == 1, c_lo,
                                  jnp.where(state == 2, c_hi, 0.0)))
          ang_err = jnp.where(state == 3, jnp.abs(c_eq),
                              jnp.where(state == 1, lo - ang,
                                        jnp.where(state == 2, ang - hi, 0.0)))
          d = -j_axm_ref[j] * C
          aa[pa] = aa[pa] - iA * d
          aa[ch] = aa[ch] + iB * d
          ca_, sa_ = jnp.cos(aa[pa]), jnp.sin(aa[pa])
          cb_, sb_ = jnp.cos(aa[ch]), jnp.sin(aa[ch])
          ax_, ay_ = j_anca_ref[j, 0], j_anca_ref[j, 1]
          bx_, by_ = j_ancb_ref[j, 0], j_ancb_ref[j, 1]
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
        return (tuple(cx), tuple(cy), tuple(aa), done | okay)

      cx, cy, aa, _ = jax.lax.fori_loop(
          0, pos_iters, pos_body,
          (cx0, cy0, aa0, jnp.zeros_like(cx0[0], jnp.bool_)))
      for i in range(n):
        c_out[i, 0] = cx[i]
        c_out[i, 1] = cy[i]
        a_out[i] = aa[i]

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


def make_substep_solver(spec: WorldSpec, interpret: bool = False):
  """Returns substep_solver(states, bundle, aux) for step_world_batch: one
  fused Pallas kernel covering velocity iterations + position integration +
  NGS position iterations. Narrowphase/presolve and sleep/writeback stay in
  XLA (cheap, fully parallel)."""
  kernel = _make_kernel(spec, with_position=True)
  j_pa = np.asarray(spec.j_parent)
  j_ch = np.asarray(spec.j_child)

  def solver(states, b: SolveBundle, aux):
    B = b.v.shape[0]
    pad = (-B) % BLOCK
    Bp = B + pad
    wallm, pairm, lc = aux.wallm, aux.pairm, aux.lc
    # joint anchors relative to each body's (per-episode) center of mass
    anc_a = spec.j_anchor_a[None] - lc[:, j_pa]                   # (B, J, 2)
    anc_b = spec.j_anchor_b[None] - lc[:, j_ch]
    extras = [states.c, states.a, wallm.lps, wallm.rad_sub, wallm.touch,
              pairm.lps, pairm.ln, pairm.lpp, pairm.rad_sub,
              pairm.mtype, pairm.touch, states.j_ref, anc_a, anc_b]

    def prep(x):
      if x.dtype == jnp.bool_:
        x = x.astype(jnp.float32)  # Mosaic tiles want numeric dtypes
      elif x.dtype in (jnp.int32, jnp.int64) and x is not None:
        x = x.astype(jnp.float32)  # mtype: compared with thresholds in-kernel
      if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad, *x.shape[1:]), x.dtype)], axis=0)
      return _to_kernel_layout(x, Bp)

    def prep_bundle(x):
      if x.dtype == jnp.bool_:
        x = x.astype(jnp.float32)
      if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad, *x.shape[1:]), x.dtype)], axis=0)
      return _to_kernel_layout(x, Bp)

    ins = [prep_bundle(getattr(b, f)) for f in _IN_FIELDS] \
        + [prep(x) for x in extras]
    grid = (Bp // BLOCK,)

    def spec_for(x):
      s = x.shape[:-2]
      block = (*s, SUB, LANE)
      return pl.BlockSpec(
          block,
          functools.partial(lambda g, nlead: (0,) * nlead + (g, 0),
                            nlead=len(s)),
          memory_space=pltpu.VMEM)

    def shape_of(name):
      i = _IN_FIELDS.index(name)
      return jax.ShapeDtypeStruct(ins[i].shape, ins[i].dtype)

    out_shapes = [shape_of(f) for f in _OUT_FIELDS] + [
        jax.ShapeDtypeStruct(ins[len(_IN_FIELDS)].shape, jnp.float32),  # c
        jax.ShapeDtypeStruct(ins[len(_IN_FIELDS) + 1].shape, jnp.float32),  # a
    ]
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
    c = _from_kernel_layout(outs[-2], Bp)[:B]
    a = _from_kernel_layout(outs[-1], Bp)[:B]
    return b._replace(**updates), c, a

  return solver

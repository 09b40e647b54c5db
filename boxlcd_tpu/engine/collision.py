"""Narrowphase contact-manifold generation (pure JAX, per-world).

Produces Box2D-equivalent manifolds for the shape pairs the worlds contain:
circle-circle, polygon-circle, polygon-polygon (SAT + incident-edge clipping),
and body-vs-wall half-planes. Each manifold stores both world-space data for
the velocity solver and body-local data so the NGS position solver can
recompute separations as poses change (the same split Box2D uses between
b2ContactSolver and b2PositionSolverManifold).

Bodies whose shape is chosen per-episode ('random' objects,
reference: boxLCD/world_env.py:273-274) carry an `is_circle` flag in dynamic
state; every routine here computes the circle and polygon variants and
selects, keeping all shapes static.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from boxlcd_tpu.engine.geom import MAX_VERTS

# Box2D tuning constants (b2Settings.h)
POLY_RADIUS = 0.01          # polygon/edge "skin" radius (2 * linearSlop)
LINEAR_SLOP = 0.005
BIG = 1e9


class Geom(NamedTuple):
  """World-space geometry of all bodies, recomputed each substep."""
  c: jnp.ndarray          # (N, 2) center of mass
  rot: jnp.ndarray        # (N, 2, 2)
  is_circle: jnp.ndarray  # (N,) bool
  radius: jnp.ndarray     # (N,)
  wverts: jnp.ndarray     # (N, V, 2) world polygon vertices (about com)
  wnormals: jnp.ndarray   # (N, V, 2)
  vmask: jnp.ndarray      # (N, V) vertex-valid mask


def rot_mat(angle):
  c, s = jnp.cos(angle), jnp.sin(angle)
  return jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)


def make_geom(spec, is_circle, c, angle) -> Geom:
  rot = rot_mat(angle)                                     # (N, 2, 2)
  verts_com = spec.verts - spec.local_center[:, 1][:, None, :]
  wverts = c[:, None, :] + jnp.einsum('nij,nvj->nvi', rot, verts_com)
  wnormals = jnp.einsum('nij,nvj->nvi', rot, spec.normals)
  vmask = jnp.arange(MAX_VERTS)[None, :] < spec.nverts[:, None]
  return Geom(c=c, rot=rot, is_circle=is_circle, radius=jnp.asarray(spec.radius),
              wverts=wverts, wnormals=wnormals, vmask=vmask)


class Manifold(NamedTuple):
  """Up to 2 contact points between one body pair (world + local form)."""
  normal: jnp.ndarray   # (2,) world, points from A to B
  points: jnp.ndarray   # (2, 2) world contact points
  sep: jnp.ndarray      # (2,) separations (negative = penetrating)
  touch: jnp.ndarray    # (2,) bool
  ids: jnp.ndarray      # (2,) int32 feature ids for warm-start matching
  mtype: jnp.ndarray    # () int32: 0=circles, 1=faceA, 2=faceB
  ln: jnp.ndarray       # (2,) local normal (in face-owner com frame)
  lpp: jnp.ndarray      # (2,) local plane point (face-owner frame)
  lps: jnp.ndarray      # (2, 2) local clip points (other body's com frame)
  rad_sub: jnp.ndarray  # () radius term subtracted when recomputing separation


def _empty_manifold():
  z2 = jnp.zeros(2)
  return Manifold(normal=jnp.array([0.0, 1.0]), points=jnp.zeros((2, 2)),
                  sep=jnp.full(2, BIG), touch=jnp.zeros(2, bool),
                  ids=jnp.zeros(2, jnp.int32), mtype=jnp.int32(0),
                  ln=z2, lpp=z2, lps=jnp.zeros((2, 2)), rad_sub=jnp.float32(0))


# -- circle-circle -------------------------------------------------------------

def _collide_circles(cA, rA, cB, rB):
  d = cB - cA
  dist = jnp.linalg.norm(d)
  n = jnp.where(dist > 1e-9, d / jnp.maximum(dist, 1e-9), jnp.array([0.0, 1.0]))
  sep = dist - rA - rB
  touching = sep <= 0.0
  point = 0.5 * ((cA + rA * n) + (cB - rB * n))
  m = _empty_manifold()
  return m._replace(
      normal=n, points=jnp.stack([point, point]),
      sep=jnp.stack([sep, BIG]),
      touch=jnp.stack([touching, jnp.zeros((), bool)]),
      mtype=jnp.int32(0), lps=jnp.zeros((2, 2)), rad_sub=rA + rB)


# -- polygon (A) vs circle (B) --------------------------------------------------

def _collide_poly_circle(gA_wverts, gA_wnormals, gA_vmask, cA, rotA,
                         cB, rB):
  """Face-A manifold with a single point (b2CollidePolygonAndCircle)."""
  # separation of circle center from each face
  seps = jnp.einsum('vd,vd->v', gA_wnormals, cB[None] - gA_wverts)
  seps = jnp.where(gA_vmask, seps, -BIG)
  best = jnp.argmax(seps)
  max_sep = seps[best]
  nv = gA_vmask.sum()
  nxt = jnp.where(best + 1 < nv, best + 1, 0)
  v1 = gA_wverts[best]
  v2 = gA_wverts[nxt]
  # vertex-region handling
  u1 = jnp.dot(cB - v1, v2 - v1)
  u2 = jnp.dot(cB - v2, v1 - v2)
  face_n = gA_wnormals[best]

  def _norm(d):
    l = jnp.linalg.norm(d)
    return jnp.where(l > 1e-9, d / jnp.maximum(l, 1e-9), face_n), l

  n_v1, d1 = _norm(cB - v1)
  n_v2, d2 = _norm(cB - v2)
  inside = max_sep < 1e-9
  use_v1 = (~inside) & (u1 <= 0.0)
  use_v2 = (~inside) & (u2 <= 0.0) & (~use_v1)
  n = jnp.where(use_v1, n_v1, jnp.where(use_v2, n_v2, face_n))
  plane_pt = jnp.where(use_v1, v1, jnp.where(use_v2, v2, 0.5 * (v1 + v2)))
  sep_raw = jnp.where(use_v1, d1, jnp.where(use_v2, d2,
                                            jnp.dot(cB - plane_pt, face_n)))
  sep = sep_raw - rB - POLY_RADIUS
  touching = sep <= 0.0
  # world contact point: midpoint of surface points
  cAp = cB - sep_raw * n
  cBp = cB - rB * n
  point = 0.5 * (cAp + cBp)
  m = _empty_manifold()
  return m._replace(
      normal=n, points=jnp.stack([point, point]),
      sep=jnp.stack([sep, BIG]),
      touch=jnp.stack([touching, jnp.zeros((), bool)]),
      mtype=jnp.int32(1),
      ln=rotA.T @ n, lpp=rotA.T @ (plane_pt - cA),
      lps=jnp.zeros((2, 2)),  # circle center is B's com
      rad_sub=rB + POLY_RADIUS)


# -- polygon vs polygon ----------------------------------------------------------

def _max_separation(wvA, wnA, vmA, wvB, vmB):
  """Max over A's faces of min over B's verts of face-plane separation."""
  d = jnp.einsum('kd,vd->kv', wnA, wvB) - jnp.einsum('kd,kd->k', wnA, wvA)[:, None]
  d = jnp.where(vmB[None, :], d, BIG)
  face_sep = d.min(axis=1)
  face_sep = jnp.where(vmA, face_sep, -BIG)
  best = jnp.argmax(face_sep)
  return face_sep[best], best


def _clip_segment(p1, p2, id1, id2, n, offset):
  """b2ClipSegmentToLine: keep the sub-segment with dot(n, p) - offset <= 0."""
  d1 = jnp.dot(n, p1) - offset
  d2 = jnp.dot(n, p2) - offset
  t = d1 / jnp.where(jnp.abs(d1 - d2) > 1e-12, d1 - d2, 1e-12)
  pm = p1 + t * (p2 - p1)
  q1 = jnp.where(d1 <= 0, p1, pm)
  i1 = jnp.where(d1 <= 0, id1, id2 + 16)
  q2 = jnp.where(d2 <= 0, p2, pm)
  i2 = jnp.where(d2 <= 0, id2, id1 + 16)
  valid = jnp.minimum(d1, d2) <= 0
  return q1, q2, i1, i2, valid


def _clip_face(wv_ref, wn_ref, vm_ref, ref_face, c_ref, rot_ref,
               wv_inc, wn_inc, vm_inc, c_inc, rot_inc, flip):
  """Clip the incident face of `inc` against reference face `ref_face`."""
  nv_ref = vm_ref.sum()
  nv_inc = vm_inc.sum()
  i2 = (ref_face + 1) % MAX_VERTS
  i2 = jnp.where(i2 < nv_ref, i2, 0)
  v1 = wv_ref[ref_face]
  v2 = wv_ref[i2]
  ref_n = wn_ref[ref_face]
  # incident face: most anti-parallel
  dots = jnp.einsum('vd,d->v', wn_inc, ref_n)
  dots = jnp.where(vm_inc, dots, BIG)
  inc_face = jnp.argmin(dots)
  j2 = (inc_face + 1) % MAX_VERTS
  j2 = jnp.where(j2 < nv_inc, j2, 0)
  p1, p2 = wv_inc[inc_face], wv_inc[j2]
  id1, id2 = inc_face.astype(jnp.int32), j2.astype(jnp.int32)
  tangent = (v2 - v1)
  tangent = tangent / jnp.maximum(jnp.linalg.norm(tangent), 1e-9)
  # clip to both side planes of the reference edge
  q1, q2, id1, id2, ok1 = _clip_segment(p1, p2, id1, id2, -tangent,
                                        -jnp.dot(tangent, v1))
  q1, q2, id1, id2, ok2 = _clip_segment(q1, q2, id1, id2, tangent,
                                        jnp.dot(tangent, v2))
  ok = ok1 & ok2
  total_r = 2 * POLY_RADIUS
  sep1 = jnp.dot(ref_n, q1 - v1) - total_r
  sep2 = jnp.dot(ref_n, q2 - v1) - total_r
  touch = jnp.stack([ok & (sep1 <= 0), ok & (sep2 <= 0)])
  pts = jnp.stack([q1 - 0.5 * (sep1 + total_r) * ref_n,
                   q2 - 0.5 * (sep2 + total_r) * ref_n])
  m = _empty_manifold()
  return m._replace(
      normal=jnp.where(flip, -ref_n, ref_n),
      points=pts, sep=jnp.stack([sep1, sep2]), touch=touch,
      ids=jnp.stack([id1, id2]) + jnp.where(flip, 64, 0).astype(jnp.int32),
      mtype=jnp.where(flip, jnp.int32(2), jnp.int32(1)),
      ln=rot_ref.T @ ref_n, lpp=rot_ref.T @ (0.5 * (v1 + v2) - c_ref),
      lps=jnp.stack([rot_inc.T @ (q1 - c_inc), rot_inc.T @ (q2 - c_inc)]),
      rad_sub=jnp.float32(total_r))


def _collide_polys(wvA, wnA, vmA, cA, rotA, wvB, wnB, vmB, cB, rotB):
  sepA, faceA = _max_separation(wvA, wnA, vmA, wvB, vmB)
  sepB, faceB = _max_separation(wvB, wnB, vmB, wvA, vmA)
  total_r = 2 * POLY_RADIUS
  no_contact = (sepA > total_r) | (sepB > total_r)
  use_b = sepB > sepA + 0.1 * LINEAR_SLOP
  mA = _clip_face(wvA, wnA, vmA, faceA, cA, rotA, wvB, wnB, vmB, cB, rotB,
                  flip=jnp.zeros((), bool))
  mB = _clip_face(wvB, wnB, vmB, faceB, cB, rotB, wvA, wnA, vmA, cA, rotA,
                  flip=jnp.ones((), bool))
  m = jax.tree_util.tree_map(lambda a, b: jnp.where(use_b, b, a), mA, mB)
  return m._replace(touch=m.touch & ~no_contact)


# -- unified pair dispatch --------------------------------------------------------

def collide_pair(geom: Geom, a: jnp.ndarray, b: jnp.ndarray) -> Manifold:
  """Manifold for body pair (a, b), dispatching on dynamic is_circle flags."""
  cA, cB = geom.c[a], geom.c[b]
  rA, rB = geom.radius[a], geom.radius[b]
  rotA, rotB = geom.rot[a], geom.rot[b]
  wvA, wnA, vmA = geom.wverts[a], geom.wnormals[a], geom.vmask[a]
  wvB, wnB, vmB = geom.wverts[b], geom.wnormals[b], geom.vmask[b]

  m_cc = _collide_circles(cA, rA, cB, rB)
  m_pc = _collide_poly_circle(wvA, wnA, vmA, cA, rotA, cB, rB)   # A poly, B circle
  m_cp_raw = _collide_poly_circle(wvB, wnB, vmB, cB, rotB, cA, rA)  # B poly, A circle
  # flip cp so normal points A->B and face owner is marked as B (faceB)
  m_cp = m_cp_raw._replace(normal=-m_cp_raw.normal, mtype=jnp.int32(2))
  m_pp = _collide_polys(wvA, wnA, vmA, cA, rotA, wvB, wnB, vmB, cB, rotB)

  ia, ib = geom.is_circle[a], geom.is_circle[b]

  def sel(field):
    f_cc, f_pc, f_cp, f_pp = (getattr(m, field) for m in (m_cc, m_pc, m_cp, m_pp))
    fb = jnp.where(ib, f_cc, f_cp)      # A circle: B circle -> cc else cp
    fa = jnp.where(ib, f_pc, f_pp)      # A poly:   B circle -> pc else pp
    return jnp.where(ia, fb, fa)

  return Manifold(**{f: sel(f) for f in Manifold._fields})


# -- wall (half-plane) contacts -----------------------------------------------------

class WallManifold(NamedTuple):
  points: jnp.ndarray   # (2, 2) world
  sep: jnp.ndarray      # (2,)
  touch: jnp.ndarray    # (2,) bool
  ids: jnp.ndarray      # (2,) int32
  lps: jnp.ndarray      # (2, 2) local anchor in body com frame
  rad_sub: jnp.ndarray  # ()


def collide_wall(geom: Geom, body: jnp.ndarray, wn: jnp.ndarray,
                 woff: jnp.ndarray) -> WallManifold:
  """Contact of body against inward half-plane sep(p) = wn.p - woff.

  Walls are Box2D edge chains in the reference (boxLCD/world_env.py:309-316);
  since they bound the arena, half-planes are equivalent for interior bodies.
  """
  c = geom.c[body]
  r = geom.radius[body]
  wv, vm = geom.wverts[body], geom.vmask[body]
  rot = geom.rot[body]

  # circle variant: single point
  sep_c = jnp.dot(wn, c) - woff - r - POLY_RADIUS
  pt_c = c - r * wn
  # polygon variant: two deepest vertices
  seps = jnp.einsum('vd,d->v', wv, wn) - woff - 2 * POLY_RADIUS
  seps = jnp.where(vm, seps, BIG)
  order = jnp.argsort(seps)
  i1, i2 = order[0], order[1]
  is_c = geom.is_circle[body]

  sep = jnp.where(is_c, jnp.stack([sep_c, BIG]), jnp.stack([seps[i1], seps[i2]]))
  pts = jnp.where(is_c, jnp.stack([pt_c, pt_c]), jnp.stack([wv[i1], wv[i2]]))
  ids = jnp.where(is_c, jnp.zeros(2, jnp.int32),
                  jnp.stack([i1, i2]).astype(jnp.int32))
  touch = sep <= 0.0
  # local anchors for the position solver: polygon vertices rotate with the
  # body; a circle's correction always acts through its center (zero anchor)
  lps_poly = jnp.einsum('ij,kj->ki', rot.T, pts - c[None])
  lps = jnp.where(is_c, jnp.zeros_like(lps_poly), lps_poly)
  rad_sub = jnp.where(is_c, r + POLY_RADIUS, 2 * POLY_RADIUS)
  return WallManifold(points=pts, sep=sep, touch=touch, ids=ids, lps=lps,
                      rad_sub=rad_sub)

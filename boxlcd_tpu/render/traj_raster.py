"""Trajectory-raster Pallas kernel: exact LCD frames for a whole (T, B)
megakernel rollout in ONE program launch, consuming the rollout's tile
layout directly.

Why: the bench/datagen obs pass was measured at ~37.5 ms per 50-step x 4096
-world chunk while the scanline raster kernel itself accounts for only ~2 ms
— the rest is XLA glue around it (per-body `.at[].set` vertex packing,
lane-axis transposes of every input, table gathers for circles, and the
separate dispatch). This kernel removes the glue:

- inputs are the megakernel's own (T, n, 3, B/128, 128) pose tiles
  (engine/mega.py `tr`), so there is NO transpose between physics and
  raster;
- the PIL-exact float32 vertex transform (raster._poly_verts_px op order)
  runs in-kernel on (8, 128) world tiles;
- circle fills use the SAME tabulated PIL ellipse row masks as
  raster._circle_fill, but the table gather becomes a static select tree
  over the (at most 3x3) reachable integer-bbox sizes for each body's fixed
  radius — Mosaic has no per-lane vector gather;
- the polygon scanline calls the SAME raster._poly_fill the XLA/CPU path
  uses (shape-polymorphic; rows broadcast as (H, 1, 1) against (8, 128)
  world tiles), so PIL bit-exactness (tests/test_raster.py) is preserved by
  construction.

Output is (T, H, B/128, 128) uint32 row bitmasks already in IMAGE row order
with bits inverted in-kernel (background=1, matching the obs contract —
reference: boxLCD/world_env.py:506-509). `rows_to_lcd` is then just the bit
unpack; the y-flip is a constant row remap inside the kernel because a
runtime sublane reverse fused with the unpack miscompiles at large batch
(round-3 silent-corruption post-mortem in PROGRESS.md).

cos/sin of body angles are computed OUTSIDE the kernel (XLA elementwise) so
they are bit-identical to the jnp render path, which feeds the same
jnp.cos/sin into the vertex transform.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from boxlcd_tpu.engine.spec import CIRCLE, POLY, RANDOM, WorldSpec
from boxlcd_tpu.render import raster
from boxlcd_tpu.render.raster import _f32, _muladd

SUB, LANE = 8, 128
BLOCK = SUB * LANE

_CACHE = {}


def supports(spec: WorldSpec) -> bool:
  """All shapes incl. per-episode RANDOM (is_circle enters as tiles)."""
  return all(int(s) in (CIRCLE, POLY, RANDOM) for s in spec.shape_static)


def make_traj_render(spec: WorldSpec, width: int, height: int, T: int,
                     interpret: bool = False):
  key = (id(spec), width, height, T, interpret)
  if key not in _CACHE:
    _CACHE[key] = _build(spec, width, height, T, interpret)
  return _CACHE[key]


def _circle_combos(spec, b, s, dmax):
  """Reachable (ih, iw) integer bbox sizes for body b's fixed radius.

  raster._circle_bbox computes ih = clip(trunc(y1) - trunc(y0), 0, dmax)
  with y1 - y0 = 2*r*s up to two float32 roundings, so the value lands in
  {floor(2rs)-1 .. floor(2rs)+1}; the fuzz equality tests
  (tests/test_traj_raster.py) guard the enumeration."""
  k = int(np.floor(2.0 * float(spec.radius[b]) * s))
  lo, hi = max(0, k - 1), min(dmax, k + 1)
  return list(range(lo, hi + 1))


def _circle_fill_static(tblbits_np, cx, cy, r, s, combos, rows, height,
                        width):
  """raster._circle_fill with the (ih, iw) table gather replaced by a
  static select tree. cx/cy: (8, 128) f32; rows: (H, 1, 1) int32 iota.
  Returns (H, 8, 128) uint32 row masks (same values as _circle_fill)."""
  dmax = tblbits_np.shape[0] - 1
  r = np.float32(r)
  s = np.float32(s)
  x0 = (cx - r) * s
  y0 = (cy - r) * s
  x1 = (cx + r) * s
  y1 = (cy + r) * s
  ix0 = jnp.trunc(x0).astype(jnp.int32)
  iy0 = jnp.trunc(y0).astype(jnp.int32)
  iw = jnp.clip(jnp.trunc(x1).astype(jnp.int32) - ix0, 0, dmax)
  ih = jnp.clip(jnp.trunc(y1).astype(jnp.int32) - iy0, 0, dmax)
  di = rows - iy0                                       # (H, 8, 128)
  ok = (di >= 0) & (di <= ih)
  rowbits = jnp.zeros(di.shape, jnp.uint32)
  for IH in combos:
    hit_h = ih == IH                                    # (8, 128)
    for IW in combos:
      hit = hit_h & (iw == IW)
      acc = jnp.zeros(di.shape, jnp.uint32)
      nonzero = False
      for DI in range(IH + 1):
        bits = int(tblbits_np[IH, IW, DI])
        if bits == 0:
          continue
        nonzero = True
        acc = jnp.where(di == DI, jnp.uint32(bits), acc)
      if nonzero:
        rowbits = jnp.where(hit, acc, rowbits)
  # shift the mask (bit j = column ix0+j) into image columns
  ls = jnp.clip(ix0, 0, 31).astype(jnp.uint32)
  rs = jnp.clip(-ix0, 0, 31).astype(jnp.uint32)
  shifted = jnp.where(ix0 >= 0,
                      jnp.where(ix0 < 32, rowbits << ls, jnp.uint32(0)),
                      jnp.where(-ix0 < 32, rowbits >> rs, jnp.uint32(0)))
  full = jnp.uint32(0xFFFFFFFF if width >= 32 else (1 << width) - 1)
  return jnp.where(ok, shifted & full, jnp.uint32(0))


def _build(spec: WorldSpec, width: int, height: int, T: int,
           interpret: bool):
  assert supports(spec), 'traj raster: unsupported spec'
  _, tblbits = raster._tables(spec, width, height)
  assert tblbits is not None and width <= 32, \
      'traj raster requires the uint32 row-bitmask layout (W <= 32)'
  tblbits_np = np.asarray(tblbits)
  dmax = tblbits_np.shape[0] - 1
  n = spec.n
  H = height
  s = float(width / spec.width)
  s32 = np.float32(s)
  # RANDOM bodies render BOTH variants and select per world by is_circle
  # (mirrors raster._body_fills' jnp.where dispatch)
  poly = [b for b in range(n) if int(spec.shape_static[b]) != CIRCLE]
  circ = [b for b in range(n) if int(spec.shape_static[b]) != POLY]
  rand = [b for b in range(n) if int(spec.shape_static[b]) == RANDOM]
  nv_list = {b: int(spec.nverts[b]) for b in poly}
  dv = {b: np.asarray(spec.draw_verts[b, :nv_list[b]], np.float32)
        for b in poly}
  lc = {b: (np.float32(spec.local_center[b, 1, 0]),
            np.float32(spec.local_center[b, 1, 1])) for b in poly}
  radius = {b: float(spec.radius[b]) for b in circ}
  combos = {b: _circle_combos(spec, b, s, dmax) for b in circ}

  full = np.uint32(0xFFFFFFFF if width >= 32 else (1 << width) - 1)

  def make_kernel(sub):
    def kernel(cx_ref, cy_ref, ca_ref, sa_ref, *rest):
      if rand:
        isc_ref, out_ref = rest
      else:
        (out_ref,) = rest
      # flipped row space + in-kernel invert, same rationale as
      # pallas_raster.kernel: a runtime [::-1] sublane reverse fused with the
      # bit unpack miscompiles at large batch on the real chip (round-3)
      rows = (jnp.int32(H - 1)
              - jax.lax.broadcasted_iota(jnp.int32, (H, 1, 1), 0))

      # one step per grid iteration (T is a grid axis, not an in-kernel
      # loop: whole-(T, ...) VMEM blocks capped T at ~50 under the 16M
      # scoped limit; per-t blocks stream through double-buffered DMA)
      mask = jnp.zeros((H, sub, LANE), jnp.uint32)
      cfill = {}
      pfill = {}
      for b in circ:
        cfill[b] = _circle_fill_static(
            tblbits_np, cx_ref[0, b], cy_ref[0, b], radius[b], s32,
            combos[b], rows, H, width)
      for b in poly:
        ca, sa = ca_ref[0, b], sa_ref[0, b]
        cx, cy = cx_ref[0, b], cy_ref[0, b]
        lc0, lc1 = lc[b]
        # b2Mul float32 op order (raster._poly_verts_px, products rounded
        # before the adds) so truncated pixel vertices match bitwise
        ox = cx - _muladd(ca, lc0, -_f32(sa * lc1))
        oy = cy - _muladd(sa, lc0, _f32(ca * lc1))
        ivx, ivy = [], []
        for v in range(nv_list[b]):
          dvx, dvy = np.float32(dv[b][v, 0]), np.float32(dv[b][v, 1])
          wx = _f32(_muladd(ca, dvx, -_f32(sa * dvy))) + ox
          wy = _f32(_muladd(sa, dvx, _f32(ca * dvy))) + oy
          ivx.append(jnp.trunc(wx * s32).astype(jnp.int32))
          ivy.append(jnp.trunc(wy * s32).astype(jnp.int32))
        pfill[b] = raster._poly_fill(ivx, ivy, nv_list[b], H, width,
                                     rows=rows)
      for b in range(n):
        if b in cfill and b in pfill:     # RANDOM: select per world
          isc = isc_ref[b] > 0.5         # (sub, LANE)
          fill = jnp.where(isc[None], cfill[b], pfill[b])
        else:
          fill = cfill.get(b, pfill.get(b))
        mask = mask | fill
      out_ref[0] = mask ^ full
    return kernel

  def render_rows(tr, isc=None):
    """tr: (T, n, >=3, B/128, 128) f32 megakernel pose tiles ->
    (T, H, B/128, 128) uint32 PIL-order row bitmasks. isc: (B, n) bool
    per-episode shape flags, required when the spec has RANDOM bodies."""
    Tt, nn, six, G, L = tr.shape
    assert (Tt, nn, L) == (T, n, LANE) and six >= 3, (tr.shape, T, n)
    cx, cy, ang = tr[:, :, 0], tr[:, :, 1], tr[:, :, 2]   # (T, n, G, L)
    # XLA-side trig: bit-identical inputs to the jnp render path
    ca, sa = jnp.cos(ang), jnp.sin(ang)

    # tallest tile that divides the world rows: per-grid-step overhead is
    # ~1 us, so at (8, 128) tiles a T=100 x 32-row call pays 3200 of them
    # (~4 ms) while one 32-row block per step pays 100
    sub = next(s for s in (32, 16, 8, 4, 2, 1) if G % s == 0)
    blk = lambda: pl.BlockSpec((1, n, sub, LANE), lambda g, t: (t, 0, g, 0),
                               memory_space=pltpu.VMEM)
    in_specs = [blk(), blk(), blk(), blk()]
    ins = [cx, cy, ca, sa]
    if rand:
      assert isc is not None, 'traj raster: RANDOM shapes need is_circle'
      # (B, n) -> (n, G, L) f32 tiles, constant over T
      isct = jnp.moveaxis(isc.astype(jnp.float32), 0, -1).reshape(n, G, L)
      in_specs.append(pl.BlockSpec((n, sub, LANE), lambda g, t: (0, g, 0),
                                   memory_space=pltpu.VMEM))
      ins.append(isct)
    out = pl.pallas_call(
        make_kernel(sub),
        grid=(G // sub, T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, H, sub, LANE), lambda g, t: (t, 0, g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, H, G, LANE), jnp.uint32),
        interpret=interpret,
    )(*ins)
    return out

  return render_rows


def rows_to_lcd(rows, width: int):
  """(T, H, G, 128) uint32 row masks -> (T, B, H, W) bool obs frames.

  The kernel already emits rows in image order with bits inverted
  (background True — boxLCD/world_env.py:506-509), so this is just the bit
  unpack: no runtime y-reverse and no bool NOT (that composition
  miscompiles at large batch on the real chip — round-3 notes)."""
  T, H, G, L = rows.shape
  r = jnp.moveaxis(rows.reshape(T, H, G * L), -1, 1)      # (T, B, H)
  bits = jnp.arange(width, dtype=jnp.uint32)
  return ((r[..., None] >> bits) & jnp.uint32(1)).astype(bool)

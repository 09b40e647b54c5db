"""On-device binarized LCD rasterizer, pixel-exact vs the reference's PIL path.

The reference renders by PIL ImageDraw (reference: boxLCD/world_env.py:460-512):
polygons via `draw.polygon(trans * verts, fill=0)`, circles via
`draw.ellipse(bbox, fill=0)`, background 1, then a vertical flip. This module
reproduces that output bit-for-bit on device:

  * Polygons: Pillow truncates vertices to ints (C `(int)` cast in
    `_imaging.c:draw_polygon`) and scanline-fills with `polygon_generic`
    (libImaging/Draw.c). The full algorithm — per-row edge intersections in
    float32, endpoint doubling, the corner-connection fix-up, qsort + pair
    fill with floor(x+0.5)/round-half-toward-zero span ends, plus direct
    hlines for horizontal edges — is replicated here in fixed-shape JAX,
    validated against Pillow 12.1 disassembly and fuzzed to 100% agreement
    (tests/test_raster.py).
  * Circles: Pillow truncates the ellipse bbox to ints, after which the
    rasterized mask depends only on the integer bbox size (translation
    invariant, verified). Masks for every reachable (iW, iH) are tabulated
    host-side with real PIL at spec-compile time and gathered on device.

Conventions matched to the reference:
  - world-to-pixel scale uses the world WIDTH for both axes
    (world_env.py:495-498: `pos / self.WIDTH * width`)
  - the image is y-flipped (world_env.py:506), so row 0 is the top
  - output is bool with background=True and bodies=False
    (world_env.py:471-477: background fill 1, shapes fill 0)
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from boxlcd_tpu.engine import collision
from boxlcd_tpu.engine.spec import WorldSpec, CIRCLE, POLY

# numpy scalars (not jnp: jax arrays would be captured consts in the Pallas
# raster kernel, which calls into this module's fill code)
_INF = np.float32(np.inf)
_U0 = np.uint32(0)
_U1 = np.uint32(1)


def _f32(t):
  """Force `t` to materialize as a rounded float32 value.

  Pillow's C compiles to separate mulss/addss; XLA (even across
  optimization_barrier, via LLVM fp-contract) would otherwise fuse a
  multiply into a following add as an FMA — a single rounding — and flip
  pixels at span boundaries. The no-op select blocks the contraction.
  """
  return jnp.where(jnp.isnan(t), np.float32(0), t)


def _muladd(a, b, c):
  """a*b + c with the product rounded to float32 before the add."""
  return _f32(a * b) + c


# -- host-side ellipse mask tables ---------------------------------------------

_TABLE_CACHE = {}


def _ellipse_mask_table(dmax: int) -> np.ndarray:
  """(dmax+1, dmax+1, dmax+2, dmax+2) bool: PIL ellipse masks per int bbox.

  Entry [iH, iW] is the pixel mask of `draw.ellipse([x0, y0, x0+iW, y0+iH],
  fill=...)` relative to (x0, y0); integer-translation invariance verified
  empirically. Falls back to a pixel-center disc test if PIL is unavailable
  (approximate; PIL is a host-side build dependency only).
  """
  D = dmax
  out = np.zeros((D + 1, D + 1, D + 2, D + 2), bool)
  try:
    from PIL import Image, ImageDraw
  except ImportError:
    yy, xx = np.mgrid[0:D + 2, 0:D + 2]
    for ih in range(D + 1):
      for iw in range(D + 1):
        cx, cy, a, b = iw / 2, ih / 2, max(iw / 2, .5), max(ih / 2, .5)
        out[ih, iw] = (((xx - cx) / a) ** 2 + ((yy - cy) / b) ** 2) <= 1.0
    return out
  pad = 3
  for ih in range(D + 1):
    for iw in range(D + 1):
      size = (iw + 2 * pad + 2, ih + 2 * pad + 2)
      im = Image.new('1', size)
      dr = ImageDraw.Draw(im)
      dr.rectangle([0, 0, size[0], size[1]], fill=1)
      dr.ellipse([pad, pad, pad + iw, pad + ih], fill=0, outline=None)
      arr = ~np.asarray(im).astype(np.float32).astype(bool)
      assert not arr[:pad].any() and not arr[pad + ih + 2:].any() \
          and not arr[:, :pad].any() and not arr[:, pad + iw + 2:].any(), \
          'PIL ellipse painted outside its bbox'
      out[ih, iw, :ih + 2, :iw + 2] = arr[pad:pad + ih + 2, pad:pad + iw + 2]
  return out


def _tables(spec: WorldSpec, width: int, height: int):
  """(bool mask table, uint32 row-bitmask table or None)."""
  key = (id(spec), width, height)
  if key not in _TABLE_CACHE:
    s = width / spec.width
    dmax = int(np.floor(2.0 * float(spec.radius.max()) * s)) + 1
    tbl = _ellipse_mask_table(dmax)
    bits = None
    if tbl.shape[-1] <= 32:
      weights = (1 << np.arange(tbl.shape[-1], dtype=np.uint64))
      bits = (tbl.astype(np.uint64) * weights).sum(-1).astype(np.uint32)
    _TABLE_CACHE[key] = (tbl, bits)
  return _TABLE_CACHE[key]


# -- float32 helpers matching Pillow's C arithmetic ------------------------------

def _roundf(x):
  """C roundf: round half away from zero (float32)."""
  a = jnp.abs(x)
  fl = jnp.floor(a)
  r = fl + (a - fl >= 0.5)
  return jnp.where(x < 0, -r, r)


def _x_start(f):
  """Span-start rounding from polygon_generic's hline call (disassembly)."""
  return jnp.where(f >= 0, jnp.floor(f + 0.5), -jnp.floor(-f + 0.5))


def _x_end(f):
  """Span-end rounding: round half toward zero."""
  return jnp.where(f >= 0, jnp.ceil(f - 0.5), -jnp.ceil(-f - 0.5))


# -- exact polygon scanline fill (one body, PIL pixel frame) ---------------------

def _unpack_bits(mask, width: int):
  """(H,) uint32 row bitmasks (bit j = column j) -> (H, W) bool."""
  return ((mask[:, None] >> jnp.arange(width, dtype=jnp.uint32)[None])
          & jnp.uint32(1)).astype(bool)


def _span_bits(a_f, b_f, valid, width: int):
  """(H,) uint32 with bits [a..b] set (clamped to [0, W)), where valid.

  a_f/b_f are the float span ends from _x_start/_x_end (integer-valued or
  +/-inf on padded slots, which `valid` excludes)."""
  a = jnp.clip(a_f, 0, width).astype(jnp.int32)
  b = jnp.clip(b_f, -1, width - 1).astype(jnp.int32) + 1   # half-open
  ok = valid & (a < b)
  lo = _bits_below(a, width)
  hi = _bits_below(b, width)
  return jnp.where(ok, hi & ~lo, _U0)


def _bits_below(k, width: int):
  """uint32 with bits [0, k) set; k in [0, W], W <= 32."""
  k = k.astype(jnp.int32)
  full = np.uint32(0xFFFFFFFF if width >= 32 else (1 << width) - 1)
  # clamp in int32 (Mosaic has no unsigned vector min), shift in uint32
  kc = jnp.minimum(k, np.int32(31)).astype(jnp.uint32)
  return jnp.where(k >= width, full, (_U1 << kc) - _U1)


def _sort_columns(cols):
  """Sort a static list of (H,) float columns ascending, elementwise.

  Odd-even transposition network: pure min/max compare-exchanges, fully
  vectorized on the VPU. XLA's sort primitive is dramatically slower on TPU
  for these tiny lanes (measured: it dominated the whole env step).
  """
  cols = list(cols)
  n = len(cols)
  for r in range(n):
    start = r % 2
    for i in range(start, n - 1, 2):
      lo = jnp.minimum(cols[i], cols[i + 1])
      hi = jnp.maximum(cols[i], cols[i + 1])
      cols[i], cols[i + 1] = lo, hi
  return cols


def _poly_cover(ivx, ivy, nv: int, height: int, width: int):
  """(H, W) bool coverage of the integer-vertex polygon, PIL rules."""
  out = _poly_fill(ivx, ivy, nv, height, width)
  return _unpack_bits(out, width) if out.dtype == jnp.uint32 else out


def _poly_fill(ivx, ivy, nv: int, height: int, width: int, rows=None):
  """(H,) uint32 row bitmasks (W<=32) or (H, W) bool, PIL fill rules.

  ivx/ivy: (nv,) traced int32 vertex coords (already truncated), or any
  [i]-indexable yielding values that broadcast against `rows` (the Pallas
  raster kernel passes lists of (1, LANE) lane vectors with rows (H, 1),
  making every op below an (H, LANE) VPU tile op). nv static. Mirrors
  libImaging/Draw.c polygon_generic + the horizontal-edge hlines of
  ImagingDrawPolygon.
  """
  if rows is None:
    rows = jnp.arange(height, dtype=jnp.int32)          # (H,)
  cols = jnp.arange(width, dtype=jnp.float32)           # (W,)
  ivx = [ivx[i] for i in range(nv)]
  ivy = [ivy[i] for i in range(nv)]
  S = 2 * nv + 2

  vymax = ivy[0]
  for i in range(1, nv):
    vymax = jnp.maximum(vymax, ivy[i])
  gymax = jnp.minimum(vymax, height)

  # static-unrolled edge table (non-horizontal edges keep polygon order)
  ex0, ey0, eymin, eymax, edx, ehoriz = [], [], [], [], [], []
  for i in range(nv):
    x0, y0 = ivx[i], ivy[i]
    x1, y1 = ivx[(i + 1) % nv], ivy[(i + 1) % nv]
    ymin = jnp.minimum(y0, y1)
    ymax = jnp.maximum(y0, y1)
    horiz = y0 == y1
    dx = jnp.where(horiz, 0.0,
                   (x1 - x0).astype(jnp.float32)
                   / jnp.where(horiz, 1, y1 - y0).astype(jnp.float32))
    x_at_ymin = jnp.where(y0 <= y1, x0, x1).astype(jnp.float32)
    ex0.append(x_at_ymin)
    ey0.append(ymin.astype(jnp.float32))
    eymin.append(ymin)
    eymax.append(ymax)
    edx.append(dx)
    ehoriz.append(horiz)

  def edge_x(k, y):
    return _muladd((y - eymin[k]).astype(jnp.float32), edx[k], ex0[k])

  xx = [jnp.full(rows.shape, _INF) for _ in range(S)]
  j = jnp.zeros(rows.shape, jnp.int32)

  def write(cols, pos, cond, val):
    return [jnp.where(cond & (pos == s), val, cols[s]) for s in range(S)]

  for i in range(nv):
    inr = (~ehoriz[i]) & (rows >= eymin[i]) & (rows <= eymax[i])   # (H,)
    cur_x = edge_x(i, rows)                                         # (H,)
    xx = write(xx, j, inr, cur_x)
    at_ymax = inr & (rows == eymax[i])
    at_ymin = inr & (rows == eymin[i])
    dbl = at_ymax & (rows < gymax)
    j1 = j + inr
    xx = write(xx, j1, dbl, cur_x)
    # corner-connection fix-up (Draw.c: only at an endpoint row; at ymax only
    # on the clipped bottom row, where the doubling branch doesn't run)
    if i > 0:
      elig = (edx[i] != 0) & (at_ymin | (at_ymax & (rows >= gymax)))
      offset = jnp.where(at_ymax, -1, 1)
      adj_y = rows + offset
      adj = edge_x(i, adj_y)
      cur_r = _roundf(cur_x)
      found = jnp.zeros(rows.shape, bool)
      adj_o = jnp.zeros(rows.shape, jnp.float32)
      for k in range(i):
        ok = ((~ehoriz[k])
              & ((rows == eymin[k]) | (rows == eymax[k]))
              & (cur_r == _roundf(edge_x(k, rows)))
              & (adj_y >= eymin[k]) & (adj_y <= eymax[k]))
        take = ok & ~found
        adj_o = jnp.where(take, edge_x(k, adj_y), adj_o)
        found = found | ok
      hi = (cur_x > adj + 1) & (cur_x > adj_o + 1)
      lo = (cur_x < adj - 1) & (cur_x < adj_o - 1)
      fixv = jnp.where(hi, _roundf(jnp.maximum(adj, adj_o)) + 1,
                       _roundf(jnp.minimum(adj, adj_o)) - 1)
      apply = elig & found & (hi | lo)
      xx = write(xx, j, apply, fixv)
    j = j1 + dbl

  xs_cols = _sort_columns(
      [jnp.where(s < j, xx[s], _INF) for s in range(S)])
  if width <= 32:
    # bitmask span fill: one row = one uint32, O(pairs) int ops per row
    # instead of O(pairs*W) comparisons — identical output by construction
    mask = jnp.zeros(rows.shape, jnp.uint32)
    for p in range(S // 2):
      valid = j >= 2 * p + 2                                        # (H,)
      a = _x_start(xs_cols[2 * p])
      b = _x_end(xs_cols[2 * p + 1])
      mask = mask | _span_bits(a, b, valid, width)
    for i in range(nv):
      xmin = jnp.minimum(ivx[i], ivx[(i + 1) % nv]).astype(jnp.float32)
      xmax = jnp.maximum(ivx[i], ivx[(i + 1) % nv]).astype(jnp.float32)
      hit = ehoriz[i] & (rows == ivy[i])
      mask = mask | _span_bits(xmin, xmax, hit, width)
    return mask
  cov = jnp.zeros((height, width), bool)
  for p in range(S // 2):
    valid = j >= 2 * p + 2                                          # (H,)
    a = _x_start(xs_cols[2 * p])
    b = _x_end(xs_cols[2 * p + 1])
    cov = cov | (valid[:, None] & (cols[None] >= a[:, None])
                 & (cols[None] <= b[:, None]))
  # horizontal edges are hlined directly (ImagingDrawPolygon first loop)
  for i in range(nv):
    xmin = jnp.minimum(ivx[i], ivx[(i + 1) % nv]).astype(jnp.float32)
    xmax = jnp.maximum(ivx[i], ivx[(i + 1) % nv]).astype(jnp.float32)
    hit = ehoriz[i] & (rows == ivy[i])
    cov = cov | (hit[:, None] & (cols[None] >= xmin) & (cols[None] <= xmax))
  return cov


# -- per-body coverage -----------------------------------------------------------

def _circle_cover(tbl, cx, cy, r, s, height: int, width: int):
  """(H, W) bool: PIL ellipse coverage for one circle (PIL pixel frame)."""
  dmax = tbl.shape[0] - 1
  ix0, iy0, iw, ih = _circle_bbox(cx, cy, r, s, dmax)
  di = jnp.arange(height, dtype=jnp.int32) - iy0                    # (H,)
  dj = jnp.arange(width, dtype=jnp.int32) - ix0                     # (W,)
  ok = ((di >= 0) & (di <= ih))[:, None] & ((dj >= 0) & (dj <= iw))[None]
  dic = jnp.clip(di, 0, dmax + 1)
  djc = jnp.clip(dj, 0, dmax + 1)
  return ok & tbl[ih, iw][dic[:, None], djc[None]]


def _circle_bbox(cx, cy, r, s, dmax):
  x0 = (cx - r) * s
  y0 = (cy - r) * s
  x1 = (cx + r) * s
  y1 = (cy + r) * s
  ix0 = jnp.trunc(x0).astype(jnp.int32)
  iy0 = jnp.trunc(y0).astype(jnp.int32)
  iw = jnp.clip(jnp.trunc(x1).astype(jnp.int32) - ix0, 0, dmax)
  ih = jnp.clip(jnp.trunc(y1).astype(jnp.int32) - iy0, 0, dmax)
  return ix0, iy0, iw, ih


def _circle_fill(tblbits, cx, cy, r, s, height: int, width: int, rows=None):
  """(H,) uint32 row bitmasks of PIL ellipse coverage (W<=32 fast path).

  rows: optional (H,) int32 row indices (default arange). The Pallas render
  passes a REVERSED constant so slot i holds image row H-1-i — the vertical
  flip then costs nothing at runtime (a sublane-axis reverse fused with the
  bit unpack miscompiles at large batch on the real TPU; round-3 notes)."""
  dmax = tblbits.shape[0] - 1
  ix0, iy0, iw, ih = _circle_bbox(cx, cy, r, s, dmax)
  if rows is None:
    rows = jnp.arange(height, dtype=jnp.int32)
  di = rows - iy0                                                   # (H,)
  ok = (di >= 0) & (di <= ih)
  rowbits = tblbits[ih, iw][jnp.clip(di, 0, dmax + 1)]              # (H,)
  # shift the mask (bit j = column ix0+j) into image columns
  ls = jnp.clip(ix0, 0, 31).astype(jnp.uint32)
  rs = jnp.clip(-ix0, 0, 31).astype(jnp.uint32)
  shifted = jnp.where(ix0 >= 0,
                      jnp.where(ix0 < 32, rowbits << ls, jnp.uint32(0)),
                      jnp.where(-ix0 < 32, rowbits >> rs, jnp.uint32(0)))
  full = jnp.uint32(0xFFFFFFFF if width >= 32 else (1 << width) - 1)
  return jnp.where(ok, shifted & full, jnp.uint32(0))


def _poly_verts_px(spec, c, cosa, sina, s, b):
  """Truncated pixel-space draw vertices of body b (b2Mul float32 order)."""
  nv = int(spec.nverts[b])
  dv = jnp.asarray(spec.draw_verts[b, :nv], jnp.float32)            # (nv, 2)
  lc = jnp.asarray(spec.local_center[b, 1], jnp.float32)            # (2,)
  # b2Mul op order: w = (cos*vx - sin*vy) + origin, each product rounded
  ox = c[b, 0] - _muladd(cosa[b], lc[0], -_f32(sina[b] * lc[1]))
  oy = c[b, 1] - _muladd(sina[b], lc[0], _f32(cosa[b] * lc[1]))
  wx = _f32(_muladd(cosa[b], dv[:, 0], -_f32(sina[b] * dv[:, 1]))) + ox
  wy = _f32(_muladd(sina[b], dv[:, 0], _f32(cosa[b] * dv[:, 1]))) + oy
  ivx = jnp.trunc(wx * s).astype(jnp.int32)
  ivy = jnp.trunc(wy * s).astype(jnp.int32)
  return ivx, ivy, nv


def _poly_verts_px_batch(spec, c, cosa, sina, s, b):
  """Batched _poly_verts_px: c (B, N, 2), cosa/sina (B, N) -> (B, nv) int32.

  Identical float32 op order per element (b2Mul products rounded before the
  adds), so the truncated pixel vertices match the single-world path bitwise.
  """
  nv = int(spec.nverts[b])
  dv = jnp.asarray(spec.draw_verts[b, :nv], jnp.float32)            # (nv, 2)
  lc = jnp.asarray(spec.local_center[b, 1], jnp.float32)            # (2,)
  ca = cosa[:, b, None]
  sa = sina[:, b, None]
  ox = c[:, b, 0, None] - _muladd(ca, lc[0], -_f32(sa * lc[1]))
  oy = c[:, b, 1, None] - _muladd(sa, lc[0], _f32(ca * lc[1]))
  wx = _f32(_muladd(ca, dv[None, :, 0], -_f32(sa * dv[None, :, 1]))) + ox
  wy = _f32(_muladd(sa, dv[None, :, 0], _f32(ca * dv[None, :, 1]))) + oy
  return (jnp.trunc(wx * s).astype(jnp.int32),
          jnp.trunc(wy * s).astype(jnp.int32))


def _body_fills(spec, is_circle, c, angle, width, height, bits):
  """Per-body coverage in the PIL (unflipped) frame: a list of (H,) uint32
  row bitmasks (bits=True, W<=32) or (H, W) bools."""
  tbl, tblbits = _tables(spec, width, height)
  s = jnp.float32(width / spec.width)
  cosa = jnp.cos(angle).astype(jnp.float32)                         # (N,)
  sina = jnp.sin(angle).astype(jnp.float32)
  fills = []
  for b in range(spec.n):
    kind = int(spec.shape_static[b])
    circ = None
    poly = None
    if kind != POLY:
      r = jnp.float32(spec.radius[b])
      if bits:
        circ = _circle_fill(jnp.asarray(tblbits), c[b, 0], c[b, 1], r, s,
                            height, width)
      else:
        circ = _circle_cover(jnp.asarray(tbl), c[b, 0], c[b, 1], r, s,
                             height, width)
    if kind != CIRCLE:
      ivx, ivy, nv = _poly_verts_px(spec, c, cosa, sina, s, b)
      poly = (_poly_fill(ivx, ivy, nv, height, width) if bits
              else _poly_cover(ivx, ivy, nv, height, width))
    if circ is None:
      fill = poly
    elif poly is None:
      fill = circ
    else:
      fill = jnp.where(is_circle[b], circ, poly)
    fills.append(fill)
  return fills


def exact_cover(spec: WorldSpec, is_circle, c, angle, width: int, height: int):
  """(H, W, N) bool per-body coverage in the FINAL (y-flipped) frame."""
  covs = _body_fills(spec, is_circle, c, angle, width, height, bits=False)
  cov = jnp.stack(covs, axis=-1)                                    # (H, W, N)
  return cov[::-1]  # PIL FLIP_TOP_BOTTOM (world_env.py:506)


def _lcd_render_single(spec, is_circle, c, angle, width: int, height: int):
  """One-world exact render (the pure-XLA scanline path)."""
  if width <= 32 and _tables(spec, width, height)[1] is not None:
    fills = _body_fills(spec, is_circle, c, angle, width, height, bits=True)
    mask = fills[0]
    for f in fills[1:]:
      mask = mask | f
    return ~_unpack_bits(mask, width)[::-1]
  return ~exact_cover(spec, is_circle, c, angle, width, height).any(-1)


_RENDER_FNS = {}


def _lcd_render_fn(spec: WorldSpec, width: int, height: int):
  """custom_vmap wrapper: vmapping over worlds dispatches to the Pallas
  scanline kernel on TPU (render/pallas_raster.py) and to plain jax.vmap of
  the XLA path on CPU — bit-identical either way."""
  import jax

  key = (id(spec), width, height)
  if key in _RENDER_FNS:
    return _RENDER_FNS[key]

  def single(ic, c, a):
    return _lcd_render_single(spec, ic, c, a, width, height)

  fn = jax.custom_batching.custom_vmap(single)

  @fn.def_vmap
  def rule(axis_size, in_batched, ic, c, a):
    ic, c, a = [x if bb else jnp.broadcast_to(x, (axis_size, *x.shape))
                for x, bb in zip((ic, c, a), in_batched)]
    import os
    if (jax.default_backend() != 'cpu' and width <= 32 and c.ndim == 3
        and _tables(spec, width, height)[1] is not None
        and bool(int(os.environ.get('BOXLCD_RASTER_KERNEL', '1')))):
      # BOXLCD_RASTER_KERNEL=0 keeps the pure-XLA scanline even on TPU:
      # through the axon tunnel a pallas_call inside a lax.scan body costs
      # ~18 ms/iteration (PROGRESS.md round 3), so scan-of-render workloads
      # (datagen) want the XLA path; standalone renders want the kernel.
      from boxlcd_tpu.render.pallas_raster import make_batched_render
      out = make_batched_render(spec, width, height)(ic, c, a)
    else:
      out = jax.vmap(single)(ic, c, a)
    return out, True

  _RENDER_FNS[key] = fn
  return fn


def lcd_render(spec: WorldSpec, is_circle, c, angle, width: int, height: int):
  """Binarized frame, (H, W) bool, background True (one world; vmap outside).

  Bitwise-equal to the reference `WorldEnv.lcd_render(mode='1')` given the
  same body poses (reference: boxLCD/world_env.py:460-512). For W<=32 the
  whole union is computed as one uint32 bitmask per row and unpacked once.
  Under `jax.vmap` on TPU this dispatches to the Pallas scanline kernel
  (render/pallas_raster.py); output is bit-identical on every path.
  """
  return _lcd_render_fn(spec, width, height)(is_circle, c, angle)


# -- approximate RGB render (human viz only) -------------------------------------

def coverage(spec: WorldSpec, is_circle, c, angle, width: int, height: int):
  """(H, W, N) bool pixel-center coverage (approximate; viz only)."""
  geom = collision.make_geom(spec, is_circle, c, angle)
  sc = width / spec.width
  jj = jnp.arange(width, dtype=jnp.float32)
  ii = jnp.arange(height, dtype=jnp.float32)
  wx = (jj + 0.5) / sc
  wy = (height - ii - 0.5) / sc
  pix = jnp.stack(jnp.meshgrid(wx, wy, indexing='xy'), axis=-1).reshape(-1, 2)
  d2 = ((pix[:, None, :] - geom.c[None, :, :]) ** 2).sum(-1)    # (HW, N)
  cov_circle = d2 <= (geom.radius[None, :] ** 2)
  rel = pix[:, None, None, :] - geom.wverts[None, :, :, :]      # (HW, N, V, 2)
  side = (rel * geom.wnormals[None]).sum(-1)                    # (HW, N, V)
  side = jnp.where(geom.vmask[None], side, -jnp.inf)
  cov_poly = (side <= 0.0).all(-1)
  cov = jnp.where(geom.is_circle[None, :], cov_circle, cov_poly)
  return cov.reshape(height, width, -1)


def rgb_render(spec: WorldSpec, is_circle, c, angle, width: int, height: int,
               robot_mask=None):
  """Simple RGB frame (H, W, 3) uint8 using the reference body palette.

  Robots render reddish (0.9, 0.4, 0.4), objects bluish (0.5, 0.4, 0.9)
  (reference: boxLCD/world_env.py:201,303), on white background, matching
  the color-inversion at world_env.py:510-511. Painter's order: later bodies
  draw over earlier ones, like PIL's sequential draws.
  """
  cov = exact_cover(spec, is_circle, c, angle, width, height)   # (H, W, N)
  if robot_mask is None:
    robot_mask = jnp.asarray(spec.role != 2)
  robot_col = jnp.array([0.9, 0.4, 0.4])
  obj_col = jnp.array([0.5, 0.4, 0.9])
  body_col = jnp.where(robot_mask[:, None], robot_col[None], obj_col[None])
  any_cov = cov.any(-1, keepdims=True)
  # last covering body wins (PIL painter's order over dynbodies)
  n = cov.shape[-1]
  last = n - 1 - jnp.argmax(cov[..., ::-1], axis=-1)
  col = body_col[last]
  img = jnp.where(any_cov, col, jnp.ones(3))
  return (img * 255).astype(jnp.uint8)

"""Pallas TPU kernel for the pixel-exact LCD rasterizer.

The exact scanline rasterizer (render/raster.py) is bit-identical to PIL's
output (the reference's backend, boxLCD/world_env.py:460-512) but its XLA
lowering hits a TPU fusion/lowering pathology: ~19 ms/step for 4096 worlds,
~1000x slower than its op count justifies (PROGRESS.md, round 2). This
module moves the polygon scanline fill — the pathological stage — into a
Pallas kernel with worlds on the LANE axis and LCD rows on the sublane axis,
so every step of Pillow's polygon_generic becomes an (H, 128) VPU tile op
with no fusion decisions left to XLA.

The kernel body calls the SAME `raster._poly_fill` code the XLA/CPU path
uses (it is shape-polymorphic over a lane axis), so bit-exactness vs PIL
(tests/test_raster.py) is preserved by construction.

Cheap, non-pathological stages stay in XLA where they were measured fast
(PROGRESS.md bisection): float32 vertex transform (258M steps/s), ellipse
table gathers, uint32 bit unpack + vertical flip.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from boxlcd_tpu.engine.spec import CIRCLE, POLY, WorldSpec

LANE = 128  # worlds per kernel program (one vreg lane width)
# Max worlds per pallas_call dispatch. Measured on the real v5e (round 3):
# grids <= 1792 programs produce bit-exact output, grids >= 1856 silently
# corrupt EVERY block (the poly mask degenerates to tile0=~0/tile1=0 while
# the XLA-side circle fill survives) — a Mosaic/runtime miscompile, not an
# indexing overflow, since block 0 is wrong too. 1024 programs (131072
# worlds) keeps a wide margin; larger batches run as several dispatches.
MAX_GRID = 1024
MAX_WORLDS = MAX_GRID * LANE

_CACHE = {}


def make_batched_render(spec: WorldSpec, width: int, height: int,
                        interpret: bool = False):
  """Batched exact LCD render: (B,N) is_circle, (B,N,2) c, (B,N) angle ->
  (B, H, W) bool frames, bit-identical to vmapped raster.lcd_render."""
  key = (id(spec), width, height, interpret)
  if key not in _CACHE:
    _CACHE[key] = _build(spec, width, height, interpret)
  return _CACHE[key]


def _build(spec: WorldSpec, width: int, height: int, interpret: bool):
  from boxlcd_tpu.render import raster

  _, tblbits = raster._tables(spec, width, height)
  assert tblbits is not None and width <= 32, \
      'pallas raster requires the uint32 row-bitmask layout (W<=32)'
  poly_bodies = [b for b in range(spec.n)
                 if int(spec.shape_static[b]) != CIRCLE]
  circ_bodies = [b for b in range(spec.n)
                 if int(spec.shape_static[b]) != POLY]
  nv_list = [int(spec.nverts[b]) for b in poly_bodies]
  P = len(poly_bodies)
  V = max(nv_list) if nv_list else 1
  H = height
  # numpy here: _build may first run inside a trace and is cached across
  # traces — a jnp constant created at build time would leak that trace's
  # tracer. render() converts per trace.
  tblbits_np = np.asarray(tblbits)
  s = jnp.float32(width / spec.width)

  full = np.uint32(0xFFFFFFFF if width >= 32 else (1 << width) - 1)

  def kernel(ivx_ref, ivy_ref, gate_ref, circ_ref, out_ref):
    # flipped row space: sublane i computes IMAGE row H-1-i, so the final
    # frame needs no vertical flip (PIL FLIP_TOP_BOTTOM becomes a constant
    # remap here; a runtime reverse fused with the bit unpack miscompiles
    # at large batch on the real chip — round-3 stage isolation)
    rows = jnp.int32(H - 1) - jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0)
    out = circ_ref[:, :]                               # (H, LANE) uint32
    for pi in range(P):
      nv = nv_list[pi]
      ivx = [ivx_ref[pi, v:v + 1, :] for v in range(nv)]   # (1, LANE) each
      ivy = [ivy_ref[pi, v:v + 1, :] for v in range(nv)]
      mask = raster._poly_fill(ivx, ivy, nv, H, width, rows=rows)
      gate = gate_ref[pi:pi + 1, :] != 0
      out = out | jnp.where(gate, mask, np.uint32(0))
    out_ref[:, :] = out ^ full                         # invert in-kernel

  def render(is_circle, c, angle):
    B = c.shape[0]
    tblbits_j = jnp.asarray(tblbits_np)
    cosa = jnp.cos(angle).astype(jnp.float32)
    sina = jnp.sin(angle).astype(jnp.float32)
    # circles: gated OR of tabulated PIL ellipse row masks (XLA gathers).
    # rows_flipped is a compile-time constant, so the circle masks land in
    # the same flipped row space the kernel scanline uses.
    rows_flipped = jnp.asarray(np.arange(H - 1, -1, -1, dtype=np.int32))
    circ = jnp.zeros((B, H), jnp.uint32)
    for b in circ_bodies:
      r = jnp.float32(spec.radius[b])
      fill = jax.vmap(lambda cx, cy: raster._circle_fill(
          tblbits_j, cx, cy, r, s, H, width, rows=rows_flipped))(
              c[:, b, 0], c[:, b, 1])
      circ = circ | jnp.where(is_circle[:, b, None], fill, jnp.uint32(0))
    if P:
      ivx = jnp.zeros((B, P, V), jnp.int32)
      ivy = jnp.zeros((B, P, V), jnp.int32)
      for pi, b in enumerate(poly_bodies):
        vx, vy = raster._poly_verts_px_batch(spec, c, cosa, sina, s, b)
        ivx = ivx.at[:, pi, :nv_list[pi]].set(vx)
        ivy = ivy.at[:, pi, :nv_list[pi]].set(vy)
      gate = (~is_circle[:, np.asarray(poly_bodies)]).astype(jnp.int32)
      pad = (-B) % LANE
      Bp = B + pad

      def prep(x):  # (B, *S) -> (*S, Bp), worlds last (lane axis)
        if pad:
          x = jnp.concatenate(
              [x, jnp.zeros((pad, *x.shape[1:]), x.dtype)], axis=0)
        return jnp.moveaxis(x, 0, -1)

      lane_spec = lambda *lead: pl.BlockSpec(
          (*lead, LANE), lambda g, nl=len(lead): (0,) * nl + (g,),
          memory_space=pltpu.VMEM)

      def dispatch(xs, nw):
        return pl.pallas_call(
            kernel,
            grid=(nw // LANE,),
            in_specs=[lane_spec(P, V), lane_spec(P, V), lane_spec(P),
                      lane_spec(H)],
            out_specs=lane_spec(H),
            out_shape=jax.ShapeDtypeStruct((H, nw), jnp.uint32),
            interpret=interpret,
        )(*xs)

      # The barrier pins the operands as materialized buffers. Without it,
      # XLA fusing the vertex pre-stage into the custom-call operands
      # silently corrupts the kernel's view at large batch (measured on the
      # real v5e: every block's poly mask degenerates to tile0=~0/tile1=0
      # for B >= ~230k worlds, while the SAME kernel fed host-materialized
      # operands is bit-exact at any size — round-3 stage isolation).
      inputs = jax.lax.optimization_barrier(
          (prep(ivx), prep(ivy), prep(gate), prep(circ)))
      if Bp <= MAX_WORLDS:
        mask = dispatch(inputs, Bp)
      else:  # chunked dispatches: grids past ~1800 programs miscompile
        parts = []
        for lo in range(0, Bp, MAX_WORLDS):
          nw = min(MAX_WORLDS, Bp - lo)
          parts.append(dispatch(
              tuple(x[..., lo:lo + nw] for x in inputs), nw))
        mask = jnp.concatenate(parts, axis=-1)
      mask = jnp.moveaxis(mask, -1, 0)[:B]              # (B, H)
    else:
      full = jnp.uint32(0xFFFFFFFF if width >= 32 else (1 << width) - 1)
      mask = circ ^ full
    # mask rows are already image rows (flipped space) with bits inverted
    # in-kernel: the unpack is the whole post-stage — no runtime reverse,
    # no bool NOT (both miscompile when fused at large batch; see kernel)
    bitcols = jnp.arange(width, dtype=jnp.uint32)
    return ((mask[:, :, None] >> bitcols) & jnp.uint32(1)).astype(bool)

  return render

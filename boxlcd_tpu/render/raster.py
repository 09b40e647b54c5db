"""On-device binarized LCD rasterizer.

Replaces the reference's PIL ImageDraw rasterization
(reference: boxLCD/world_env.py:460-512) with a pixel-center coverage test
evaluated for every (pixel, body) pair on the VPU — trivially `vmap`-able
over worlds, no host round-trip.

Conventions matched to the reference:
  - world-to-pixel scale uses the world WIDTH for both axes
    (world_env.py:495-498: `pos / self.WIDTH * width`)
  - the image is y-flipped (world_env.py:506), so row 0 is the top
  - output is bool with background=True and bodies=False
    (world_env.py:471-477: background fill 1, shapes fill 0)

PIL's exact scanline rules differ sub-pixel from center sampling (~96%
pixel agreement at 16x16 on random scenes, measured); the framework is
self-consistent end-to-end since data, training, and serving all use this
rasterizer.
"""
from __future__ import annotations

import jax.numpy as jnp

from boxlcd_tpu.engine import collision
from boxlcd_tpu.engine.spec import WorldSpec


def _pixel_centers(spec: WorldSpec, width: int, height: int):
  """World-space coordinates of final-image pixel centers, (H, W, 2)."""
  s = width / spec.width
  j = jnp.arange(width, dtype=jnp.float32)
  i = jnp.arange(height, dtype=jnp.float32)
  wx = (j + 0.5) / s
  wy = (height - i - 0.5) / s
  return jnp.stack(jnp.meshgrid(wx, wy, indexing='xy'), axis=-1)  # (H, W, 2)


def coverage(spec: WorldSpec, is_circle, c, angle, width: int, height: int):
  """(H, W, N) bool: which bodies cover each pixel center (one world)."""
  geom = collision.make_geom(spec, is_circle, c, angle)
  pix = _pixel_centers(spec, width, height).reshape(-1, 2)      # (HW, 2)
  # circles: distance to center (= com for circle shapes)
  d2 = ((pix[:, None, :] - geom.c[None, :, :]) ** 2).sum(-1)    # (HW, N)
  cov_circle = d2 <= (geom.radius[None, :] ** 2)
  # convex polygons: inside all valid edges (verts CCW, outward normals)
  # edge test: dot(normal_k, p - v_k) <= 0
  rel = pix[:, None, None, :] - geom.wverts[None, :, :, :]      # (HW, N, V, 2)
  side = (rel * geom.wnormals[None]).sum(-1)                    # (HW, N, V)
  side = jnp.where(geom.vmask[None], side, -jnp.inf)
  cov_poly = (side <= 0.0).all(-1)
  cov = jnp.where(geom.is_circle[None, :], cov_circle, cov_poly)
  return cov.reshape(height, width, -1)


def lcd_render(spec: WorldSpec, is_circle, c, angle, width: int, height: int):
  """Binarized frame, (H, W) bool, background True (one world; vmap outside)."""
  cov = coverage(spec, is_circle, c, angle, width, height)
  return ~cov.any(-1)


def rgb_render(spec: WorldSpec, is_circle, c, angle, width: int, height: int,
               robot_mask=None):
  """Simple RGB frame (H, W, 3) uint8 using the reference body palette.

  Robots render reddish (0.9, 0.4, 0.4), objects bluish (0.5, 0.4, 0.9)
  (reference: boxLCD/world_env.py:201,303), on white background, matching
  the color-inversion at world_env.py:510-511.
  """
  cov = coverage(spec, is_circle, c, angle, width, height)     # (H, W, N)
  if robot_mask is None:
    robot_mask = jnp.asarray(spec.role != 2)
  robot_col = jnp.array([0.9, 0.4, 0.4])
  obj_col = jnp.array([0.5, 0.4, 0.9])
  body_col = jnp.where(robot_mask[:, None], robot_col[None], obj_col[None])
  any_cov = cov.any(-1, keepdims=True)
  # first covering body wins (approximates PIL draw order)
  first = jnp.argmax(cov, axis=-1)
  col = body_col[first]
  img = jnp.where(any_cov, col, jnp.ones(3))
  return (img * 255).astype(jnp.uint8)

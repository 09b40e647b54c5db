"""Pixel-exactness tests: JAX rasterizer vs real PIL (the reference's backend).

The reference's LCD frames come from PIL ImageDraw
(reference: boxLCD/world_env.py:460-512). These tests assert bit-for-bit
equality of the JAX rasterizer against actual Pillow on this machine, at the
kernel level (polygon fill, ellipse fill) and at the scene level for
representative envs, given identical float32 body poses.
"""
import numpy as np
import pytest

jax = pytest.importorskip('jax')
import jax.numpy as jnp
from PIL import Image, ImageDraw

from boxlcd_tpu import env_map
from boxlcd_tpu.envs.env import Env
from boxlcd_tpu.render import raster
from boxlcd_tpu.utils import AttrDict


def pil_polygon(pts, W, H):
  im = Image.new('1', (W, H))
  d = ImageDraw.Draw(im)
  d.rectangle([0, 0, W, H], fill=1)
  d.polygon([tuple(map(float, p)) for p in pts], fill=0, outline=None)
  return ~np.asarray(im).astype(np.float32).astype(bool)


def pil_ellipse(bbox, W, H):
  im = Image.new('1', (W, H))
  d = ImageDraw.Draw(im)
  d.rectangle([0, 0, W, H], fill=1)
  d.ellipse([float(v) for v in bbox], fill=0, outline=None)
  return ~np.asarray(im).astype(np.float32).astype(bool)


def _convex_hull(pts):
  pts = sorted({tuple(p) for p in pts})
  if len(pts) < 3:
    return None
  def cross(o, a, b):
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])
  lower, upper = [], []
  for p in pts:
    while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
      lower.pop()
    lower.append(p)
  for p in reversed(pts):
    while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
      upper.pop()
    upper.append(p)
  h = lower[:-1] + upper[:-1]
  return h if len(h) >= 3 else None


@pytest.mark.parametrize('nv', [3, 4, 5, 6])
def test_polygon_kernel_matches_pil(nv):
  W = H = 16
  rng = np.random.default_rng(nv)
  cases = []
  while len(cases) < 150:
    pts = rng.integers(-3, 19, size=(nv + 2, 2))
    h = _convex_hull([tuple(map(int, p)) for p in pts])
    if h is not None and len(h) == nv:
      cases.append(h)
  arr = np.array(cases, dtype=np.int32)              # (B, nv, 2)
  fn = jax.jit(jax.vmap(
      lambda vx, vy: raster._poly_cover(vx, vy, nv, H, W)))
  ours = np.asarray(fn(arr[..., 0], arr[..., 1]))
  for i, pts in enumerate(cases):
    want = pil_polygon(pts, W, H)
    assert np.array_equal(ours[i], want), f'polygon mismatch: {pts}'


def test_rotated_rect_kernel_matches_pil():
  W = H = 16
  rng = np.random.default_rng(0)
  cases = []
  for _ in range(200):
    cx, cy = rng.uniform(0, 16, 2)
    w, h = rng.uniform(0.4, 6, 2)
    th = rng.uniform(0, 2 * np.pi)
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    base = np.array([[-w, -h], [w, -h], [w, h], [-w, h]])
    p = base @ R.T + [cx, cy]
    cases.append(np.trunc(p).astype(np.int32))
  arr = np.array(cases)
  fn = jax.jit(jax.vmap(lambda vx, vy: raster._poly_cover(vx, vy, 4, H, W)))
  ours = np.asarray(fn(arr[..., 0], arr[..., 1]))
  for i, pts in enumerate(cases):
    want = pil_polygon(pts, W, H)
    assert np.array_equal(ours[i], want), f'rect mismatch: {pts.tolist()}'


def test_circle_kernel_matches_pil():
  W, H = 24, 16
  rng = np.random.default_rng(1)
  dmax = 14
  tbl = jnp.asarray(raster._ellipse_mask_table(dmax))
  s = np.float32(1.0)
  fn = jax.jit(jax.vmap(lambda cx, cy, r: raster._circle_cover(
      tbl, cx, cy, r, s, H, W)))
  cx = rng.uniform(-3, 27, 300).astype(np.float32)
  cy = rng.uniform(-3, 19, 300).astype(np.float32)
  r = rng.uniform(0.3, 6.0, 300).astype(np.float32)
  ours = np.asarray(fn(cx, cy, r))
  for i in range(len(cx)):
    want = pil_ellipse([cx[i] - r[i], cy[i] - r[i],
                        cx[i] + r[i], cy[i] + r[i]], W, H)
    assert np.array_equal(ours[i], want), \
        f'circle mismatch: c=({cx[i]},{cy[i]}) r={r[i]}'


@pytest.mark.parametrize('env_name', ['Urchin', 'Object3'])
def test_pallas_raster_matches_xla(env_name):
  """The Pallas scanline kernel (interpret mode on CPU) is bit-identical to
  the vmapped XLA exact path — same _poly_fill code, different lowering."""
  from boxlcd_tpu.engine import physics
  from boxlcd_tpu.render.pallas_raster import make_batched_render
  env = env_map[env_name]({})
  spec = env.spec
  B = 96  # pads to one 128-lane program
  keys = jax.random.split(jax.random.PRNGKey(3), B)
  states = jax.vmap(lambda k: Env.reset(env, k))(keys)
  acts = jax.random.uniform(jax.random.PRNGKey(4), (B, env.act_size),
                            minval=-1, maxval=1)
  states = jax.jit(lambda s, a: physics.step_world_batch(spec, s, a))(
      states, acts)
  ref = jax.jit(jax.vmap(lambda ic, c, a: raster._lcd_render_single(
      spec, ic, c, a, env.lcd_w, env.lcd_h)))(
          states.is_circle, states.c, states.a)
  got = make_batched_render(spec, env.lcd_w, env.lcd_h, interpret=True)(
      states.is_circle, states.c, states.a)
  assert np.array_equal(np.asarray(ref), np.asarray(got))


def test_pallas_raster_chunked_dispatch(monkeypatch):
  """Batches above MAX_WORLDS split into several pallas dispatches (grids
  past ~1800 programs silently miscompile on the real chip — round 3);
  chunk boundaries must be seam-free and bit-identical to the XLA path."""
  from boxlcd_tpu.render import pallas_raster
  monkeypatch.setattr(pallas_raster, 'MAX_WORLDS', 256)
  pallas_raster._CACHE.clear()
  env = env_map['Urchin']({})
  spec = env.spec
  B = 600  # pads to 640 -> 3 chunks of 256/256/128 worlds
  keys = jax.random.split(jax.random.PRNGKey(11), B)
  states = jax.vmap(lambda k: Env.reset(env, k))(keys)
  ref = jax.jit(jax.vmap(lambda ic, c, a: raster._lcd_render_single(
      spec, ic, c, a, env.lcd_w, env.lcd_h)))(
          states.is_circle, states.c, states.a)
  got = pallas_raster.make_batched_render(
      spec, env.lcd_w, env.lcd_h, interpret=True)(
          states.is_circle, states.c, states.a)
  pallas_raster._CACHE.clear()  # drop the small-chunk build
  assert np.array_equal(np.asarray(ref), np.asarray(got))


def _pil_scene_render(spec, is_circle, c, cossin, width, height):
  """Oracle: PIL draws with the same float32 pixel inputs our kernel uses.

  cossin: (N, 2) float32 per-body (cos, sin) — computed via jnp so trig
  rounding matches the device kernel (trig is not bit-specified across
  libms; everything downstream is pinned-order float32 in both paths).
  """
  s = np.float32(width / spec.width)
  im = Image.new('1', (width, height))
  d = ImageDraw.Draw(im)
  d.rectangle([0, 0, width, height], fill=1)
  for b in range(spec.n):
    if bool(is_circle[b]):
      r = np.float32(spec.radius[b])
      bbox = [np.float32((c[b, 0] - r) * s), np.float32((c[b, 1] - r) * s),
              np.float32((c[b, 0] + r) * s), np.float32((c[b, 1] + r) * s)]
      d.ellipse([float(v) for v in bbox], fill=0, outline=None)
    else:
      nv = int(spec.nverts[b])
      dv = spec.draw_verts[b, :nv].astype(np.float32)
      lc = spec.local_center[b, 1].astype(np.float32)
      ca = np.float32(cossin[b, 0])
      sa = np.float32(cossin[b, 1])
      cx, cy = np.float32(c[b, 0]), np.float32(c[b, 1])
      # mirror the raster's b2Mul-style float32 op order exactly
      ox = cx - (np.float32(ca * lc[0]) - np.float32(sa * lc[1]))
      oy = cy - (np.float32(sa * lc[0]) + np.float32(ca * lc[1]))
      pts = []
      for v in dv:
        wx = (np.float32(ca * v[0]) - np.float32(sa * v[1])) + ox
        wy = (np.float32(sa * v[0]) + np.float32(ca * v[1])) + oy
        pts.append((float(np.float32(wx * s)), float(np.float32(wy * s))))
      d.polygon(pts, fill=0, outline=None)
  arr = np.asarray(im.transpose(method=Image.FLIP_TOP_BOTTOM))
  return arr.astype(np.float32).astype(bool)


@pytest.mark.parametrize('env_name,width,height', [
    ('Dropbox', 16, 16), ('Bounce2', 16, 16), ('Object3', 24, 16),
    ('Urchin', 16, 16), ('Luxo', 16, 16), ('Crab', 32, 16),
])
def test_scene_parity_vs_pil(env_name, width, height):
  from research.define_config import config
  G = config()
  G.env = env_name
  env = env_map[env_name](G)
  spec = env.spec
  n_worlds = 48
  keys = jax.random.split(jax.random.PRNGKey(0), n_worlds)
  states = jax.vmap(lambda k: Env.reset(env, k))(keys)
  render = jax.jit(jax.vmap(
      lambda ic, c, a: raster.lcd_render(spec, ic, c, a, width, height)))
  ours = np.asarray(render(states.is_circle, states.c, states.a))
  ic = np.asarray(states.is_circle)
  cs = np.asarray(states.c)
  cossin = np.stack([np.asarray(jnp.cos(states.a.astype(jnp.float32))),
                     np.asarray(jnp.sin(states.a.astype(jnp.float32)))], -1)
  mismatched = 0
  for w in range(n_worlds):
    want = _pil_scene_render(spec, ic[w], cs[w], cossin[w], width, height)
    if not np.array_equal(ours[w], want):
      mismatched += 1
  assert mismatched == 0, f'{mismatched}/{n_worlds} frames differ from PIL'

"""Trajectory-raster kernel equality: render/traj_raster.py must reproduce
raster.lcd_render (itself bit-identical to PIL — tests/test_raster.py)
pixel-for-pixel from megakernel-layout pose tiles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import boxlcd_tpu
from boxlcd_tpu.render import raster, traj_raster


def _tiles(x, B):
  """(T, B, *S) -> (T, *S, B/128, 128)."""
  T = x.shape[0]
  s = x.shape[2:]
  return np.moveaxis(x, 1, -1).reshape(T, *s, B // 128, 128)


@pytest.mark.parametrize('env_name', ['Urchin', 'Luxo', 'Object3'])
def test_traj_raster_matches_lcd_render(env_name):
  env = boxlcd_tpu.env_map[env_name]()
  spec = env.spec
  assert traj_raster.supports(spec)
  W, H = env.lcd_w, env.lcd_h
  T, B = 3, 1024
  rng = np.random.RandomState(0)
  n = spec.n
  # random poses across (and slightly beyond) the world box to hit PIL
  # clipping and span-rounding edge cases
  c = np.stack([rng.uniform(-1, spec.width + 1, (T, B, n)),
                rng.uniform(-1, spec.height + 1, (T, B, n))],
               -1).astype(np.float32)
  a = rng.uniform(-np.pi, np.pi, (T, B, n)).astype(np.float32)
  # per-episode shape flags: random for RANDOM bodies (Object3), static else
  from boxlcd_tpu.engine.spec import RANDOM
  ic_b = np.where(np.asarray(spec.shape_static)[None] == RANDOM,
                  rng.rand(B, n) < 0.5,
                  np.asarray(spec.shape_static)[None] == 0)

  tr = np.zeros((T, n, 6, B // 128, 128), np.float32)
  tr[:, :, 0] = _tiles(c[..., 0], B)
  tr[:, :, 1] = _tiles(c[..., 1], B)
  tr[:, :, 2] = _tiles(a, B)

  render = traj_raster.make_traj_render(spec, W, H, T, interpret=True)
  rows = render(jnp.asarray(tr), jnp.asarray(ic_b))
  got = np.asarray(traj_raster.rows_to_lcd(rows, W))        # (T, B, H, W)

  ic = jnp.broadcast_to(jnp.asarray(ic_b)[None], (T, B, n)).reshape(T * B, n)
  exp = jax.vmap(lambda icr, cr, ar: raster.lcd_render(
      spec, icr, cr, ar, W, H))(
          ic, jnp.asarray(c.reshape(T * B, n, 2)),
          jnp.asarray(a.reshape(T * B, n)))
  exp = np.asarray(exp).reshape(T, B, H, W)
  neq = (got != exp).sum()
  assert neq == 0, f'{env_name}: {neq}/{exp.size} pixels differ'


def test_traj_raster_covers_circles_and_polys():
  """The parametrized envs must exercise both body-shape paths."""
  from boxlcd_tpu.engine.spec import CIRCLE, POLY
  kinds = set()
  for name in ('Urchin', 'Luxo'):
    spec = boxlcd_tpu.env_map[name]().spec
    kinds |= {int(s) for s in spec.shape_static}
  assert {CIRCLE, POLY} <= kinds

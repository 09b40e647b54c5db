"""One-shot bench bisection on the real chip: where does the mega-path
chunk time go, and is the megakernel issue-bound or VMEM-bandwidth-bound?

Stages timed (Urchin, B=4096, T=50 unless overridden):
  phys            megakernel rollout only (consume final state)
  phys+tiles      + materialize the pose tile stream
  +lcd_kernel     + trajectory-raster kernel (rows consumed packed)
  +lcd_unpack     + unpack rows to bool frames (the obs contract form)
  +full_state     + observe_pose(lcd=False) packing
  full(old)       previous path: vmapped observe_pose incl. raster glue
SUB A/B: BOXLCD_MEGA_SUB={8,16} distinguishes issue-bound (16 wins) from
VMEM-bandwidth-bound (no change) — run this script once per SUB value.

Usage: python -m research.scripts.bench_bisect [--worlds=4096] [--steps=50]
One JAX process at a time (CLAUDE.md); takes the real TPU.
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import boxlcd_tpu
from boxlcd_tpu.envs.env import Env


def timeit(fn, *args, iters=3):
  from boxlcd_tpu.utils import retry_transient
  out = fn(*args)
  np.asarray(jax.tree_util.tree_leaves(out)[0])  # sync (block is a no-op)
  best = np.inf
  for _ in range(iters):
    def one():
      t0 = time.time()
      o = fn(*args)
      np.asarray(jax.tree_util.tree_leaves(o)[0])
      return time.time() - t0
    best = min(best, retry_transient(one, attempts=2, sleep_s=5,
                                     label='bisect'))
  return best


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--worlds', type=int, default=4096)
  p.add_argument('--steps', type=int, default=50)
  p.add_argument('--env', default='Urchin')
  args = p.parse_args()
  B, T = args.worlds, args.steps
  from boxlcd_tpu.engine import mega
  from boxlcd_tpu.render import traj_raster
  env = boxlcd_tpu.env_map[args.env]({})
  spec = env.spec
  n = spec.n
  print(f'SUB={mega.SUB} B={B} T={T} env={args.env}')
  rollout = mega.make_rollout(spec, T)
  trender = traj_raster.make_traj_render(spec, env.lcd_w, env.lcd_h, T)
  keys = jax.random.split(jax.random.PRNGKey(0), B)
  states = jax.jit(jax.vmap(lambda k: Env.reset(env, k)))(keys)
  ms = jnp.zeros((T, B, len(spec.j_parent)), jnp.float32)

  def report(name, sec):
    print(f'{name:>14}: {B * T / sec / 1e6:7.2f} M steps/s  '
          f'({sec * 1e3:7.1f} ms)', flush=True)

  f_phys = jax.jit(lambda s, m: rollout(s, m)[0].c)
  report('phys', timeit(f_phys, states, ms))

  f_tiles = jax.jit(lambda s, m: rollout(s, m)[1]['tiles'])
  report('phys+tiles', timeit(f_tiles, states, ms))

  f_lcdk = jax.jit(lambda s, m: trender(rollout(s, m)[1]['tiles']).sum())
  report('+lcd_kernel', timeit(f_lcdk, states, ms))

  f_unp = jax.jit(lambda s, m: traj_raster.rows_to_lcd(
      trender(rollout(s, m)[1]['tiles']), env.lcd_w).sum())
  report('+lcd_unpack', timeit(f_unp, states, ms))

  def full_new(s, m):
    s2, traj = rollout(s, m)
    lcd = traj_raster.rows_to_lcd(trender(traj['tiles']), env.lcd_w)
    ic = jnp.broadcast_to(s2.is_circle[None], (T, B, n)).reshape(T * B, n)
    obs = jax.vmap(lambda i, c, a: env.observe_pose(i, c, a, lcd=False))(
        ic, traj['c'].reshape(T * B, n, 2), traj['a'].reshape(T * B, n))
    return lcd.sum() + obs['full_state'].sum() + obs['proprio'].sum()
  report('+full_state', timeit(jax.jit(full_new), states, ms))

  def full_old(s, m):
    s2, traj = rollout(s, m)
    ic = jnp.broadcast_to(s2.is_circle[None], (T, B, n)).reshape(T * B, n)
    obs = jax.vmap(env.observe_pose)(
        ic, traj['c'].reshape(T * B, n, 2), traj['a'].reshape(T * B, n))
    return (obs['lcd'].sum() + obs['full_state'].sum()
            + obs['proprio'].sum())
  report('full(old)', timeit(jax.jit(full_old), states, ms))


if __name__ == '__main__':
  main()

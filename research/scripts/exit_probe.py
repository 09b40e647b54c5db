"""Measure velocity-GS convergence at reference iterations (180/60).

Decision driver for the matched-physics throughput work (VERDICT r3 weak #2):
the megakernel's convergence exit (BENCH_EXIT_TOL) exits a whole (SUB,128)
world tile only when EVERY world's sweep residual drops below tol, so its
value hinges on the distribution of iterations-to-convergence — in
particular the MAX over a tile. This probe records the per-sweep residual
`dm` (largest |impulse delta|, the exact quantity the exit tests) for every
world / substep / step on the jnp path (identical math to the kernel) and
reports, per tolerance:

  - per-world sweeps-to-tol percentiles (best case: per-world exit),
  - max-over-batch sweeps-to-tol (what a tile-granular exit actually pays),
  - the exact-fixed-point rate (dm == 0.0): sweeps beyond that point are
    bitwise no-ops, so an exit there is FREE of parity cost.

Run on CPU (JAX_PLATFORMS=cpu) while the TPU is busy; B is small.

Usage: python -m research.scripts.exit_probe [Urchin] [B] [T]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from boxlcd_tpu.engine import physics
from tests.parity import make_env


def probe_step(spec, states, actions):
  """step_world_batch with the velocity stage instrumented to record dm."""
  act = jnp.clip(actions, -1.0, 1.0)
  has_act = spec.j_act >= 0
  a_j = act[:, np.maximum(spec.j_act, 0)] * has_act[None]
  motor_speed = spec.j_speed[None] * a_j
  motor_changed = (motor_speed != states.prev_motor) \
      & jnp.asarray(spec.j_valid)[None]

  def solve_one(bb):
    core, init = physics._vel_iteration(spec, bb)

    def it(c, _):
      out, dm = core(c)
      return out, dm

    fin, dms = jax.lax.scan(it, init, None, length=spec.vel_iters)
    v, w, j_imp, j_mot, j_lim, wc, pc = fin
    return bb._replace(v=v, w=w, j_imp=j_imp, j_mot=j_mot, j_lim=j_lim,
                       wc=wc, pc=pc), dms

  def sub(states, _):
    bundle, aux = jax.vmap(
        lambda s, ms: physics._presolve(spec, s, ms))(states, motor_speed)
    bundle, dms = jax.vmap(solve_one)(bundle)
    c, a, dones = jax.vmap(
        lambda s, bb, ax: physics._position_solve(spec, s, bb, ax,
                                                  record_done=True))(
            states, bundle, aux)
    new_states = jax.vmap(
        lambda s, bb, ax, mc, cc, aa: physics._finalize(
            spec, s, bb, ax, mc, cc, aa))(
            states, bundle, aux, motor_changed, c, a)
    # per-(body, wall) tile activity: would a batch-granular slot skip run
    # this block? (touch OR carried warm-start impulse anywhere in batch)
    warm = (jnp.abs(bundle.wc[..., 0]) + jnp.abs(bundle.wc[..., 1])) > 0
    w_act = (aux.wallm.touch.any(-1) | warm.any(-1)).any(0)   # (n, nw)
    p_act = aux.pairm.touch.any(-1).any(0) | (
        jnp.abs(bundle.pc).sum((-1, -2)) > 0).any(0)          # (P,)
    return new_states, (dms, dones, w_act, p_act)

  states, (dms, dones, w_act, p_act) = jax.lax.scan(
      sub, states, None, length=spec.substeps)
  return (states._replace(ep_t=states.ep_t + 1, prev_motor=motor_speed),
          dms, dones, w_act, p_act)


def main():
  env_name = sys.argv[1] if len(sys.argv) > 1 else 'Urchin'
  B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
  T = int(sys.argv[3]) if len(sys.argv) > 3 else 20
  env = make_env(env_name, {'vel_iters': 180, 'pos_iters': 60})
  spec = env.spec
  sts = []
  for i in range(B):
    env.seed(i)
    env.reset()
    sts.append(env.state)
  states = jax.tree.map(lambda *x: jnp.stack(x), *sts)
  step = jax.jit(lambda s, a: probe_step(spec, s, a))
  rng = np.random.RandomState(0)
  all_dms, all_dones, all_wact, all_pact = [], [], [], []
  for t in range(T):
    act = rng.uniform(-1, 1, (B, env.act_size)).astype(np.float32)
    states, dms, dones, w_act, p_act = step(states, act)
    all_dms.append(np.asarray(dms))
    all_dones.append(np.asarray(dones))
    all_wact.append(np.asarray(w_act))
    all_pact.append(np.asarray(p_act))
  dms = np.stack(all_dms)                     # (T, substeps, B, iters)
  dones = np.stack(all_dones)                 # (T, substeps, B, pos_iters)
  w_act = np.stack(all_wact)                  # (T, substeps, n, nw)
  p_act = np.stack(all_pact)                  # (T, substeps, P)
  iters = dms.shape[-1]
  flat = dms.reshape(-1, B, iters)            # (T*substeps, B, iters)

  print(f'== {env_name} 180/60, B={B}, T={T} steps x {spec.substeps} substeps')
  for tol, name in [(1e-3, '1e-3'), (1e-4, '1e-4'), (1e-5, '1e-5'),
                    (0.0, 'exact-0')]:
    # sweeps executed under the while exit: first i with dm[i] <= tol, +1
    below = flat <= tol if tol > 0 else flat == 0.0
    # once below, does it STAY below? (monotone tail => exit is safe)
    first = np.where(below.any(-1), below.argmax(-1) + 1, iters)
    rebound = ((~below) & (np.cumsum(below, -1) > 0)).any(-1)
    per_world = first.ravel()
    tile_max = first.max(1)                   # max over B per substep
    print(f' tol {name:8s} per-world p50/p90/max: '
          f'{np.percentile(per_world, 50):6.1f} '
          f'{np.percentile(per_world, 90):6.1f} {per_world.max():4d}'
          f' | tile(max over B) mean/p90/max: {tile_max.mean():6.1f} '
          f'{np.percentile(tile_max, 90):6.1f} {tile_max.max():4d}'
          f' | rebound {rebound.mean():.3f}')
  # residual decay profile: median/p90 dm across the batch at sample sweeps
  med = np.median(flat, axis=(0, 1))
  p90 = np.percentile(flat, 90, axis=(0, 1))
  mx = flat.max((0, 1))
  for i in [0, 1, 3, 7, 15, 31, 63, 119, 179]:
    if i < iters:
      print(f'  sweep {i:3d}: median dm {med[i]:.3e}  p90 {p90[i]:.3e}  '
            f'max {mx[i]:.3e}')
  # NGS: iterations until the Box2D done flag (the while exit is bitwise
  # exact, so tile(all-done) IS the achievable trip count per tile)
  pi = dones.shape[-1]
  dflat = dones.reshape(-1, B, pi)
  first = np.where(dflat.any(-1), dflat.argmax(-1) + 1, pi)
  tile_all = first.max(1)
  print(f' NGS done per-world p50/p90/max: '
        f'{np.percentile(first, 50):5.1f} {np.percentile(first, 90):5.1f} '
        f'{first.max():3d} | tile(max over B) mean/p90/max: '
        f'{tile_all.mean():5.1f} {np.percentile(tile_all, 90):5.1f} '
        f'{tile_all.max():3d} (of {pi})')
  # batch-granular slot-skip payoff: fraction of (body, wall) velocity
  # blocks a tile must actually run (touch or warm impulse anywhere in B)
  frac = w_act.reshape(-1, *w_act.shape[2:]).mean(0)          # (n, nw)
  print(f' wall blocks active (any over B={B}): mean {frac.mean():.3f}')
  for wi in range(frac.shape[1]):
    print(f'  wall {wi}: per-body any-active rate '
          + ' '.join(f'{frac[i, wi]:.2f}' for i in range(frac.shape[0])))
  if p_act.shape[-1]:
    pf = p_act.reshape(-1, p_act.shape[-1]).mean(0)
    print(f' pair blocks active: ' + ' '.join(f'{v:.2f}' for v in pf))


if __name__ == '__main__':
  main()

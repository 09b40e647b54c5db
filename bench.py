"""Headline benchmark: batched env steps/sec on TPU (Urchin @ 4096 worlds).

Runs the data-collection hot path — physics step + LCD render + obs packing —
as one jitted scan over time, vmapped over worlds, on the real chip. Prints
ONE JSON line. Baseline: the reference collects ~1.7k env-steps/s/core on CPU
(BASELINE.md: 10k Bounce rollouts in ~5 min, single process).
"""
from __future__ import annotations

import json
import os
import time

# the real TPU (ambient JAX_PLATFORMS=axon); fall back to cpu if unavailable
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')

import jax
import jax.numpy as jnp
import numpy as np

import boxlcd_tpu
from boxlcd_tpu.envs.env import Env

REFERENCE_STEPS_PER_SEC = 1700.0  # examples/README.md:33 (CPU, single proc)


def main():
  B = int(os.environ.get('BENCH_WORLDS', 4096))
  T = int(os.environ.get('BENCH_STEPS', 50))
  # the fused Pallas solver is the default on TPU (+18% over the XLA scan
  # path, 454M vs 384M steps/s measured); BENCH_PALLAS=0 forces the jnp path
  use_pallas = bool(int(os.environ.get('BENCH_PALLAS', 1)))
  env = boxlcd_tpu.env_map['Urchin']()
  solver = None
  if use_pallas and jax.default_backend() != 'cpu':
    from boxlcd_tpu.engine.pallas_solver import make_batched_solver
    solver = make_batched_solver(env.spec)

  def one_chunk(states, key):
    """T env steps incl. observation (lcd render) per step."""
    from boxlcd_tpu.engine import physics

    def step(carry, k):
      states = carry
      acts = jax.random.uniform(k, (B, env.act_size), minval=-1, maxval=1)
      states = physics.step_world_batch(env.spec, states, acts,
                                        velocity_solver=solver)
      lcds = jax.vmap(lambda s: Env.observe(env, s)['lcd'])(states)
      return states, lcds.sum()  # consume obs so rendering isn't DCE'd
    keys = jax.random.split(key, T)
    states, sums = jax.lax.scan(step, states, keys)
    return states, sums.sum()

  jchunk = jax.jit(one_chunk)
  keys = jax.random.split(jax.random.PRNGKey(0), B)
  states = jax.jit(jax.vmap(lambda k: Env.reset(env, k)))(keys)

  # warmup/compile (fall back to the jnp solver if the kernel won't build)
  try:
    states, s = jchunk(states, jax.random.PRNGKey(1))
    jax.block_until_ready(s)
  except Exception as e:
    if solver is None:
      raise
    print(f'pallas solver failed ({type(e).__name__}); jnp fallback')
    solver = None
    jchunk = jax.jit(one_chunk)
    states, s = jchunk(states, jax.random.PRNGKey(1))
    jax.block_until_ready(s)

  t0 = time.time()
  iters = 3
  for i in range(iters):
    states, s = jchunk(states, jax.random.PRNGKey(2 + i))
  jax.block_until_ready(s)
  dt = time.time() - t0
  steps_per_sec = B * T * iters / dt

  print(json.dumps({
      'metric': 'env_steps_per_sec_urchin_4096',
      'value': round(steps_per_sec, 1),
      'unit': 'env-steps/s',
      'vs_baseline': round(steps_per_sec / REFERENCE_STEPS_PER_SEC, 2),
  }))


if __name__ == '__main__':
  main()

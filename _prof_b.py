import os, time
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
import jax, jax.numpy as jnp, numpy as np
import boxlcd_tpu
from boxlcd_tpu.envs.env import Env
from boxlcd_tpu.engine import mega

def timeit(f, *a, n=3):
    out = f(*a); np.asarray(out)
    best = 1e9
    for _ in range(n):
        t0 = time.time(); out = f(*a); np.asarray(out)
        best = min(best, time.time() - t0)
    return best

T = 50
env = boxlcd_tpu.env_map['Urchin']({'vel_iters': 8, 'pos_iters': 4})
spec = env.spec
n = spec.n
rollout = mega.make_rollout(spec, T)
for B in (8192, 16384, 32768):
  keys = jax.random.split(jax.random.PRNGKey(0), B)
  states0 = jax.jit(jax.vmap(lambda k: Env.reset(env, k)))(keys)
  ms = jnp.zeros((T, B, len(spec.j_parent)), jnp.float32)
  @jax.jit
  def full(states, ms, B=B):
    s2, traj = rollout(states, ms)
    ic = jnp.broadcast_to(states.is_circle[None], (T, B, n)).reshape(T*B, n)
    obs = jax.vmap(env.observe_pose)(ic, traj['c'].reshape(T*B, n, 2), traj['a'].reshape(T*B, n))
    return obs['lcd'].astype('float32').sum() + obs['full_state'].sum() + obs['proprio'].sum()
  t = timeit(full, states0, ms)
  print(f'B={B} full: {B*T/t/1e6:.2f}M steps/s ({t*1e3:.1f} ms)', flush=True)

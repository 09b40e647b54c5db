"""Test config: force CPU with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (the TPU analog of multi-node tests
without a cluster; see SURVEY.md §4).

The ambient environment pins JAX_PLATFORMS=axon AND a sitecustomize imports
jax at interpreter start, so env vars alone are latched too early — we must
update jax.config directly before any backend initializes."""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'host_platform_device_count' not in flags:
  os.environ['XLA_FLAGS'] = (
      flags + ' --xla_force_host_platform_device_count=8').strip()
# persistent compilation cache: the build host has one CPU core, so repeated
# test runs must not re-pay XLA compiles
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')
# pin the DEFAULT solver iterations to the fast config for suite runtime on
# the 1-core host — parity/golden tests that need the reference's 180/60
# pass --vel_iters/--pos_iters explicitly and are unaffected
os.environ.setdefault('BOXLCD_DEFAULT_ITERS', '8,4')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
try:
  jax.config.update('jax_num_cpu_devices', 8)
except Exception:
  pass  # older jax: XLA_FLAGS above covers it
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
try:
  jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)
except Exception:
  pass

"""Test config: force CPU with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (the TPU analog of multi-node tests
without a cluster; see SURVEY.md §4)."""
import os

# force CPU: the ambient environment pins JAX_PLATFORMS to the TPU tunnel,
# which must never be used for unit tests (single shared chip, remote compile)
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'host_platform_device_count' not in flags:
  os.environ['XLA_FLAGS'] = (
      flags + ' --xla_force_host_platform_device_count=8').strip()
# persistent compilation cache: the build host has one CPU core, so repeated
# test runs must not re-pay XLA compiles
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')

"""Device-resident dataset: the whole barrel store lives in HBM; training
samples (episode, window) batches ON DEVICE inside the jitted update scan.

This completes the BASELINE north star — datagen -> train as one pipeline
with zero host round-trips per step: the host uploads episodes once; every
train iteration's batch selection is a device-side gather. Essential on
remote-tunnel TPUs where per-dispatch upload latency dominates
(measured: host-fed chunks ~28 it/s; device-resident sampling removes the
per-step upload entirely).
"""
from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


class DeviceDataset:
  """All episodes on device; `sample(key, bs, window)` is pure/jittable."""

  def __init__(self, barrel_path, keys=('lcd', 'proprio', 'action'),
               max_episodes=None, pack_lcd=True):
    barrel_path = Path(barrel_path)
    files = sorted(barrel_path.glob('*.barrel.npz')) \
        + sorted(barrel_path.glob('*.tbarrel.npz'))
    assert files, f'no barrels at {barrel_path}'
    chunks = {k: [] for k in keys}
    total = 0
    self.lcd_w = None
    for f in files:
      with np.load(f, allow_pickle=True) as z:
        data = {k: z[k] for k in z.keys()}
      if 'lcd_packed' in data:
        from boxlcd_tpu.data import native
        data['lcd'] = native.unpack_frames(
            {'data': data.pop('lcd_packed'), 'shape': data.pop('lcd_shape')})
      for k in keys:
        arr = data[k]
        if k == 'lcd':
          self.lcd_w = arr.shape[-1]
          if pack_lcd and arr.shape[-1] % 8 == 0:
            # 1 bit/px in HBM and over the host link (8x less upload);
            # sample() unpacks the gathered windows on device
            arr = np.packbits(arr.astype(bool), axis=-1)
          else:
            arr = arr.astype(np.uint8)
        else:
          arr = arr.astype(np.float32)
        chunks[k].append(arr)
      total += data[keys[0]].shape[0]
      if max_episodes and total >= max_episodes:
        break
    self.data = {k: jnp.asarray(np.concatenate(v)) for k, v in chunks.items()}
    self.n_episodes = int(self.data[keys[0]].shape[0])
    self.ep_len = int(self.data[keys[0]].shape[1])

  def unpack_lcd(self, lcd):
    """Device-side np.unpackbits: (..., W/8) uint8 -> (..., W) float-able."""
    if self.lcd_w is None or lcd.shape[-1] == self.lcd_w:
      return lcd
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (lcd[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(*lcd.shape[:-1], self.lcd_w)

  def sample(self, key, bs, window, data=None):
    """Device-side batch: dict of (bs, window, ...) float32 arrays.

    Pass `data` explicitly inside jitted code (jit ARGUMENT, never a closure:
    captured arrays become multi-GB compile-time constants)."""
    data = self.data if data is None else data
    k1, k2 = jax.random.split(key)
    eps = jax.random.randint(k1, (bs,), 0, self.n_episodes)
    max_start = max(self.ep_len - window, 0)
    starts = jax.random.randint(k2, (bs,), 0, max_start + 1) \
        if max_start > 0 else jnp.zeros(bs, jnp.int32)

    def gather(k, arr):
      def one(e, s):
        ep = arr[e]  # (T, ...)
        return jax.lax.dynamic_slice_in_dim(ep, s, window, axis=0)
      out = jax.vmap(one)(eps, starts)
      if k == 'lcd':
        out = self.unpack_lcd(out)
      return out.astype(jnp.float32)

    return {k: gather(k, v) for k, v in data.items()}


def make_device_trainer(model, ds: DeviceDataset, bs, window, chunk,
                        matmul_precision='bfloat16'):
  """One-dispatch training: `step(params, opt_state, key)` runs `chunk`
  update steps, sampling every batch on device."""
  import optax

  def run_chunk(params, opt_state, key, data):
    def body(carry, k):
      params, opt_state = carry
      k_s, k_l = jax.random.split(k)
      batch = ds.sample(k_s, bs, window, data)
      (loss, metrics), grads = jax.value_and_grad(
          model.loss_fn, has_aux=True)(params, batch, k_l)
      updates, opt_state = model.opt.update(grads, opt_state, params)
      params = optax.apply_updates(params, updates)
      return (params, opt_state), metrics

    # bf16 MXU matmuls: measured 9-20x faster than float32 on BVAE/FBT with
    # loss trajectories matching to ~1e-3 (the NaNs once blamed on bf16 were
    # the p*log(p) entropy form; see quantize.py). Pass 'float32' to narrow
    # numerics questions.
    with jax.default_matmul_precision(matmul_precision):
      (params, opt_state), metrics = jax.lax.scan(
          body, (params, opt_state), jax.random.split(key, chunk))
    return params, opt_state, jax.tree_util.tree_map(lambda x: x[-1], metrics)

  return jax.jit(run_chunk)


def train_device(model, ds, total_itr, bs, window, chunk=100, log_every=None,
                 logger_cb=None, data=None, save_dir=None, save_every=300):
  """Drive run_chunk until total_itr; returns final metrics. `data` overrides
  ds.data (e.g. a {'z', 'action'} dict of precomputed latents).

  Resumes from model.step (set by Net.load — full checkpoints carry the
  step counter, SURVEY §5.4) and, when save_dir is given, checkpoints every
  save_every seconds so a killed run loses at most that much progress (the
  save materializes params on host, which also bounds the async-dispatch
  queue)."""
  data = ds.data if data is None else data
  step = make_device_trainer(model, ds, bs, window, chunk)
  itr = int(getattr(model, 'step', 0))
  if itr:
    print(f'[device-train] resuming at step {itr}', flush=True)
  # fold the start step into the stream so a resumed run does not replay the
  # same batch-sampling key sequence it already consumed
  key = jax.random.fold_in(jax.random.PRNGKey(0), itr)
  base = itr
  metrics = {}
  import time
  t0 = time.time()
  last_save = t0
  while itr < total_itr:
    key, k = jax.random.split(key)
    model.params, model.opt_state, metrics = step(model.params,
                                                  model.opt_state, k, data)
    itr += chunk
    model.step = itr
    if log_every and itr % log_every < chunk:
      rate = (itr - base) / (time.time() - t0)
      line = {k2: float(v) for k2, v in metrics.items()}
      print(f'[device-train] itr {itr} ({rate:,.0f} it/s) {line}', flush=True)
      if logger_cb:
        logger_cb(itr, line)
    if save_dir is not None and time.time() - last_save > save_every:
      model.save(save_dir)
      last_save = time.time()
  return metrics

"""On-device batched rollout collection into barrel shards.

The TPU-native replacement for the reference's data collection
(reference: research/data.py:24-79): instead of one OS process per env with
shared-memory obs transport, a single jitted program `vmap`s reset/step over
a worlds axis and `lax.scan`s over time, producing whole [B, T, ...] episode
tensors on device. The host only writes the finished barrels.

Barrel layout matches the reference exactly (data.py:50-77): npz
`{timestamp}-{ep_len}.barrel.npz` with `action` [1000, T, act] plus one entry
per obs key [1000, T, ...], recorded as (o_t, a_t) pairs where the final
action is meaningless.
"""
from __future__ import annotations

import time
from datetime import datetime
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from boxlcd_tpu.data.dataset import BARREL_SIZE
from boxlcd_tpu.envs.env import Env


def make_rollout_fn(env, policy_fn=None, pack_lcd=False):
  """Build a jitted (key, batch) -> dict of [B, T, ...] episode arrays.

  policy_fn(key, obs_dict) -> action; defaults to uniform random actions
  (the reference's collection policy, data.py:57). pack_lcd packs frame bits
  into uint8 on device (shape [..., W//8], np.unpackbits layout) — the host
  link is the datagen bottleneck and lcd is ~90% of the payload.
  """
  T = int(env.G.ep_len)
  act_size = env.act_size
  pack_lcd = pack_lcd and env.lcd_w % 8 == 0
  bitw = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.int32)

  if policy_fn is None:
    def policy_fn(key, obs):
      return jax.random.uniform(key, (act_size,), minval=-1.0, maxval=1.0)

  def one_episode(key):
    # use the functional core explicitly (WorldEnv overrides reset/step with
    # the stateful gym-style API)
    k_reset, k_run = jax.random.split(key)
    state = Env.reset(env, k_reset)

    def step(carry, k):
      state = carry
      obs = Env.observe(env, state)
      act = policy_fn(k, obs)
      nstate = Env.step(env, state, act)[0]
      out = {**obs, 'action': act}
      # binary frames travel the (slow) host link as 1 byte/px, not float32
      lcd = out['lcd'].astype(jnp.uint8)
      if pack_lcd:  # 1 BIT/px: 8 pixels per byte along W
        lcd = (lcd.reshape(*lcd.shape[:-1], -1, 8).astype(jnp.int32)
               * bitw).sum(-1).astype(jnp.uint8)
      out['lcd'] = lcd
      return nstate, out

    _, traj = jax.lax.scan(step, state, jax.random.split(k_run, T))
    return traj

  def rollout_keys(keys):
    return jax.vmap(one_episode)(keys)

  def batch_rollout(key, batch_size):
    return rollout_keys(jax.random.split(key, batch_size))

  batch_rollout.keys_fn = rollout_keys  # pre-split-keys form (for sharding)
  return batch_rollout, T


def make_mega_rollout_fn(env, pack_lcd=False, interpret=False, chunk=None):
  """Megakernel-backed random-policy collection (engine/mega.py): all
  physics for an episode runs as ONE Pallas program (traj poses + motor
  speeds stream via per-step DMA, so VMEM no longer caps the chunk length),
  then render/traj_raster.py rasterizes exact LCD frames straight from the
  pose tiles. ~100x fewer kernel launches than the per-step scan (the
  measured datagen bottleneck on this stack — PROGRESS.md round 3); the
  SAME path bench.py times. Same (o_t, a_t) barrel layout as
  make_rollout_fn."""
  from boxlcd_tpu.engine import mega
  from boxlcd_tpu.render import traj_raster
  spec = env.spec
  T = int(env.G.ep_len)
  act_size = env.act_size
  n = spec.n
  pack_lcd = pack_lcd and env.lcd_w % 8 == 0
  bitw = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.int32)
  has_act = jnp.asarray(spec.j_act >= 0)
  a_idx = np.maximum(spec.j_act, 0)
  j_speed = jnp.asarray(spec.j_speed)
  chunk = int(chunk or T)
  sizes = []
  s = 0
  while s < T:
    sizes.append(min(chunk, T - s))
    s += chunk
  rollouts = {c: mega.make_rollout(spec, c, interpret=interpret)
              for c in set(sizes)}
  # exact LCD frames straight from the megakernel pose tiles (no transpose
  # / per-body packing glue); bit-equality vs the XLA path is asserted by
  # tests/test_traj_raster.py AND re-checked in-graph by the tripwire below
  use_tr = (traj_raster.supports(spec) and env.lcd_w <= 32
            and str(env.G.get('raster', 'exact')) == 'exact')
  if use_tr:
    trenders = {c: traj_raster.make_traj_render(
        spec, env.lcd_w, env.lcd_h, c, interpret=interpret)
        for c in set(sizes)}
    trender1 = traj_raster.make_traj_render(
        spec, env.lcd_w, env.lcd_h, 1, interpret=interpret)

  def rollout_keys(keys):
    B = keys.shape[0]
    pad = (-B) % mega.BLOCK
    Bp = B + pad
    if pad:  # tile keys up to the block size (padding worlds are discarded)
      reps = -(-Bp // B)
      kp = jnp.concatenate([keys] * reps)[:Bp]
    else:
      kp = keys
    kr, ka = jax.vmap(jax.random.split, out_axes=1)(kp)
    states = jax.vmap(lambda k: Env.reset(env, k))(kr)
    acts = jax.vmap(lambda k: jax.random.uniform(
        k, (T, act_size), minval=-1.0, maxval=1.0), out_axes=1)(ka)
    ms = jnp.where(has_act[None, None],
                   jnp.clip(acts, -1, 1)[:, :, a_idx] * j_speed[None, None],
                   0.0)
    # o_t is the pose BEFORE action t: reset pose, then post-step poses
    # 0..T-2 (the final action in a barrel is meaningless — data.py:50-77)
    cs = [states.c[None]]
    as_ = [states.a[None]]
    tiles = []
    st = states
    off = 0
    for c in sizes:
      st, traj = rollouts[c](st, ms[off:off + c])
      cs.append(traj['c'])
      as_.append(traj['a'])
      if use_tr:
        tiles.append(traj['tiles'])
      off += c
    cs = jnp.concatenate(cs)[:T]                       # (T, Bp, n, 2)
    as_ = jnp.concatenate(as_)[:T]                     # (T, Bp, n)
    ic = jnp.broadcast_to(states.is_circle[None], (T, Bp, n))
    if use_tr:
      # o_t = pose BEFORE action t: render the reset pose as a 1-step tile,
      # then the post-step poses 0..T-2 from the megakernel's own stream
      c0 = mega._to_tiles(states.c, Bp)                # (n, 2, G, L)
      a0 = mega._to_tiles(states.a, Bp)                # (n, G, L)
      tile0 = jnp.concatenate([c0, a0[:, None]], axis=1)[None]
      rows = jnp.concatenate(
          [trender1(tile0, states.is_circle)]
          + [trenders[c](tl, states.is_circle) for c, tl in
             zip(sizes, tiles)])[:T]                    # (T, H, G, L)
      lcd_tb = traj_raster.rows_to_lcd(rows, env.lcd_w)  # (T, Bp, H, W)
      obs = jax.vmap(lambda i, c, a: env.observe_pose(i, c, a, lcd=False))(
          ic.reshape(T * Bp, n), cs.reshape(T * Bp, n, 2),
          as_.reshape(T * Bp, n))
      obs = dict(obs, lcd=lcd_tb.reshape(T * Bp, env.lcd_h, env.lcd_w))
    else:
      obs = jax.vmap(env.observe_pose)(
          ic.reshape(T * Bp, n), cs.reshape(T * Bp, n, 2),
          as_.reshape(T * Bp, n))
    # Silent-corruption tripwire: the batched Pallas raster miscompiles at
    # large grids on some runtimes (round-3: grids >= ~1856 programs return
    # deterministic garbage with NO error, which poisoned a whole headline
    # dataset). Re-render a spread of frames through the plain-XLA
    # single-world path (bit-identical by test contract) and compare; the
    # host raises before writing any barrel if they differ.
    from boxlcd_tpu.render import raster as _raster
    chk = np.linspace(0, T * Bp - 1, 16).astype(np.int64)
    want = jax.vmap(lambda icc, cc, aa: _raster._lcd_render_single(
        spec, icc, cc, aa, env.lcd_w, env.lcd_h))(
            ic.reshape(T * Bp, n)[chk], cs.reshape(T * Bp, n, 2)[chk],
            as_.reshape(T * Bp, n)[chk])
    obs_ok = jnp.all(obs['lcd'][chk] == want)
    out = {}
    for k, v in obs.items():
      v = v.reshape(T, Bp, *v.shape[1:])
      out[k] = jnp.swapaxes(v, 0, 1)[:B]               # [B, T, ...]
    lcd = out['lcd'].astype(jnp.uint8)
    if pack_lcd:
      lcd = (lcd.reshape(*lcd.shape[:-1], -1, 8).astype(jnp.int32)
             * bitw).sum(-1).astype(jnp.uint8)
    out['lcd'] = lcd
    out['action'] = jnp.swapaxes(acts, 0, 1)[:B]
    out['obs_ok'] = obs_ok
    return out

  def batch_rollout(key, batch_size):
    return rollout_keys(jax.random.split(key, batch_size))

  batch_rollout.keys_fn = rollout_keys
  return batch_rollout, T


def rollout_batch(env, key, batch_size, policy_fn=None):
  """Convenience: one jitted batch of episodes as numpy arrays."""
  fn, _ = make_rollout_fn(env, policy_fn)
  traj = jax.jit(fn, static_argnums=1)(key, batch_size)
  return jax.tree_util.tree_map(np.asarray, traj)


def fill_barrels(env, num_barrels, prefix, G, key, batch_size=None):
  """Fill `num_barrels` shards of BARREL_SIZE episodes each."""
  logdir = Path(G.logdir) / prefix
  logdir.mkdir(parents=True, exist_ok=True)
  # resume-aware: a rerun after a transient device fault only collects the
  # missing barrels (shards are self-contained, so partial sets are valid)
  existing = len(list(logdir.glob('*.barrel.npz'))) \
      + len(list(logdir.glob('*.tbarrel.npz')))
  if existing >= num_barrels:
    print(f'[collect] {prefix}: {existing} barrels already present, skipping')
    return key
  num_barrels -= existing
  if existing:  # decorrelate the resumed episodes from the ones on disk
    key = jax.random.fold_in(key, existing)
    print(f'[collect] {prefix}: resuming, {num_barrels} barrels to go')
  batch_size = batch_size or int(G.get('num_envs', 0)) or 250
  # batches larger than one barrel amortize the per-dispatch host-link
  # round-trip (measured ~3 s fixed cost regardless of 38 vs 112 MB payload)
  # across several output files
  if batch_size >= BARREL_SIZE:
    assert batch_size % BARREL_SIZE == 0, \
        f'batch size {batch_size} must be a multiple of {BARREL_SIZE}'
    per_dispatch, reps = batch_size // BARREL_SIZE, 1
  else:
    assert BARREL_SIZE % batch_size == 0, \
        f'batch size {batch_size} must divide barrel size {BARREL_SIZE}'
    per_dispatch, reps = 1, BARREL_SIZE // batch_size
  mesh_spec = str(G.get('mesh', '') or '')
  use_mega = False
  if not mesh_spec and jax.default_backend() not in ('cpu',):
    from boxlcd_tpu.engine import mega
    use_mega = mega.supports(env.spec) \
        and bool(int(G.get('collect_mega', 1)))
  if use_mega:
    fn, T = make_mega_rollout_fn(env, pack_lcd=True)
  else:
    fn, T = make_rollout_fn(env, pack_lcd=True)
  if mesh_spec:
    # shard the worlds axis over the device mesh: each chip rolls out its
    # slice of the env batch; the rollout itself needs no cross-chip comms
    assert mesh_spec.startswith('dp'), f'unsupported mesh {mesh_spec!r}'
    ndev = int(mesh_spec[2:])
    assert batch_size % ndev == 0, \
        f'collect batch {batch_size} must divide over {ndev} devices'
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mesh = Mesh(np.array(jax.devices()[:ndev]).reshape(ndev, 1),
                ('dp', 'tp'))
    bshard = NamedSharding(mesh, P('dp'))
    jkeys = jax.jit(fn.keys_fn, in_shardings=(bshard,), out_shardings=bshard)

    def jfn(key, bs):
      keys = jax.device_put(jax.random.split(key, bs), bshard)
      return jkeys(keys)
  else:
    jfn = jax.jit(fn, static_argnums=1)

  def write_barrel(traj, bi):
    action = traj.pop('action')
    lcd = traj.pop('lcd')
    timestamp = datetime.now().strftime('%Y%m%dT%H%M%S')
    if G.get('barrel_format', 'npz') == 'native':
      # bit-packed + xor-delta LCD via the C++ codec (~8x smaller payload);
      # stored uncompressed — zlib on the single-core host would dominate
      # the whole datagen pipeline otherwise
      from boxlcd_tpu.data import native
      if lcd.shape[-1] != env.lcd_w:
        # device-packed bits (MSB-first along W = the pack_bits layout):
        # feed the codec directly — unpack->repack on the 1-core host costs
        # seconds per barrel and starves the TPU tunnel relay alongside
        blob = native.pack_frames_packed(
            lcd, (*lcd.shape[:-1], env.lcd_w))
      else:
        blob = native.pack_frames(lcd.astype(bool))
      np.savez(logdir / f'{timestamp}-{bi:05d}-{T}.tbarrel',
               action=action, lcd_packed=blob['data'],
               lcd_shape=blob['shape'], **traj)
    else:
      if lcd.shape[-1] != env.lcd_w:  # device-packed bits -> full frames
        lcd = np.unpackbits(lcd, axis=-1)
      np.savez_compressed(logdir / f'{timestamp}-{bi:05d}-{T}.barrel',
                          action=action, lcd=lcd.astype(bool), **traj)

  def collect_chunk(sub):
    # once a dispatch fails with INVALID_ARGUMENT the process's tunnel
    # session is poisoned — every later dispatch fails too, including a
    # freshly compiled different executable (round-3 chain log). One quick
    # retry covers genuinely transient cases; after that, die fast so the
    # caller's process-level retry restarts with a clean session (resume
    # re-collects only the missing barrels, with a fold_in'd key).
    from boxlcd_tpu.utils import retry_transient
    traj = retry_transient(
        lambda: jax.tree_util.tree_map(np.asarray, jfn(sub, batch_size)),
        label='collect chunk', attempts=2, sleep_s=10)
    ok = traj.pop('obs_ok', None)
    if ok is not None and not bool(ok):
      raise RuntimeError(
          'collect: device LCD render does not match the XLA reference '
          'path — silent raster corruption (see pallas_raster.MAX_GRID); '
          'refusing to write barrels')
    return traj

  bi = 0
  while bi < num_barrels:
    chunks = []
    t0 = time.time()
    for r in range(reps):
      key, sub = jax.random.split(key)
      chunks.append(collect_chunk(sub))
    traj = chunks[0] if reps == 1 else \
        jax.tree_util.tree_map(lambda *xs: np.concatenate(xs), *chunks)
    n = min(per_dispatch, num_barrels - bi)
    fps = n * BARREL_SIZE * T / (time.time() - t0)
    for j in range(n):
      sl = slice(j * BARREL_SIZE, (j + 1) * BARREL_SIZE)
      write_barrel({k: v[sl] for k, v in traj.items()}, bi + j)
    bi += n
    print(f'[collect] {prefix} barrel {bi}/{num_barrels} '
          f'({fps:,.0f} env-steps/s)')
  return key


def collect(env_thunk, G):
  """Entry point mirroring the reference CLI mode (research/main.py:72-74).
  env_thunk: zero-arg callable producing the env."""
  start = time.time()
  G.logdir.mkdir(parents=True, exist_ok=True)
  env = env_thunk()
  key = jax.random.PRNGKey(int(G.get('seed', 0)))
  key = fill_barrels(env, int(G.test_barrels), 'test', G, key)
  fill_barrels(env, int(G.train_barrels), 'train', G, key)
  print('TOTAL COLLECT TIME', time.time() - start)

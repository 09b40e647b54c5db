"""Data pipeline tests: rollout shapes, barrel layout parity, window sampling."""
import numpy as np
import pytest

import boxlcd_tpu


def test_rollout_and_barrels(tmp_path):
  import jax
  from boxlcd_tpu.data.collect import fill_barrels, make_rollout_fn
  from boxlcd_tpu.data.dataset import BARREL_SIZE, RolloutDataset
  from boxlcd_tpu.utils import AttrDict

  env = boxlcd_tpu.env_map['Dropbox']()
  fn, T = make_rollout_fn(env)
  traj = jax.jit(fn, static_argnums=1)(jax.random.PRNGKey(0), 8)
  assert traj['lcd'].shape == (8, T, env.lcd_h, env.lcd_w)
  assert traj['action'].shape == (8, T, env.act_size)
  assert traj['full_state'].shape == (8, T, env.obs_size)
  # obs must stay in the normalized range contract
  fs = np.asarray(traj['full_state'])
  assert fs.min() >= -1.5 and fs.max() <= 1.5

  # barrels in the reference layout
  G = AttrDict(logdir=tmp_path, num_envs=250, ep_len=env.G.ep_len)
  fill_barrels(env, 1, 'train', G, jax.random.PRNGKey(1), batch_size=250)
  files = list((tmp_path / 'train').glob('*.barrel.npz'))
  assert len(files) == 1
  with np.load(files[0]) as z:
    assert z['lcd'].shape == (BARREL_SIZE, T, env.lcd_h, env.lcd_w)
    assert z['lcd'].dtype == bool
    assert set(z.keys()) == {'action', 'lcd', 'proprio', 'full_state'}

  ds = RolloutDataset(tmp_path / 'train', window=10)
  batch = next(ds.batches(16))
  assert batch['lcd'].shape == (16, 10, env.lcd_h, env.lcd_w)
  assert batch['lcd'].dtype == np.float32
  assert batch['lcd'].max() <= 1.0 and batch['lcd'].min() >= 0.0


def test_native_barrel_codec():
  from boxlcd_tpu.data.native import pack_frames, unpack_frames
  rng = np.random.RandomState(3)
  frames = rng.rand(4, 25, 16, 32) > 0.8
  blob = pack_frames(frames)
  assert blob['data'].nbytes * 8 == frames.size
  rec = unpack_frames(blob)
  assert (rec == frames).all()


def test_native_codec_prepacked():
  """pack_frames_packed (device-packed input) must be bitwise-identical to
  pack_frames (bool input) — collect feeds the codec device-packed bits
  directly, skipping the host unpack->repack round-trip."""
  from boxlcd_tpu.data.native import (pack_frames, pack_frames_packed,
                                      unpack_frames)
  rng = np.random.RandomState(7)
  frames = rng.rand(5, 13, 16, 32) > 0.6
  bitw = np.array([128, 64, 32, 16, 8, 4, 2, 1], np.int32)
  packed = (frames.reshape(*frames.shape[:-1], -1, 8)
            * bitw).sum(-1).astype(np.uint8)   # the collect.py device layout
  a = pack_frames(frames)
  b = pack_frames_packed(packed, frames.shape)
  assert (a['data'] == b['data']).all()
  assert (a['shape'] == b['shape']).all()
  assert (unpack_frames(b) == frames).all()


def test_device_dataset_packed_lcd(tmp_path):
  """Bit-packed HBM storage must sample identically to byte storage."""
  import jax
  from boxlcd_tpu.data.collect import fill_barrels
  from boxlcd_tpu.data.device_dataset import DeviceDataset
  from boxlcd_tpu.utils import AttrDict

  env = boxlcd_tpu.env_map['Dropbox']()
  G = AttrDict(logdir=tmp_path, num_envs=250, ep_len=env.G.ep_len,
               test_barrels=0, barrel_format='native')
  fill_barrels(env, 1, 'train', G, jax.random.PRNGKey(0))
  packed = DeviceDataset(tmp_path / 'train', pack_lcd=True)
  plain = DeviceDataset(tmp_path / 'train', pack_lcd=False)
  assert packed.data['lcd'].shape[-1] * 8 == plain.data['lcd'].shape[-1]
  bp = packed.sample(jax.random.PRNGKey(1), 4, 3)
  bu = plain.sample(jax.random.PRNGKey(1), 4, 3)
  for k in bp:
    assert (np.asarray(bp[k]) == np.asarray(bu[k])).all(), k

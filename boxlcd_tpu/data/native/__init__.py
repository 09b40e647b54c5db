"""ctypes bindings for the native barrelpack codec (built on first use)."""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / 'barrelpack.so'
_lib = None


def _build():
  src = _DIR / 'barrelpack.cc'
  subprocess.check_call(['g++', '-O3', '-shared', '-fPIC', '-o', str(_SO),
                         str(src)])


def lib():
  global _lib
  if _lib is None:
    if not _SO.exists() or _SO.stat().st_mtime < (_DIR / 'barrelpack.cc').stat().st_mtime:
      _build()
    _lib = ctypes.CDLL(str(_SO))
    _lib.pack_bits.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                               ctypes.c_char_p]
    _lib.unpack_bits.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                 ctypes.c_char_p]
    _lib.xor_delta_encode.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                      ctypes.c_size_t, ctypes.c_char_p]
    _lib.xor_delta_encode.restype = ctypes.c_size_t
    _lib.xor_delta_decode.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                      ctypes.c_size_t, ctypes.c_char_p]
    _lib.xor_delta_decode.restype = ctypes.c_size_t
  return _lib


def _cptr(a):
  return a.ctypes.data_as(ctypes.c_char_p)


def pack_frames(frames: np.ndarray) -> dict:
  """frames: (..., T, H, W) bool -> dict with packed bytes + shape."""
  frames = np.ascontiguousarray(frames, np.uint8)
  shape = frames.shape
  T = shape[-3]
  frame_bits = shape[-2] * shape[-1]
  assert frame_bits % 8 == 0, 'LCD frames are byte-aligned (H*W % 8 == 0)'
  frame_bytes = frame_bits // 8
  L = lib()
  flat = frames.reshape(-1)
  packed = np.empty(flat.size // 8, np.uint8)
  L.pack_bits(_cptr(flat), flat.size, _cptr(packed))  # one call, byte-aligned
  n_vids = int(np.prod(shape[:-3])) if len(shape) > 3 else 1
  vids = np.ascontiguousarray(packed.reshape(n_vids, T, frame_bytes))
  enc = np.empty_like(vids)
  for v in range(n_vids):
    L.xor_delta_encode(_cptr(vids[v]), T, frame_bytes, _cptr(enc[v]))
  return {'data': enc, 'shape': np.array(shape, np.int64)}


def pack_frames_packed(packed: np.ndarray, shape) -> dict:
  """Like pack_frames but for frames ALREADY bit-packed on device
  (boxlcd_tpu.data.collect packs MSB-first along W, the same layout
  pack_bits produces): skips the unpack->repack round-trip, which on the
  1-core host costs seconds per barrel and starves the TPU tunnel relay.
  packed: (..., T, H, W//8) uint8; shape: the logical bool frame shape
  (..., T, H, W)."""
  shape = tuple(int(x) for x in shape)
  T = shape[-3]
  frame_bytes = shape[-2] * shape[-1] // 8
  L = lib()
  n_vids = int(np.prod(shape[:-3])) if len(shape) > 3 else 1
  vids = np.ascontiguousarray(
      packed.reshape(n_vids, T, frame_bytes), np.uint8)
  enc = np.empty_like(vids)
  for v in range(n_vids):
    L.xor_delta_encode(_cptr(vids[v]), T, frame_bytes, _cptr(enc[v]))
  return {'data': enc, 'shape': np.array(shape, np.int64)}


def unpack_frames(blob: dict) -> np.ndarray:
  shape = tuple(int(x) for x in blob['shape'])
  T = shape[-3]
  frame_bits = shape[-2] * shape[-1]
  frame_bytes = (frame_bits + 7) // 8
  enc = np.ascontiguousarray(blob['data'], np.uint8)
  n_vids = enc.shape[0]
  L = lib()
  vids = np.empty_like(enc)
  for v in range(n_vids):
    L.xor_delta_decode(_cptr(enc[v]), T, frame_bytes, _cptr(vids[v]))
  flat = vids.reshape(-1)
  out = np.empty(flat.size * 8, np.uint8)
  L.unpack_bits(_cptr(flat), out.size, _cptr(out))
  return out.reshape(shape).astype(bool)

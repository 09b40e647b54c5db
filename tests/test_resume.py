"""mode=train auto-resume: a rerun into the same logdir continues from the
checkpoint instead of restarting (the chunked / timeout-sliced training the
round-5 evidence chains rely on; reference has no equivalent — its Trainer
never checkpoints optimizer state, research/nets/_base.py:26-39)."""
import pickle

import jax
import numpy as np

import boxlcd_tpu
from tests.test_dp8_chain import _write_tiny_barrels


def _step_of(pkl):
  with open(pkl, 'rb') as f:
    return int(pickle.load(f).get('step', 0))


def _train(datadir, logdir, total_itr):
  from research.main import main as rmain
  # pin the dispatch chunk: train_device advances in whole chunks, so a
  # chunk that does not divide (total_itr - resume_step) overshoots by up
  # to chunk-1 steps (immaterial at the production 100/100k ratio, but it
  # would make the exact-step asserts below flaky)
  rmain([
      '--mode=train', '--model=BVAE', '--env=Dropbox',
      f'--datadir={datadir}', f'--logdir={logdir}',
      f'--total_itr={total_itr}', '--bs=8', '--window=5', '--log_n=1000',
      '--hidden_size=32', '--nfilter=8', '--vqK=16', '--vqD=8',
      '--device_dataset=1', '--steps_per_dispatch=4',
  ])


def test_device_train_resumes_from_checkpoint(tmp_path):
  env = boxlcd_tpu.env_map['Dropbox']()
  data = tmp_path / 'data'
  _write_tiny_barrels(env, data / 'train', 16, seed=0)

  logdir = tmp_path / 'bvae'
  _train(data, logdir, 8)
  pkl = logdir / 'BVAE.pkl'
  assert _step_of(pkl) == 8
  with open(pkl, 'rb') as f:
    params_8 = pickle.load(f)['params']

  # rerun with a larger budget: must RESUME at 8 and train only 8 more
  _train(data, logdir, 16)
  assert _step_of(pkl) == 16
  with open(pkl, 'rb') as f:
    blob = pickle.load(f)
  assert blob['params'] != params_8  # training actually continued
  # opt_state round-trips (full resume, not params-only)
  assert 'opt_state' in blob and 'key' in blob

  # rerun with the SAME budget: resume sees step==total_itr, trains zero
  # steps, and the checkpoint is untouched
  _train(data, logdir, 16)
  assert _step_of(pkl) == 16

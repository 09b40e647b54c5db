"""Physics-parity regression floors vs the pybox2d oracle (SURVEY §7).

Thresholds are pinned ~30-40% above values measured by
research/scripts/parity_table.py (table in PARITY.md): time-to-epsilon
divergence (eps = half an LCD pixel), episode mean pointwise error, and the
episode pose-distribution Wasserstein-1. The oracle always runs the
reference's 180/60 solver iterations (boxLCD/world_env.py:446-452); our
engine runs at the 8/4 default AND at matched 180/60 — the 180/60 rows are
the fidelity contract, the 8/4 rows pin the documented speed/accuracy
trade-off from regressing further.
"""
import numpy as np
import pytest

from tests.oracle import HAVE_BOX2D
from tests.parity import env_parity

pytestmark = pytest.mark.skipif(not HAVE_BOX2D, reason='pybox2d required')

SEEDS = (0, 1)

# env, iters, steps, min t_eps, max mean_err, max W1
TABLE = [
    ('Dropbox', (8, 4), 50, 40.0, 0.06, 0.04),
    ('Dropbox', (180, 60), 50, 40.0, 0.06, 0.04),
    ('Bounce', (8, 4), 50, 6.0, 0.25, 0.08),
    ('Object3', (8, 4), 50, 3.0, 1.6, 0.55),
    ('Urchin', (8, 4), 30, 1.0, 2.4, 0.95),
    ('Urchin', (180, 60), 30, 3.0, 2.0, 0.75),
    ('Luxo', (180, 60), 30, 4.0, 1.8, 0.65),
    ('Crab', (180, 60), 30, 1.0, 3.5, 1.6),
]

PASSIVE = {'Dropbox', 'Bounce', 'Bounce2', 'Object2', 'Object3'}


@pytest.mark.parametrize('env_name,iters,steps,min_teps,max_err,max_w1',
                         TABLE)
def test_divergence_floor(env_name, iters, steps, min_teps, max_err, max_w1):
  m = env_parity(env_name, steps, seeds=SEEDS,
                 actuated=env_name not in PASSIVE, iters=iters)
  assert m['t_eps'] >= min_teps, f'{env_name}{iters}: t_eps {m}'
  assert m['mean_err'] <= max_err, f'{env_name}{iters}: mean_err {m}'
  assert m['w1_pose'] <= max_w1, f'{env_name}{iters}: w1 {m}'


@pytest.mark.parametrize('morph', ['Walker', 'Gingy', 'Octo', 'SpiderCube'])
def test_morphology_smoke_golden(morph):
  """Every remaining morphology steps against the oracle without exploding:
  finite, bounded distribution distance, sane first-step agreement."""
  from tests.parity import rollout_pair, divergence_metrics
  ours, theirs = rollout_pair(morph, 10, seed=0, actuated=True,
                              iters=(180, 60))
  m = divergence_metrics(ours, theirs)
  a = np.stack([o[0] for o in ours])
  assert np.isfinite(a).all(), f'{morph}: non-finite poses'
  assert np.abs(a).max() < 50, f'{morph}: exploded ({np.abs(a).max():.1f} m)'
  errs = [np.abs(o[0] - t[0]).max() for o, t in zip(ours, theirs)]
  assert errs[0] < 0.5, f'{morph}: step-0 err {errs[0]:.3f}'
  assert m['w1_pose'] < 1.5, f'{morph}: w1 {m["w1_pose"]:.3f}'

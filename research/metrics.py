"""Evaluation metrics in jnp: SSIM, PSNR, FID (Frechet), precision/recall.

Replaces the reference's metric stack (pytorch-ignite SSIM/PSNR at
nets/_base.py:11-12, scipy-based FID at research/utils.py:259-278, manifold
precision/recall at research/utils.py:288-314, arXiv 1904.06991) with pure
JAX implementations (eigh-based matrix sqrt instead of scipy fractional
matrix power).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel(size=11, sigma=1.5):
  x = jnp.arange(size) - size // 2
  g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
  g = g / g.sum()
  return jnp.outer(g, g)


def ssim(pred, target, data_range=1.0, ksize=11, sigma=1.5):
  """Mean SSIM over a batch; inputs (B, C, H, W) or (B, H, W)."""
  if pred.ndim == 3:
    pred, target = pred[:, None], target[:, None]
  pred = pred.astype(jnp.float32)
  target = target.astype(jnp.float32)
  kernel = _gaussian_kernel(ksize, sigma)[None, None]     # (1,1,k,k)
  B, C, H, W = pred.shape

  def filt(x):
    x = x.reshape(B * C, 1, H, W)
    y = jax.lax.conv_general_dilated(x, kernel, (1, 1), 'VALID')
    return y.reshape(B, C, *y.shape[2:])

  c1 = (0.01 * data_range) ** 2
  c2 = (0.03 * data_range) ** 2
  mu_p, mu_t = filt(pred), filt(target)
  mu_p2, mu_t2, mu_pt = mu_p ** 2, mu_t ** 2, mu_p * mu_t
  s_p = filt(pred * pred) - mu_p2
  s_t = filt(target * target) - mu_t2
  s_pt = filt(pred * target) - mu_pt
  num = (2 * mu_pt + c1) * (2 * s_pt + c2)
  den = (mu_p2 + mu_t2 + c1) * (s_p + s_t + c2)
  return (num / den).mean()


def psnr(pred, target, data_range=1.0):
  mse = ((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2).mean()
  return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-10))


def _sqrtm_psd(mat):
  """Matrix square root of a PSD matrix via eigendecomposition (numpy)."""
  w, v = np.linalg.eigh(mat)
  w = np.maximum(w, 0.0)
  return (v * np.sqrt(w)[None]) @ v.T


def fid(feats_a, feats_b):
  """Frechet distance between two feature sets (B, D).

  (reference: research/utils.py:259-278 — the "FVD" number when feats come
  from the temporal arbiter.) Host numpy in float64: the f32 eigh sqrtm
  drifts enough on near-singular 256x256 covariances to print negative
  FVDs; this is aggregation code called once per eval rep, not a hot path.

  DELIBERATE deviation from the reference: the mean-difference term uses
  .sum() (the standard Frechet form) where the reference's compute_fid uses
  .mean() (utils.py:265-277), so absolute values differ from
  reference-reported FVDs by up to a factor of D=256 on that term. Relative
  comparisons within either codebase are unaffected.
  """
  feats_a = np.asarray(feats_a, np.float64)
  feats_b = np.asarray(feats_b, np.float64)
  mu_a, mu_b = feats_a.mean(0), feats_b.mean(0)
  ca = np.cov(feats_a, rowvar=False)
  cb = np.cov(feats_b, rowvar=False)
  rb = _sqrtm_psd(cb)
  csqrt = _sqrtm_psd(rb @ ca @ rb)
  val = ((mu_a - mu_b) ** 2).sum() + np.trace(ca + cb - 2 * csqrt)
  return np.maximum(val, 0.0)


def precision_recall_f1(real_feats, fake_feats, k=3):
  """Manifold precision/recall (arXiv 1904.06991; reference: utils.py:288-314).

  A fake sample counts as precise if it lies within the k-NN radius of some
  real sample (and vice versa for recall).
  """
  # Pairwise distances via the |a|^2 + |b|^2 - 2ab^T identity: the naive
  # broadcast x[:, None] - x[None] materializes an (N, N, D) tensor — at
  # N=5000, D=256 that is 25.6 GB and OOMs a 16G-HBM chip; the matmul form
  # peaks at the (N, N) matrix (100 MB) and runs on the MXU.
  def pdist2(a, b):
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    # HIGHEST precision: default TPU matmul runs bfloat16 passes, and the
    # cancellation-prone |a|^2+|b|^2-2ab expansion amplifies that into O(1)
    # squared-distance error at D=256 feature scales, distorting k-NN radii.
    ab = jnp.matmul(a, b.T, precision=jax.lax.Precision.HIGHEST)
    d2 = (a * a).sum(-1)[:, None] + (b * b).sum(-1)[None] - 2.0 * ab
    return jnp.maximum(d2, 0.0)

  def knn_radius(x, k):
    d2 = pdist2(x, x)
    # k+1 smallest (0th is self) without a full N-wide sort
    neg_small = jax.lax.top_k(-d2, k + 1)[0]
    return jnp.sqrt(-neg_small[:, k])  # distance to k-th neighbor

  def coverage(points, manifold, radii):
    d2 = pdist2(points, manifold)
    return (d2 <= radii[None] ** 2).any(1).astype(jnp.float32).mean()

  r_real = knn_radius(real_feats, k)
  r_fake = knn_radius(fake_feats, k)
  precision = coverage(fake_feats, real_feats, r_real)
  recall = coverage(real_feats, fake_feats, r_fake)
  f1 = 2 * precision * recall / jnp.maximum(precision + recall, 1e-8)
  return {'precision': precision, 'recall': recall, 'f1': f1}

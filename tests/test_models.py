"""Model-stack tests: losses decrease, shapes hold, quantizers straight-through."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import boxlcd_tpu
from boxlcd_tpu.utils import AttrDict


def tiny_G(**kw):
  from research.define_config import config
  G = config()
  G.update(hidden_size=32, nfilter=16, vqD=8, n_embed=32, n_head=2,
           n_layer=1, window=6, bs=4, lr=1e-3, vqK=16)
  G.update(**kw)
  return G


@pytest.fixture(scope='module')
def env():
  return boxlcd_tpu.env_map['Dropbox']()


def fake_batch(env, G, B=4, T=6, seed=0):
  rng = np.random.RandomState(seed)
  return {
      'lcd': jnp.asarray(rng.rand(B, T, env.lcd_h, env.lcd_w) > 0.5,
                         jnp.float32),
      'proprio': jnp.asarray(rng.uniform(-1, 1, (B, T, max(1, env.pobs_size))),
                             jnp.float32),
      'action': jnp.asarray(rng.uniform(-1, 1, (B, T, env.act_size)),
                            jnp.float32),
      'full_state': jnp.asarray(rng.uniform(-1, 1, (B, T, env.obs_size)),
                                jnp.float32),
  }


def test_bvae_trains(env):
  from research.nets.autoencoders.bvae import BVAE
  G = tiny_G(wh_ratio=env.G.wh_ratio, lcd_base=env.G.lcd_base)
  model = BVAE(env, G)
  batch = fake_batch(env, G)
  first = model.train_step(batch)
  for _ in range(10):
    m = model.train_step(batch)
  assert m['loss/total'] < first['loss/total'], 'loss should decrease'
  # encode/decode roundtrip shapes
  flat = {k: v.reshape(-1, *v.shape[2:]) for k, v in batch.items()}
  z = model.encode(model.params, flat, noise=False)
  assert z.shape == (24, model.z_size)
  dec = model.decode(model.params, z)
  assert dec['lcd'].logits.shape == (24, env.lcd_h, env.lcd_w)


def test_fbt_forward_and_sample(env):
  from research.nets.autoencoders.bvae import BVAE
  from research.nets.video_models.fbt import FBT
  G = tiny_G(wh_ratio=env.G.wh_ratio, lcd_base=env.G.lcd_base)
  bvae = BVAE(env, G)
  model = FBT(env, G, bvae=bvae)
  batch = fake_batch(env, G)
  m = model.train_step(batch)
  assert np.isfinite(m['loss/total'])
  sample = model.sample(jax.random.PRNGKey(0), 2)
  assert sample['lcd'].shape == (2, G.window, env.lcd_h, env.lcd_w)
  assert sample['proprio'].shape == (2, G.window, max(1, env.pobs_size))
  # prompted sampling preserves the prompt frames
  prompts = {k: v[:2] for k, v in batch.items() if k != 'action'}
  ps = model.sample(jax.random.PRNGKey(0), 2, action=batch['action'][:2],
                    prompts=prompts, prompt_n=3)
  assert ps['lcd'].shape == (2, G.window, env.lcd_h, env.lcd_w)


def test_rssm_trains(env):
  from research.nets.video_models.rssm import RSSM
  G = tiny_G(wh_ratio=env.G.wh_ratio, lcd_base=env.G.lcd_base)
  model = RSSM(env, G)
  batch = fake_batch(env, G)
  m = model.train_step(batch)
  assert np.isfinite(m['loss/total'])
  s = model.sample(jax.random.PRNGKey(0), 2)
  assert s['lcd'].shape == (2, G.window, env.lcd_h, env.lcd_w)


def test_quantizers():
  from research.nets.quantize import binary_quantize, rnld
  key = jax.random.PRNGKey(0)
  z = jnp.linspace(-3, 3, 32).reshape(4, 8)
  zq, ent, probs = binary_quantize(z, key, noise=False)
  vals = np.unique(np.asarray(zq))
  assert np.all((np.abs(vals) < 1e-5) | (np.abs(vals - 1) < 1e-5)), \
      'straight-through output should be numerically 0/1'
  # straight-through: gradient flows to logits
  g = jax.grad(lambda z: binary_quantize(z, key, noise=False)[0].sum())(z)
  assert np.abs(np.asarray(g)).sum() > 0
  zq, idxs = rnld(z, key, noise=False)
  centers = np.array([-0.75, -0.25, 0.25, 0.75])
  vals = np.unique(np.asarray(zq))
  assert np.all(np.abs(vals[:, None] - centers[None]).min(1) < 1e-5)


def test_dists_bernoulli_matches_manual():
  from research.nets import dists
  logits = jnp.asarray([[0.5, -1.0, 2.0]])
  x = jnp.asarray([[1.0, 0.0, 1.0]])
  d = dists.Bernoulli(logits)
  p = jax.nn.sigmoid(logits)
  manual = x * jnp.log(p) + (1 - x) * jnp.log(1 - p)
  assert np.allclose(np.asarray(d.log_prob(x)), np.asarray(manual), atol=1e-4)


def test_metrics():
  from research import metrics as M
  a = jnp.asarray(np.random.RandomState(0).rand(4, 16, 16))
  assert float(M.ssim(a, a)) > 0.99
  assert float(M.psnr(a, a)) > 50
  f1 = jnp.asarray(np.random.RandomState(1).randn(32, 8))
  f2 = f1 + 0.01
  assert float(M.fid(f1, f2)) < 0.1
  pr = M.precision_recall_f1(f1, f1)
  assert float(pr['f1']) > 0.9
  # matmul-form pairwise distances must match the naive broadcast form
  # (the naive (N, N, D) tensor OOMed the TPU at eval scale)
  real = np.random.RandomState(2).randn(64, 8)
  fake = real + np.random.RandomState(3).randn(64, 8) * 0.5
  k = 3
  d_rr = np.linalg.norm(real[:, None] - real[None], axis=-1)
  d_ff = np.linalg.norm(fake[:, None] - fake[None], axis=-1)
  r_real = np.sort(d_rr, 1)[:, k]
  r_fake = np.sort(d_ff, 1)[:, k]
  prec = (np.linalg.norm(fake[:, None] - real[None], axis=-1)
          <= r_real[None]).any(1).mean()
  rec = (np.linalg.norm(real[:, None] - fake[None], axis=-1)
         <= r_fake[None]).any(1).mean()
  got = M.precision_recall_f1(jnp.asarray(real), jnp.asarray(fake), k=k)
  assert abs(float(got['precision']) - prec) < 1e-5
  assert abs(float(got['recall']) - rec) < 1e-5


def test_fbt_init_grads_finite(env):
  """Regression: with a zeros pos_emb, the shift-right all-zero t=0 token made
  LayerNorm's backward blow up (1/sqrt(eps) per LN, compounding per block to
  inf), so clip_by_global_norm zeroed every update and FBT never trained."""
  import optax
  from research.nets.autoencoders.bvae import BVAE
  from research.nets.video_models.fbt import FBT
  G = tiny_G(wh_ratio=env.G.wh_ratio, lcd_base=env.G.lcd_base)
  model = FBT(env, G, bvae=BVAE(env, G))
  batch = fake_batch(env, G)
  (_, _), grads = jax.value_and_grad(model.loss_fn, has_aux=True)(
      model.params, batch, jax.random.PRNGKey(0))
  gnorm = float(optax.global_norm(grads))
  assert np.isfinite(gnorm) and gnorm < 1e3, gnorm


def test_fbt_kv_cache_matches_full_forward(env):
  """Teacher-forced logits from the KV-cached `step` path must match the
  full causal forward at every position."""
  from research.nets.autoencoders.bvae import BVAE
  from research.nets.video_models.fbt import FBT
  G = tiny_G(wh_ratio=env.G.wh_ratio, lcd_base=env.G.lcd_base)
  model = FBT(env, G, bvae=BVAE(env, G))
  T = model.block_size
  key = jax.random.PRNGKey(4)
  z = (jax.random.uniform(key, (2, T, model.z_size)) > 0.5).astype(jnp.float32)
  action = jax.random.uniform(key, (2, T, model.act_n), minval=-1, maxval=1)
  full = model.module.apply(model.params, z, action)

  def body(caches, i):
    prev = jnp.maximum(i - 1, 0)
    z_prev = jnp.where(i > 0, z[:, prev], 0.0)
    a_prev = jnp.where(i > 0, action[:, prev], 0.0)
    logits, caches = model.module.apply(model.params, z_prev, a_prev, i,
                                        caches, method='step')
    return caches, logits

  _, stepped = jax.lax.scan(body, model.module.empty_cache(2), jnp.arange(T))
  stepped = stepped.transpose(1, 0, 2)  # (T,B,z) -> (B,T,z)
  assert np.allclose(np.asarray(full), np.asarray(stepped), atol=1e-4), \
      np.abs(np.asarray(full) - np.asarray(stepped)).max()


def test_fbt_precomputed_z_matches_encode_path(env):
  from research.nets.autoencoders.bvae import BVAE
  from research.nets.video_models.fbt import FBT
  G = tiny_G(wh_ratio=env.G.wh_ratio, lcd_base=env.G.lcd_base)
  model = FBT(env, G, bvae=BVAE(env, G))
  batch = fake_batch(env, G)
  key = jax.random.PRNGKey(0)
  l1, _ = model.loss_fn(model.params, batch, key)
  z = model.precompute_z({'lcd': batch['lcd'].astype(jnp.uint8),
                          'proprio': batch['proprio']}, chunk=2)
  l2, _ = model.loss_fn(model.params,
                        {'z': z.astype(jnp.float32),
                         'action': batch['action']}, key)
  assert np.allclose(float(l1), float(l2), atol=1e-5), (float(l1), float(l2))

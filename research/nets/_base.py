"""Model harness: params + optimizer + jitted train step + checkpointing.

Re-architecture of the reference Net base (reference: research/nets/_base.py):
models are flax modules with a pure `loss_fn(params, batch, rng)`; the harness
owns optax Adam with global-norm clipping, a jitted update, and save/load that
embeds the config G alongside the weights (the reference smuggles G into the
torch state dict, _base.py:26-39).
"""
from __future__ import annotations

import pickle
from pathlib import Path

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax


class Net:
  name: str

  def __init__(self, env, G):
    self.env = env
    self.G = G
    self.name = self.__class__.__name__
    self.key = jax.random.PRNGKey(int(G.get('seed', 0)))

  # -- subclass contract ------------------------------------------------------
  # self.module : flax module (or None if the model composes several)
  # self.init_params(key) -> params pytree
  # self.loss_fn(params, batch, rng) -> (loss, metrics dict)

  def _init(self):
    self.key, k = jax.random.split(self.key)
    self.step = 0
    self.params = self.init_params(k)
    self.num_vars = sum(np.prod(p.shape) for p in
                        jax.tree_util.tree_leaves(self.params))
    tx = [optax.clip_by_global_norm(float(self.G.get('grad_clip', 10.0))),
          optax.adam(float(self.G.lr))]
    self.opt = optax.chain(*tx)
    self.opt_state = self.opt.init(self.params)

    def update(params, opt_state, batch, rng):
      (loss, metrics), grads = jax.value_and_grad(
          self.loss_fn, has_aux=True)(params, batch, rng)
      gnorm = optax.global_norm(grads)
      updates, opt_state = self.opt.update(grads, opt_state, params)
      params = optax.apply_updates(params, updates)
      metrics = dict(metrics)
      metrics['grad_norm'] = gnorm
      return params, opt_state, metrics

    def dry(params, batch, rng):
      _, metrics = self.loss_fn(params, batch, rng)
      return metrics

    def update_many(params, opt_state, batches, rng):
      """lax.scan over K update steps — one dispatch per chunk, which
      matters when per-call latency dominates (remote TPU tunnels)."""
      def body(carry, batch):
        params, opt_state, rng = carry
        rng, k = jax.random.split(rng)
        (loss, metrics), grads = jax.value_and_grad(
            self.loss_fn, has_aux=True)(params, batch, k)
        gnorm = optax.global_norm(grads)
        updates, opt_state = self.opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(metrics)
        metrics['grad_norm'] = gnorm
        return (params, opt_state, rng), metrics
      (params, opt_state, _), metrics = jax.lax.scan(
          body, (params, opt_state, rng), batches)
      return params, opt_state, metrics

    mesh_spec = str(self.G.get('mesh', '') or '')
    if mesh_spec:
      # data-parallel training over a device mesh: batch sharded on 'dp',
      # params/opt replicated, XLA inserts the gradient all-reduce over ICI
      # (SURVEY §2.5; mesh carries a 'tp' axis of size 1 so the layout
      # generalizes if models outgrow a chip)
      assert mesh_spec.startswith('dp'), f'unsupported mesh {mesh_spec!r}'
      ndev = int(mesh_spec[2:])
      avail = jax.devices()
      assert len(avail) >= ndev, \
          f'mesh {mesh_spec} needs {ndev} devices, have {len(avail)}'
      from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
      self.mesh = Mesh(np.array(avail[:ndev]).reshape(ndev, 1), ('dp', 'tp'))
      repl = NamedSharding(self.mesh, P())
      bshard = NamedSharding(self.mesh, P('dp'))
      kshard = NamedSharding(self.mesh, P(None, 'dp'))  # (K, B, ...) chunks
      self.params = jax.device_put(self.params, repl)
      self.opt_state = jax.device_put(self.opt_state, repl)
      self._update = jax.jit(update, in_shardings=(repl, repl, bshard, repl),
                             out_shardings=(repl, repl, repl))
      self._update_many = jax.jit(update_many,
                                  in_shardings=(repl, repl, kshard, repl),
                                  out_shardings=(repl, repl, repl))
      self._dry = jax.jit(dry, in_shardings=(repl, bshard, repl),
                          out_shardings=repl)
    else:
      self.mesh = None
      self._update = jax.jit(update)
      self._update_many = jax.jit(update_many)
      self._dry = jax.jit(dry)

  def _rng(self):
    self.key, k = jax.random.split(self.key)
    return k

  def train_step(self, batch, dry=False):
    """One optimization step (reference: nets/_base.py:18-24)."""
    if dry:
      metrics = self._dry(self.params, batch, self._rng())
    else:
      self.params, self.opt_state, metrics = self._update(
          self.params, self.opt_state, batch, self._rng())
      self.step += 1
    return metrics

  def train_steps(self, batches):
    """K update steps in ONE device dispatch; batches have a leading K axis.
    Returns the metrics of the final step."""
    self.params, self.opt_state, metrics = self._update_many(
        self.params, self.opt_state, batches, self._rng())
    self.step += jax.tree_util.tree_leaves(batches)[0].shape[0]
    return {k: v[-1] for k, v in metrics.items()}

  def save(self, direc):
    """Full checkpoint: params + opt_state + step + RNG + config (the
    reference saves params+G only, nets/_base.py:26-39; SURVEY §5.4 requires
    true mid-run resume)."""
    direc = Path(direc)
    direc.mkdir(parents=True, exist_ok=True)
    path = direc / f'{self.name}.pkl'
    blob = {'params': flax.serialization.to_bytes(self.params),
            'opt_state': flax.serialization.to_bytes(self.opt_state),
            'step': int(self.step),
            'key': np.asarray(self.key),
            'G': dict(self.G)}
    # atomic: mid-run checkpoints race with SIGTERM/SIGKILL (timeout-sliced
    # training); a torn pickle would poison every subsequent auto-resume
    tmp = direc / f'.{self.name}.pkl.tmp'
    with open(tmp, 'wb') as f:
      pickle.dump(blob, f)
    import os
    os.replace(tmp, path)
    print('SAVED MODEL', path)

  def load(self, direc, resume=True):
    """Restore params; with resume=True also opt_state/step/RNG if saved."""
    path = Path(direc) / f'{self.name}.pkl'
    with open(path, 'rb') as f:
      blob = pickle.load(f)
    self.params = flax.serialization.from_bytes(self.params, blob['params'])
    if resume and 'opt_state' in blob:
      self.opt_state = flax.serialization.from_bytes(self.opt_state,
                                                     blob['opt_state'])
      self.step = int(blob.get('step', 0))
      self.key = jnp.asarray(blob['key'])
    print(f'LOADED {path}')

  @staticmethod
  def load_config(direc, name):
    """Read the config embedded in a checkpoint (for model reconstruction)."""
    with open(Path(direc) / f'{name}.pkl', 'rb') as f:
      blob = pickle.load(f)
    from boxlcd_tpu.utils import AttrDict
    return AttrDict(blob['G'])

  def evaluate(self, writer, batch, itr):
    """Override in AE/VideoModel bases; default no-op."""
    return {}

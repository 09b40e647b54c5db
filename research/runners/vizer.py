"""Vizer: model-vs-truth rollout visualization (reference:
research/runners/vizer.py — an interactive pyglet debugger there; here a
headless replay that writes side-by-side comparison media, the TPU-friendly
equivalent per SURVEY.md §2.4)."""
from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from boxlcd_tpu.envs.env import Env
from research import utils


def write_gif(path, frames, fps=10):
  """frames: (T, H, W) float/bool -> animated gif via PIL (host-side)."""
  try:
    from PIL import Image
  except ImportError:
    np.savez_compressed(str(path) + '.npz', frames=frames)
    return
  imgs = [Image.fromarray((255 * np.asarray(f, np.float32)).astype(np.uint8))
          for f in frames]
  imgs[0].save(str(path), save_all=True, append_images=imgs[1:],
               duration=int(1000 / fps), loop=0)


class Vizer:
  def __init__(self, model, env, G):
    self.model = model
    self.env = env
    self.G = G

  def optimize_actions(self, key, actions, prompts, goal_lcd, iters=10,
                       lr=1.0):
    """Plan an action sequence by gradient descent THROUGH the model toward a
    goal frame (reference: vizer.py:149-170): roll out with the current
    actions, backprop the goal-frame log-likelihood into the action
    conditioning (the rolled-out frames are constants, as in the reference),
    zero the prompt-action grads, step, clamp to [-1, 1].

    Returns (optimized_actions, initial_loss, final_loss)."""
    from research.nets import dists
    model = self.model
    prompt_n = self.G.prompt_n
    goal = jnp.asarray(goal_lcd, jnp.float32)[None]          # (1, H, W)

    if model.name == 'FBT':
      gz = model.bvae.encode(
          model.bvae.params,
          {'lcd': goal, 'proprio': jnp.zeros((1, model.proprio_n))},
          noise=False)
      gz = jax.lax.stop_gradient(gz)

      def loss_fn(a, lcd, proprio):
        z = jax.lax.stop_gradient(model.bvae.encode(
            model.bvae.params, {'lcd': lcd, 'proprio': proprio},
            noise=False))
        logits = model.module.apply(model.params, z, a)
        return -dists.Bernoulli(logits[:, -1]).log_prob(gz).mean()
    else:  # pixel-token models (FIT)
      gflat = goal.reshape(1, -1)

      def loss_fn(a, lcd, proprio):
        T = lcd.shape[1]
        logits = model.module.apply(model.params, lcd.reshape(1, T, -1), a)
        return -dists.Bernoulli(logits[:, -1]).log_prob(gflat).mean()

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    a = jnp.asarray(actions)
    loss0 = None
    loss = None
    for it in range(iters):
      key, k = jax.random.split(key)
      roll = model.sample(k, 1, action=a, prompts=prompts, prompt_n=prompt_n)
      lcd = roll['lcd'].reshape(1, -1, *goal.shape[-2:]).astype(jnp.float32)
      loss, g = grad_fn(a, lcd, roll['proprio'])
      if loss0 is None:
        loss0 = float(loss)
      g = g.at[:, :prompt_n].set(0.0)
      a = jnp.clip(a - lr * g, -1, 1)
    return a, loss0, float(loss)

  def run(self, n_rollouts=4):
    G = self.G
    logdir = Path(G.logdir)
    logdir.mkdir(parents=True, exist_ok=True)
    raw = self.env._env if hasattr(self.env, '_env') else self.env
    key = jax.random.PRNGKey(G.seed)
    T = self.model.block_size

    for r in range(n_rollouts):
      key, k_env, k_act, k_samp = jax.random.split(key, 4)
      # truth rollout
      state = Env.reset(raw, k_env)
      actions = jax.random.uniform(k_act, (T, raw.act_size),
                                   minval=-1, maxval=1)

      def step(s, a):
        ns, obs, *_ = Env.step(raw, s, a)
        return ns, obs

      _, truth = jax.lax.scan(step, state, actions)
      # model rollout prompted by the first prompt_n frames
      prompts = {k: v[None] for k, v in truth.items() if k != 'full_state'}
      sample = self.model.sample(k_samp, 1, action=actions[None],
                                 prompts=prompts, prompt_n=G.prompt_n)
      t_lcd = np.asarray(truth['lcd'], np.float32)
      p_lcd = np.asarray(sample['lcd'][0], np.float32).reshape(t_lcd.shape)
      strip = np.concatenate([t_lcd, p_lcd], axis=1)  # truth on top
      write_gif(logdir / f'viz_rollout_{r}.gif', strip)
      print('wrote', logdir / f'viz_rollout_{r}.gif')
      if G.get('optimize_actions', 0):
        # plan through the model toward the truth rollout's final frame
        key, k_opt, k_b, k_a = jax.random.split(key, 4)
        goal = t_lcd[-1]
        opt_a, l0, l1 = self.optimize_actions(k_opt, actions[None], prompts,
                                              goal)
        print(f'optimize_actions rollout {r}: loss {l0:.4f} -> {l1:.4f}')
        before = self.model.sample(k_b, 1, action=actions[None],
                                   prompts=prompts, prompt_n=G.prompt_n)
        after = self.model.sample(k_a, 1, action=opt_a, prompts=prompts,
                                  prompt_n=G.prompt_n)
        b_lcd = np.asarray(before['lcd'][0], np.float32).reshape(t_lcd.shape)
        a_lcd = np.asarray(after['lcd'][0], np.float32).reshape(t_lcd.shape)
        strip = np.concatenate([b_lcd, a_lcd], axis=1)  # before over after
        write_gif(logdir / f'viz_optimized_{r}.gif', strip)
        print('wrote', logdir / f'viz_optimized_{r}.gif')

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

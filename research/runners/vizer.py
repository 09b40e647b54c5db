"""Vizer: model-vs-truth rollout visualization (reference:
research/runners/vizer.py).

Two modes: `Vizer` is the headless replay that writes side-by-side comparison
media (the TPU-friendly default per SURVEY.md §2.4); `InteractiveVizer`
(`--interactive=1`) is the live pyglet keyboard debugger matching the
reference's vizer.py:81-309 — model-vs-truth stepping, on-demand sampling,
weight reload, and goal dragging — and falls back to the headless replay when
pyglet or a display is unavailable."""
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


def outproc(img):
  """(H, W) float/bool frame -> 8x-upscaled RGB uint8 (reference:
  vizer.py:19-20)."""
  img = np.asarray(img, np.float32)
  return (255 * img[..., None].repeat(3, -1)
          .repeat(8, -2).repeat(8, -3)).astype(np.uint8)


class AutoEnv:
  """Live model-vs-truth stepper (reference: vizer.py:22-80): the real env
  and the learned model advance in lockstep from a shared action stream; the
  model serves each frame through `onestep` on a sliding window."""

  def __init__(self, model, env, G):
    self.env = env  # stateful WorldEnv (or goal wrapper around it)
    self.G = G
    self.model = model
    self.window_batch = None
    self.tot_count = 0

  def reset(self):
    self.tot_count = 0
    obs = self.env.reset()
    self.goal_lcd = obs.get('goal:lcd')
    self.goal_proprio = obs.get('goal:proprio')
    obses = {k: [v] for k, v in obs.items() if not k.startswith('goal:')}
    acts = []
    # prime the window with up to 10 real frames (vizer.py:38; capped so
    # small test windows still leave one slot to predict into)
    for _ in range(min(9, self.G.window - 2)):
      act = self.env.action_space.sample()
      obs = self.env.step(act)[0]
      for k in obses:
        obses[k].append(obs[k])
      acts.append(act)
    batch = {k: np.stack(v, 0)[None].astype(np.float32)
             for k, v in obses.items()}
    batch['action'] = np.stack(acts + [np.zeros_like(acts[0])], 0)[None]
    self.count = batch['lcd'].shape[1] - 1
    for k, v in batch.items():  # zero-pad out to the model window
      pad = np.zeros([1, self.G.window - v.shape[1], *v.shape[2:]], v.dtype)
      batch[k] = np.concatenate([v, pad], 1)
    self.window_batch = batch
    img = outproc(batch['lcd'][0, self.count])
    goal = outproc(self.goal_lcd) if self.goal_lcd is not None else None
    return img, img, goal

  def step(self, act, key):
    self.tot_count += 1
    obs, rew, done, info = self.env.step(act)
    truth = obs['lcd']
    self.window_batch['action'][:, self.count] = np.asarray(act)[None]
    batch = {k: jnp.asarray(v, jnp.float32)
             for k, v in self.window_batch.items()}
    batch = self.model.onestep(self.model.params, batch, self.count, key,
                               temp=0.1)
    self.window_batch = {k: np.asarray(v) for k, v in batch.items()}
    pred = self.window_batch['lcd'][0, self.count]
    if self.count == self.G.window - 2:  # slide the window (vizer.py:71-73)
      self.window_batch = {k: np.concatenate([v[:, 1:], v[:, :1]], axis=1)
                           for k, v in self.window_batch.items()}
    self.count = min(1 + self.count, self.G.window - 2)
    lrew = None
    if self.goal_proprio is not None and hasattr(self.env, 'comp_rew_done'):
      proprio = self.window_batch['proprio'][0, self.count - 1]
      lrew, _ = self.env.comp_rew_done(
          {'proprio': proprio, 'goal:proprio': self.goal_proprio})
    goal = outproc(self.goal_lcd) if self.goal_lcd is not None else None
    return outproc(truth), outproc(pred), rew, lrew, goal


class InteractiveVizer(Vizer):
  """Live pyglet keyboard debugger (reference: vizer.py:81-309).

  Keys (reference on_key_press, vizer.py:98-118):
    SPACE  pause/resume the live model-vs-truth stepping
    S      sample model rollouts vs truth, shown as looping filmstrips
    0      reset the episode
    R      reload model weights from weightdir
    G      goal mode — LEFT/RIGHT drag the goal bodies in x, SPACE returns
    ESC    quit
  """

  def __init__(self, model, env, G):
    super().__init__(model, env, G)
    from boxlcd_tpu.viewer import HAVE_PYGLET
    self.have_window = False
    if HAVE_PYGLET:
      try:
        import pyglet
        self.pyglet = pyglet
        self.KEY = pyglet.window.key
        self.window = pyglet.window.Window(1280, 720)
        self.have_window = True
      except Exception as e:  # headless machine: no GL context
        print(f'pyglet window unavailable ({e}); headless replay instead')
    if not self.have_window:
      return
    self.autoenv = AutoEnv(model, env, G)
    self.paused = False
    self.held_down = {}
    self.messages = {}

    def on_key_press(symbol, modifiers):
      K = self.KEY
      if symbol == K.SPACE:
        self.paused = not self.paused
      if symbol == K.ESCAPE:
        self.closed = True
      if symbol == K.S:
        self.messages['sample'] = 1
      if symbol in (K._0, K.NUM_0):
        self.messages['reset'] = 1
      if symbol == K.R:
        print('RELOAD WEIGHTS')
        self.model.load(self.G.weightdir)
      if symbol == K.G:
        self.messages['goal'] = 1
      self.held_down[symbol] = 1

    def on_key_release(symbol, modifiers):
      self.held_down[symbol] = 0

    self.window.set_handlers(on_key_press=on_key_press,
                             on_key_release=on_key_release)
    self.closed = False

  def check_message(self, name):
    if self.messages.get(name):
      self.messages[name] = 0
      return True
    return False

  def draw(self, imgs=(), texts=()):
    """Blit (cell_xy, rgb) tiles into the window (reference:
    vizer.py:283-309); cell units are one upscaled LCD frame."""
    pyglet = self.pyglet
    cell = np.array([self.G.lcd_base * self.G.wh_ratio,
                     self.G.lcd_base]) * 8
    self.window.clear()
    self.window.switch_to()
    self.window.dispatch_events()
    for xy, img in imgs:
      img = np.ascontiguousarray(img, np.uint8)
      data = pyglet.image.ImageData(img.shape[1], img.shape[0], 'RGB',
                                    img.tobytes(), pitch=img.shape[1] * -3)
      data.blit(*(np.array(xy) * cell))
    for xy, text in texts:
      xy = np.array(xy) * cell
      pyglet.text.Label(text, x=xy[0], y=xy[1], anchor_x='center',
                        anchor_y='center').draw()
    self.window.flip()

  def sample_strips(self, key, n=4):
    """Fresh truth rollout + n model rollouts on the same actions
    (reference: vizer.py:249-277)."""
    raw = self.env._env if hasattr(self.env, '_env') else self.env
    T = self.model.block_size
    key, k_env, k_act = jax.random.split(key, 3)
    state = Env.reset(raw, k_env)
    actions = jax.random.uniform(k_act, (1, T, raw.act_size),
                                 minval=-1, maxval=1)

    def step(s, a):
      ns, obs, *_ = Env.step(raw, s, a)
      return ns, obs['lcd']

    _, t_lcd = jax.lax.scan(step, state, actions[0])
    strips = [np.asarray(t_lcd, np.float32)]
    prompts = {'lcd': t_lcd[None].astype(jnp.float32),
               'proprio': jnp.zeros((1, T, raw.pobs_size))}
    for _ in range(n):
      key, k = jax.random.split(key)
      s = self.model.sample(k, 1, action=actions, prompts=prompts,
                            prompt_n=5)
      strips.append(np.asarray(s['lcd'][0], np.float32)
                    .reshape(t_lcd.shape))
    return [np.stack([outproc(f) for f in strip]) for strip in strips]

  def do_goal(self, key):
    """Goal dragging (reference: vizer.py:173-207): hold LEFT/RIGHT to slide
    the goal bodies in x (via teleport reset), SPACE to exit goal mode."""
    env = self.env
    raw = env._env if hasattr(env, '_env') else env
    from boxlcd_tpu.utils import NamedArray, filtlist
    eobs = raw.reset()
    xkeys = filtlist(raw.obs_keys, '.*x:p')
    K = self.KEY
    while not self.closed:
      neobs = NamedArray(eobs['full_state'].copy(), raw.obs_info,
                         do_map=False)
      if self.held_down.get(K.LEFT):
        neobs[xkeys] = neobs[xkeys] - 0.05
      if self.held_down.get(K.RIGHT):
        neobs[xkeys] = neobs[xkeys] + 0.05
      eobs = raw.reset(full_state=neobs.arr)
      goal_lcd = raw.lcd_render()
      self.draw(imgs=[((1, 1), outproc(goal_lcd))],
                texts=[((2, 3), 'goal mode: LEFT/RIGHT drag, SPACE exit')])
      if self.held_down.get(K.SPACE):
        self.held_down[K.SPACE] = 0
        self.paused = False
        return

  def run(self, n_rollouts=4):
    if not self.have_window:
      return super().run(n_rollouts)
    key = jax.random.PRNGKey(self.G.seed)
    atruth, apred, goal = self.autoenv.reset()
    rew, lrew, i, strips = 0.0, None, 0, []
    import time as _time
    while not self.closed:
      imgs = []
      if self.check_message('sample'):
        key, k = jax.random.split(key)
        strips = self.sample_strips(k)
      if strips:
        j = i % len(strips[0])
        imgs += [((2 * si, 0), strip[j]) for si, strip in enumerate(strips)]
      imgs += [((0, 2), atruth), ((0, 1), apred)]
      if goal is not None:
        imgs.append(((0, 3), goal))
      texts = [((0.5, 1.8), f'pred rew {lrew:.3f}' if lrew is not None
                else 'pred'), ((0.5, 2.8), f'truth rew {rew:.3f}')]
      if not self.paused:
        key, k = jax.random.split(key)
        atruth, apred, rew, lrew, goal = self.autoenv.step(
            self.env.action_space.sample(), k)
        i += 1
      if self.check_message('reset'):
        atruth, apred, goal = self.autoenv.reset()
      if self.check_message('goal'):
        key, k = jax.random.split(key)
        self.do_goal(k)
      self.draw(imgs=imgs, texts=texts)
      _time.sleep(0.01)
    self.window.close()

"""WorldEnv: declarative world -> pure-functional TPU env (+ gym-style shell).

The functional core is the TPU-native re-architecture of the reference's
WorldEnv (reference: boxLCD/world_env.py:21-535): `reset`/`step`/`observe`
are pure jittable functions over a fixed-shape WorldState, so thousands of
worlds batch with `vmap` and shard across chips with `pjit`/`shard_map` —
replacing the reference's one-OS-process-per-env AsyncVectorEnv transport
(reference: research/wrappers/async_vector_env.py) with on-device math.

A thin stateful wrapper provides the reference's single-env gym API
(reset(full_state=|proprio=)/step/render and obs/action spaces) for drop-in
use and for cross-validation against the CPU Box2D oracle.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from boxlcd_tpu import spaces, utils
from boxlcd_tpu.engine import physics
from boxlcd_tpu.engine.collision import rot_mat
from boxlcd_tpu.engine.spec import (
    KCOS, KSIN, KX, KY, RANDOM, ROLE_CHILD, ROLE_OBJECT, ROLE_ROOT,
    compile_world)
from boxlcd_tpu.render import raster


def wrap_angle(a):
  return jnp.arctan2(jnp.sin(a), jnp.cos(a))


class _Pose(NamedTuple):
  """The subset of WorldState that observations depend on."""
  is_circle: jnp.ndarray
  c: jnp.ndarray
  a: jnp.ndarray


class Env:
  """Functional env core compiled from a WorldDef."""

  # defaults mirror the reference env config (boxLCD/world_env.py:32-45)
  ENV_DG = utils.AttrDict(
      base_dim=5, lcd_base=16, wh_ratio=2.0, ep_len=100,
      angular_offset=0, root_offset=0, compact_obs=0, use_speed=1,
      all_corners=0, walls=1, debug=0, fps=10)

  def __init__(self, world_def, G=None):
    self.world_def = world_def
    self.G = utils.AttrDict(self.ENV_DG)
    if G:
      if not isinstance(G, dict):
        G = G.__dict__
      for k in G:
        self.G[k] = G[k]
    self.spec = compile_world(world_def, self.G)
    self.lcd_h = int(self.G.lcd_base)
    self.lcd_w = int(self.G.lcd_base * self.G.wh_ratio)
    s = self.spec
    self.obs_info = utils.sortdict(
        {k: s.obs_bounds[i] for i, k in enumerate(s.obs_keys)})
    self.act_info = utils.sortdict({k: np.array([-1.0, 1.0]) for k in s.act_keys}
                                   or {'dummy': np.array([-1.0, 1.0])})
    self.obs_keys = list(s.obs_keys)
    self.obs_size = len(self.obs_keys)
    self.pobs_keys = list(s.pobs_keys)
    self.pobs_size = len(self.pobs_keys)
    self.pobs_idxs = list(np.asarray(s.pobs_idxs))
    self.act_keys = list(self.act_info.keys())
    self.act_size = len(self.act_keys)
    self.observation_space = spaces.Dict({
        'full_state': spaces.Box(-1, 1, (self.obs_size,), np.float32),
        'proprio': spaces.Box(-1, 1, (max(1, self.pobs_size),), np.float32),
        'lcd': spaces.Box(0, 1, (self.lcd_h, self.lcd_w), bool),
    })
    self.action_space = spaces.Box(-1, 1, (self.act_size,), np.float32)
    # static per-body joint lookup for spawn placement
    self._child_joint = {int(s.j_child[j]): j for j in range(s.jn)}

  # ---- functional API ------------------------------------------------------

  def reset(self, key) -> physics.WorldState:
    """Sample a fresh episode state (reference: world_env.py:197-304)."""
    s = self.spec
    st = physics.init_state(s)
    n = s.n
    keys = jax.random.split(key, n * 4).reshape(n, 4, 2)
    origin = jnp.zeros((n, 2))
    angle = jnp.zeros(n)
    is_circle = jnp.asarray(s.shape_static == 0)
    u = lambda k: jax.random.uniform(k, (), minval=-1.0, maxval=1.0)
    for i in range(n):  # static unroll; creation order puts parents first
      kx, ky, k1, k2 = keys[i]
      role = int(s.role[i])
      if role in (ROLE_ROOT, ROLE_OBJECT):
        rx = float(s.rs_rangex[i])
        ux = jax.random.uniform(kx, (), minval=-rx, maxval=rx)
        x = utils.mapto(ux, (0.0, s.width))
        lo, hi = float(s.rs_rangey_lo[i]), float(s.rs_rangey_hi[i])
        uy = jax.random.uniform(ky, (), minval=lo, maxval=hi) if hi > lo else lo
        y = utils.mapto(uy, (0.0, s.height))
        # angle from independent sin/cos samples (world_env.py:213,292)
        ang = jnp.where(s.rs_rand_angle[i], jnp.arctan2(u(k1), u(k2)), 0.0)
        origin = origin.at[i].set(jnp.stack([x, jnp.asarray(y, jnp.float32)]))
        angle = angle.at[i].set(ang)
        if role == ROLE_OBJECT and int(s.shape_static[i]) == RANDOM:
          is_circle = is_circle.at[i].set(
              jax.random.bernoulli(k2, 0.5))  # box|circle coin flip
      else:  # ROLE_CHILD: placed from parent via joint anchors
        j = self._child_joint[i]
        root = int(s.root_of[i])
        parent = int(s.parent_of[i])
        mangle = wrap_angle(angle[root] + float(s.j_angle0[j]))
        pangle = angle[parent]  # parent's own (already composed) angle
        aa = rot_mat(pangle) @ jnp.asarray(s.j_anchor_a[j])
        ab = rot_mat(mangle) @ jnp.asarray(s.j_anchor_b[j])
        origin = origin.at[i].set(origin[parent] + aa - ab)
        angle = angle.at[i].set(mangle)
    c = physics.com_from_origin(s, is_circle, origin, angle)
    # joint reference angles: pybox2d initializes referenceAngle to the spawn
    # relative angle when bodyA/bodyB are passed to revoluteJointDef, making
    # limits relative to the spawn configuration (see engine/physics.py)
    j_ref = angle[jnp.asarray(s.j_child)] - angle[jnp.asarray(s.j_parent)]
    j_ref = j_ref * jnp.asarray(s.j_valid)
    return st._replace(c=c, a=angle, is_circle=is_circle, j_ref=j_ref)

  def teleport(self, key, full_state=None, proprio=None) -> physics.WorldState:
    """Reset then overwrite poses from a (normalized) state vector.

    This is the reference's state-injection API (world_env.py:319-380), used
    to re-render model predictions and to set goals. Velocities stay zero.
    """
    s = self.spec
    # call the functional reset explicitly: WorldEnv overrides self.reset
    # with the stateful gym-style signature
    st = Env.reset(self, key)
    if proprio is not None:
      full = jnp.zeros(self.obs_size)
      full = full.at[jnp.asarray(s.pobs_idxs)].set(proprio)
    else:
      full = jnp.asarray(full_state)
    vals = utils.mapto(full, jnp.asarray(s.obs_bounds).T)
    x = vals[jnp.asarray(s.b_xi)]
    y = vals[jnp.asarray(s.b_yi)]
    cos = vals[jnp.asarray(s.b_ci)]
    sin = vals[jnp.asarray(s.b_si)]
    origin = jnp.stack([x, y], -1)
    angle = jnp.arctan2(sin, cos)
    # undo root-relative encodings (reference: world_env.py:369, 377-379)
    import numpy as _np
    kinds_x = _np.asarray(s.obs_kind)[_np.asarray(s.b_xi)]
    kinds_c = _np.asarray(s.obs_kind)[_np.asarray(s.b_ci)]
    from boxlcd_tpu.engine.spec import KCOS_REL, KX_REL
    rel_pos = jnp.asarray(kinds_x == KX_REL)
    rel_ang = jnp.asarray(kinds_c == KCOS_REL)
    root = jnp.asarray(s.root_of)
    origin = jnp.where(rel_pos[:, None], origin + origin[root], origin)
    comb = angle + angle[root]
    comb = jnp.arctan2(jnp.sin(comb), jnp.cos(comb))
    angle = jnp.where(rel_ang, comb, angle)
    c = physics.com_from_origin(s, st.is_circle, origin, angle)
    return st._replace(c=c, a=angle)

  def observe(self, state: physics.WorldState):
    """Pack the dict observation (reference: world_env.py:387-429)."""
    return self.observe_pose(state.is_circle, state.c, state.a)

  def observe_pose(self, is_circle, c, a, lcd=True):
    """Observation from a bare pose (no WorldState needed) — obs depend only
    on (is_circle, c, a), which lets the megakernel datagen path pack obs
    for a whole (T, B) trajectory in one vectorized pass. lcd=False skips
    the frame render (callers that raster via render/traj_raster.py)."""
    s = self.spec
    state = _Pose(is_circle=is_circle, c=c, a=a)
    origin = physics.origin_pos(s, state)
    root = jnp.asarray(s.root_of)
    rel = origin - origin[root]                  # root-relative positions
    rel_a = state.a - state.a[root]              # root-relative angles
    rel_a = jnp.arctan2(jnp.sin(rel_a), jnp.cos(rel_a))
    feats = jnp.stack([origin[:, 0], origin[:, 1],
                       jnp.cos(state.a), jnp.sin(state.a),
                       rel[:, 0], rel[:, 1],
                       jnp.cos(rel_a), jnp.sin(rel_a)], axis=-1)  # (N,8)
    vals = feats[jnp.asarray(s.obs_body), jnp.asarray(s.obs_kind)]
    full = utils.rmapto(vals, jnp.asarray(s.obs_bounds).T).astype(jnp.float32)
    proprio = (full[jnp.asarray(s.pobs_idxs)] if s.pobs_size
               else jnp.zeros(1, jnp.float32))
    if not lcd:
      return {'full_state': full, 'proprio': proprio}
    if str(self.G.get('raster', 'exact')) == 'fast':
      # approximate pixel-center coverage (~96% agreement with PIL): much
      # cheaper on current XLA-TPU (the exact scanline program hits a
      # lowering pathology being chased in PROGRESS.md); self-consistent
      # end-to-end since data/training/serving share the renderer
      lcd = ~raster.coverage(s, state.is_circle, state.c, state.a,
                             self.lcd_w, self.lcd_h).any(-1)
    else:
      lcd = raster.lcd_render(s, state.is_circle, state.c, state.a,
                              self.lcd_w, self.lcd_h)
    return {'full_state': full, 'proprio': proprio, 'lcd': lcd}

  def step(self, state: physics.WorldState, action):
    """(state, action) -> (state', obs, reward, done, info). Pure."""
    state = physics.step_world(self.spec, state, action)
    obs = self.observe(state)
    reward = jnp.float32(0.0)  # no reward in the base env (world_env.py:455)
    done = state.ep_t >= self.G.ep_len
    return state, obs, reward, done, {'timeout': done}

  def step_autoreset(self, key, state, action):
    """Step with masked auto-reset — the batched-collection primitive."""
    state, obs, reward, done, info = self.step(state, action)
    fresh = self.reset(key)
    state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(jnp.reshape(done, (1,) * a.ndim), b, a)
        if a.ndim else jnp.where(done, b, a), state, fresh)
    return state, obs, reward, done, info


class WorldEnv(Env):
  """Stateful single-env shell with the reference's gym-style API.

  `reset(full_state=|proprio=)` / `step(action)` / `render` mirror the
  reference WorldEnv surface (boxLCD/world_env.py:306,431,514); the pure
  functional methods remain available via the Env base class.
  """

  def __init__(self, world_def, G=None):
    super().__init__(world_def, G)
    self._jit_reset = jax.jit(lambda key: Env.reset(self, key))
    self._jit_teleport_full = jax.jit(
        lambda key, fs: Env.teleport(self, key, full_state=fs))
    self._jit_teleport_pro = jax.jit(
        lambda key, p: Env.teleport(self, key, proprio=p))
    self._jit_step = jax.jit(lambda st, a: Env.step(self, st, a))
    self._jit_observe = jax.jit(lambda st: Env.observe(self, st))
    self._key = jax.random.PRNGKey(0)
    self._state = None
    self.viewer = None

  def seed(self, seed=None):
    self._key = jax.random.PRNGKey(0 if seed is None else seed)
    return [seed]

  def _split(self):
    self._key, k = jax.random.split(self._key)
    return k

  def reset(self, full_state=None, proprio=None):
    if proprio is not None:
      self._state = self._jit_teleport_pro(self._split(),
                                           jnp.asarray(proprio, jnp.float32))
    elif full_state is not None:
      self._state = self._jit_teleport_full(
          self._split(), jnp.asarray(full_state, jnp.float32))
    else:
      self._state = self._jit_reset(self._split())
    obs = self._jit_observe(self._state)
    return jax.tree_util.tree_map(np.asarray, obs)

  def step(self, action):
    self._state, obs, rew, done, info = self._jit_step(
        self._state, jnp.asarray(action, jnp.float32))
    obs = jax.tree_util.tree_map(np.asarray, obs)
    return obs, float(rew), bool(done), {'timeout': bool(done)}

  @property
  def state(self):
    return self._state

  def lcd_render(self, width=None, height=None):
    width = width or self.lcd_w
    height = height or self.lcd_h
    return np.asarray(raster.lcd_render(
        self.spec, self._state.is_circle, self._state.c, self._state.a,
        width, height))

  def render(self, mode='rgb_array', *_, return_pyglet_view=False, **__):
    """rgb_array -> LCD frame; human -> 8x RGB + upscaled LCD side by side,
    blitted into a pyglet window when one is available (headless machines
    get the composed array; reference: world_env.py:514-535)."""
    lcd = self.lcd_render()
    if mode != 'human':
      return lcd
    hi = np.asarray(raster.rgb_render(
        self.spec, self._state.is_circle, self._state.c, self._state.a,
        self.lcd_w * 8, self.lcd_h * 8))
    low = (255 * lcd.astype(np.uint8))[:, :, None]
    low = low.repeat(8, 0).repeat(8, 1).repeat(3, 2)
    sep = np.zeros((hi.shape[0], 1, 3), np.uint8)
    img = np.concatenate([hi, sep, low], axis=1)
    if self.viewer is None:
      from boxlcd_tpu.viewer import make_viewer
      self.viewer = make_viewer(self.lcd_w * 8, self.lcd_h * 8, self.G)
    out = self.viewer.render(img, return_rgb_array=return_pyglet_view)
    return out if return_pyglet_view else img

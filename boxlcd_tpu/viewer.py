"""Optional interactive viewer (reference: boxLCD/viewer.py).

Host-side visualization only — never on the TPU path (SURVEY §2.4: pyglet is
kept as optional CPU viz). When pyglet (and a display) is available, `Viewer`
blits RGB frames into a window exactly like the reference; headless machines
get `ArrayViewer`, which records the frames instead so the same calling code
works everywhere (`WorldEnv.render('human')` uses whichever is available).
"""
from __future__ import annotations

import numpy as np

try:
  import pyglet
  HAVE_PYGLET = True
except Exception:  # pragma: no cover - optional dependency
  pyglet = None
  HAVE_PYGLET = False


class ArrayViewer:
  """Headless drop-in: keeps the most recent frames instead of a window."""

  def __init__(self, width, height, G=None, keep=64):
    self.width = width
    self.height = height
    self.G = G
    self.frames = []
    self._keep = keep

  def render(self, image, return_rgb_array=False):
    self.frames.append(np.asarray(image))
    if len(self.frames) > self._keep:
      self.frames.pop(0)
    return np.asarray(image) if return_rgb_array else None

  def close(self):
    self.frames.clear()


class Viewer:
  """pyglet window blitting pre-rendered RGB arrays
  (reference: viewer.py:4-37)."""

  def __init__(self, width, height, G=None):
    assert HAVE_PYGLET, 'pyglet not available; use ArrayViewer'
    self.window = pyglet.window.Window(2 * width, height)
    self.width = width
    self.height = height
    self.G = G

  def render(self, image, return_rgb_array=False):
    image = np.ascontiguousarray(image, np.uint8)
    self.window.clear()
    self.window.switch_to()
    self.window.dispatch_events()
    img = pyglet.image.ImageData(image.shape[1], image.shape[0], 'RGB',
                                 image.tobytes(), pitch=image.shape[1] * -3)
    img.blit(0, 0)
    arr = None
    if return_rgb_array:
      buffer = pyglet.image.get_buffer_manager().get_color_buffer()
      image_data = buffer.get_image_data()
      arr = np.frombuffer(image_data.get_data(), dtype=np.uint8)
      arr = arr.reshape(buffer.height, buffer.width, 4)[::-1, :, 0:3]
    self.window.flip()
    return arr

  def close(self):
    self.window.close()


def make_viewer(width, height, G=None):
  """The interactive viewer when possible, else the recording fallback."""
  if HAVE_PYGLET:
    try:
      return Viewer(width, height, G)
    except Exception:
      pass
  return ArrayViewer(width, height, G)

"""Video-model registry (reference: research/nets/video_models/__init__.py)."""
import inspect

from research.nets.video_models._base import VideoModel
from research.nets.video_models.fbt import FBT
from research.nets.video_models.fit import FIT
from research.nets.video_models.frnld import FRNLD
from research.nets.video_models.rssm import RSSM

video_map = {}
for _name, _obj in list(globals().items()):
  if inspect.isclass(_obj) and issubclass(_obj, VideoModel) \
      and _obj is not VideoModel:
    video_map[_name] = _obj

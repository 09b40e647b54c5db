"""Model registry (reference: research/nets/__init__.py): auto-discovered
autoencoders + video models."""
from research.nets.autoencoders import ae_map
from research.nets.video_models import video_map

net_map = {}
net_map.update(ae_map)
net_map.update(video_map)

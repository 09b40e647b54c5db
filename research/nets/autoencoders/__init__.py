"""Autoencoder registry (reference: research/nets/autoencoders/__init__.py)."""
import inspect
import sys

from research.nets.autoencoders._base import Autoencoder
from research.nets.autoencoders.bvae import BVAE
from research.nets.autoencoders.vae import VAE
from research.nets.autoencoders.rnlda import RNLDA
from research.nets.autoencoders.arbiter import ArbiterAE
from research.nets.autoencoders.multistep_arbiter import MultiStepArbiter
from research.nets.autoencoders.object_localizer import ObjectLocalizer
from research.nets.autoencoders.vqvae import VQVAE

ae_map = {}
for _name, _obj in list(globals().items()):
  if inspect.isclass(_obj) and issubclass(_obj, Autoencoder) \
      and _obj is not Autoencoder:
    ae_map[_name] = _obj

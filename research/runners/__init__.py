from research.runners.trainer import Trainer
from research.runners.evaler import Evaler

__all__ = ['Trainer', 'Evaler']

from research.runners.trainer import Trainer
from research.runners.evaler import Evaler
from research.runners.vizer import Vizer
from research.runners.fiddler import Fiddler

__all__ = ['Trainer', 'Evaler', 'Vizer', 'Fiddler']

from research.runners.trainer import Trainer
from research.runners.evaler import Evaler
from research.runners.vizer import InteractiveVizer, Vizer
from research.runners.fiddler import Fiddler

__all__ = ['Trainer', 'Evaler', 'Vizer', 'InteractiveVizer', 'Fiddler']

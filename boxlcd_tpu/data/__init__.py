from boxlcd_tpu.data.collect import collect, rollout_batch
from boxlcd_tpu.data.dataset import BARREL_SIZE, RolloutDataset, load_ds

__all__ = ['collect', 'rollout_batch', 'BARREL_SIZE', 'RolloutDataset', 'load_ds']

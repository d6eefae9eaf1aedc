from tpufusion.data.registry import DirSet, read_registry
from tpufusion.data.synthetic import synthesize_dataset, synthesize_points_batch
from tpufusion.data.pipeline import BatchPipeline, epoch_indices

__all__ = [
    "DirSet",
    "read_registry",
    "synthesize_dataset",
    "synthesize_points_batch",
    "BatchPipeline",
    "epoch_indices",
]

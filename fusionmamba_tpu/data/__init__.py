from .datasets import DatasetRoots, FusionDataset, batch_iterator

__all__ = ["DatasetRoots", "FusionDataset", "batch_iterator"]

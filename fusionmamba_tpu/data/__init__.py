from .datasets import (DatasetRoots, FusionDataset,
                       SyntheticFusionDataset, batch_iterator)

__all__ = ["DatasetRoots", "FusionDataset", "SyntheticFusionDataset",
           "batch_iterator"]

from .sharding import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
)

__all__ = ["make_mesh", "param_shardings", "batch_sharding", "replicated"]

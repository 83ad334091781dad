from .seq_scan import selective_scan_seq_parallel, shard_l
from .sharding import (
    batch_sharding,
    make_mesh,
    opt_state_shardings,
    param_shardings,
    replicated,
)

__all__ = [
    "make_mesh", "param_shardings", "batch_sharding", "replicated",
    "opt_state_shardings",
    "selective_scan_seq_parallel", "shard_l",
]

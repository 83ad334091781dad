"""Orbax checkpoint save/load (replaces the reference's torch.save
state_dict files -- SURVEY.md §5.4 -- with sharded, restartable checkpoints:
params + opt state + step counter, none of which the reference persists).

Saves are ASYNC by default semantics of orbax's StandardCheckpointer: one
module-level checkpointer is reused so `save_checkpoint(..., blocking=False)`
returns right after the device->host snapshot and serialization overlaps the
next training steps; `wait_for_saves()` (or the next blocking save) joins.
Restores honor shardings: when the `target` leaves carry NamedShardings
(a TrainState living on a mesh), each array is restored DIRECTLY into its
shard layout -- no host-replicated detour.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp

_CKPTR: ocp.StandardCheckpointer | None = None


def _get_ckptr() -> ocp.StandardCheckpointer:
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def save_checkpoint(path: str, tree: Any, blocking: bool = True) -> None:
    """Save `tree` at `path`. blocking=False schedules the write and
    returns once the arrays are snapshotted off-device (training can
    mutate them immediately); serialization to disk proceeds in the
    checkpointer's background thread."""
    path = os.path.abspath(path)
    ckptr = _get_ckptr()
    ckptr.save(path, tree, force=True)
    if blocking:
        ckptr.wait_until_finished()


def wait_for_saves() -> None:
    """Join any in-flight async saves (call before process exit)."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def _abstract_leaf(x):
    if hasattr(x, "shape") and hasattr(x, "dtype"):
        sharding = getattr(x, "sharding", None)
        if isinstance(sharding, jax.sharding.Sharding):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
        return jax.ShapeDtypeStruct(x.shape, x.dtype)
    return x


def load_checkpoint(path: str, target: Any | None = None) -> Any:
    """Restore from `path`. With a `target` tree, shapes/dtypes are taken
    from it and any leaf that lives on a mesh (NamedSharding) is restored
    straight into that sharding."""
    path = os.path.abspath(path)
    ckptr = _get_ckptr()
    if target is not None:
        abstract = jax.tree.map(_abstract_leaf, target)
        return ckptr.restore(path, abstract)
    return ckptr.restore(path)


def checkpoint_exists(path: str) -> bool:
    return os.path.isdir(os.path.abspath(path))

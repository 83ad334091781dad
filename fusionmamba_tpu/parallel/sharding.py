"""GSPMD sharding: device mesh + parameter/batch partitioning rules.

The reference is single-GPU with no distributed support (SURVEY.md §2.37,
§5.8); this module is the TPU-native scaling layer: a (data, model) mesh,
batch sharded over `data`, and the large projection matrices of SS2D/MLP
sharded over `model` (tensor parallelism). XLA inserts the all-gather /
reduce-scatter collectives; nothing is hand-written, so the same code runs
on 1 chip (trivial mesh) through pods (ICI-aligned axes).
"""
from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Dense kernels worth sharding over the model axis: the SS2D in/out
# projections and the MLP. Kernel layout is (in, out); we shard the output
# dim for in-projections (column parallel) and the input dim for
# out-projections (row parallel), the standard Megatron-style pairing, so a
# single reduce per block suffices.
_COL_PARALLEL = re.compile(r"(in_proj\d?|fc1|expand)/kernel$")
_ROW_PARALLEL = re.compile(r"(out_proj|fc2)/kernel$")

# minimum size of the sharded dim (skip tiny matrices; padding would dominate)
_MIN_SHARD_DIM = 128


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model == n, (n_data, n_model, n)
    return Mesh(devices.reshape(n_data, n_model), ("data", "model"))


def _spec_for(path: str, leaf) -> P:
    if getattr(leaf, "ndim", 0) == 2:
        if _COL_PARALLEL.search(path) and leaf.shape[1] >= _MIN_SHARD_DIM:
            return P(None, "model")
        if _ROW_PARALLEL.search(path) and leaf.shape[0] >= _MIN_SHARD_DIM:
            return P("model", None)
    return P()


def param_shardings(mesh: Mesh, params: Any):
    """PyTree of NamedShardings matching `params` (tensor-parallel rules)."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    specs = []
    for path, leaf in flat[0]:
        path_str = "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path)
        specs.append(NamedSharding(mesh, _spec_for(path_str, leaf)))
    return jax.tree_util.tree_unflatten(flat[1], specs)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def opt_state_shardings(mesh: Mesh, opt_state: Any, params: Any):
    """Shardings for an optax state: any subtree that mirrors the params
    pytree (Adam mu/nu, weight-decay masks, ...) follows the params'
    tensor-parallel shardings; every other leaf (step counters,
    hyperparams) is replicated. Keeps optimizer moments co-located with
    their sharded weights -- the Megatron-style pairing -- so the update
    is local on every chip."""
    p_struct = jax.tree_util.tree_structure(params)
    p_shards = param_shardings(mesh, params)
    rep = replicated(mesh)

    def params_like(x):
        try:
            return jax.tree_util.tree_structure(x) == p_struct
        except Exception:
            return False

    return jax.tree_util.tree_map(
        lambda sub: p_shards if params_like(sub) else rep,
        opt_state, is_leaf=params_like)

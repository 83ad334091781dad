"""Jitted train/eval steps (fusion and segmentation).

Reference training semantics:
  * fusion (`train.py:74-205`): Adam, per-epoch lr = 1e-4 * 0.75^(epoch-1)
    (`train.py:125-131`), output clamped to [0, 1] before the loss
    (`train.py:149-152`), Fusionloss backward/step.
  * segmentation (`train_segmentation.py:288-465`): AdamW 5e-5 + poly LR and
    grad-clip 1.0 for PST900 (`:342-361,462-463`).
Params/opt-state are donated; batch is sharded over the mesh `data` axis and
params follow `parallel.sharding.param_shardings` (dp + tp via GSPMD).
"""
from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from ..losses import fusion_loss, improved_pst900_loss, segmentation_loss


class TrainState(train_state.TrainState):
    pass


def reference_fusion_lr(epoch: int) -> float:
    """`train.py:125-131`: lr_this_epo = 1e-4 * 0.75 ** (epo - 1) with epo
    0-BASED -- so the reference's first epoch runs at 1e-4 / 0.75 ~ 1.333e-4
    (the -1 exponent on epoch 0 is almost certainly unintended upstream, but
    it is what every released model trained with: quirk-for-quirk parity,
    validated by test_optimizer_trajectory_parity). `epoch` here is 1-based
    (epoch = epo + 1)."""
    return 1e-4 * (0.75 ** (epoch - 2))


def poly_lr(base_lr: float, step: int, max_iter: int,
            power: float = 0.9) -> float:
    """`train_segmentation.py:94-100`."""
    return base_lr * (1.0 - step / max_iter) ** power


# elements; leaves >= this update per-leaf. The flatten group's per-step
# grad concatenate is HBM traffic proportional to the flattened bytes,
# while leaves below ~VPU-tile size need the flatten to avoid a
# tiny-fusion storm (see _flatten_small). 128K (16 full (8,128) tiles)
# measured best: full-step 85.3 vs 84.2 pairs/s at the old 1M default
# (r4, bench_artifacts/) -- the 1M threshold flattened ~64M of the ~66M
# params and paid ~2.7 ms/step of concatenate alone.
#
# COMPAT: the threshold decides the opt-state tree partition, so a FULL
# TrainState checkpoint (params + opt_state) saved under one threshold will
# not restore under another (the training CLIs save params only and are
# unaffected). To resume an opt_state saved before the r4 default change,
# set FM_FLATTEN_THRESHOLD=1048576.
import os as _os
_FLATTEN_THRESHOLD = int(_os.environ.get("FM_FLATTEN_THRESHOLD", 128 * 1024))


def _flatten_small(mk_tx: Callable[[], optax.GradientTransformation],
                   threshold: int = _FLATTEN_THRESHOLD):
    """Flatten ONLY the small parameter leaves; large leaves update
    per-leaf.

    Flattening everything (plain `optax.flatten`) makes the Adam step a few
    full-width fused ops, but the per-step grad concatenate it implies is
    pure HBM traffic proportional to TOTAL param bytes -- measured ~8.4
    ms/step at the 164M-param full model, dominated by a handful of big
    matmul kernels that gain nothing from batching (each is already one
    full-width fusion on its own). Updating leaves >= `threshold` elements
    per-leaf and flattening only the long tail of small leaves keeps the
    tiny-fusion fix (~200 sub-VPU-width ops, ~15 ms/step) while skipping
    ~85% of the concatenate bytes."""
    def small_mask(params):
        return jax.tree.map(lambda p: p.size < threshold, params)

    def big_mask(params):
        return jax.tree.map(lambda p: p.size >= threshold, params)

    return optax.chain(
        optax.masked(optax.flatten(mk_tx()), small_mask),
        optax.masked(mk_tx(), big_mask),
    )


def make_fusion_optimizer(lr: float | Callable = 1e-4,
                          flatten: bool = True) -> optax.GradientTransformation:
    """Adam with the reference's lr handling (`train.py:125-131`).

    flatten=True batches the SMALL parameter leaves through `optax.flatten`
    (one concatenated moment vector) and updates large leaves per-leaf --
    see `_flatten_small`. Pass flatten=False when optimizer moments must
    keep per-param shardings (the tensor-parallel path, see
    `opt_state_shardings`)."""
    def mk():
        return optax.inject_hyperparams(optax.adam)(learning_rate=lr)
    return _flatten_small(mk) if flatten else mk()


def make_seg_optimizer(lr: float = 5e-5, clip: float = 1.0,
                       weight_decay: float = 0.01, flatten: bool = True):
    def mk():
        return optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, weight_decay=weight_decay)
    # the global-norm clip must see the WHOLE tree (before any masking)
    inner = _flatten_small(mk) if flatten else mk()
    return optax.chain(optax.clip_by_global_norm(clip), inner)


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Return a new TrainState with the injected learning-rate hyperparam
    replaced (per-epoch decay, `train.py:125-131`).

    Functional rebuild -- no in-place mutation of optax state. Walks the
    (possibly chained / flattened / named) opt-state tree for
    `InjectHyperparamsState` holders and `_replace`s their hyperparams dict;
    raises if none is found so a silently-ignored decay cannot happen when
    the optimizer chain changes shape."""
    found = 0

    def _rebuild(os):
        nonlocal found
        # duck-typed: optax names this InjectHyperparamsState or (newer)
        # InjectStatefulHyperparamsState depending on version
        if hasattr(os, "hyperparams") and hasattr(os, "_replace"):
            hp = dict(os.hyperparams)
            if "learning_rate" in hp:
                found += 1
                hp["learning_rate"] = jnp.asarray(
                    lr, dtype=jnp.asarray(hp["learning_rate"]).dtype)
                return os._replace(hyperparams=hp)
            return os
        if isinstance(os, tuple) and not hasattr(os, "_fields"):
            return tuple(_rebuild(o) for o in os)
        if hasattr(os, "_fields"):  # NamedTuple wrapper (chain/flatten/...)
            return type(os)(*(_rebuild(o) for o in os))
        return os

    new_opt_state = _rebuild(state.opt_state)
    if not found:
        raise ValueError(
            "set_learning_rate: no InjectHyperparamsState with a "
            "'learning_rate' entry in the optimizer state; build the "
            "optimizer with optax.inject_hyperparams "
            "(make_fusion_optimizer / make_seg_optimizer do)")
    return state.replace(opt_state=new_opt_state)


def resolve_compute_dtype(precision: str):
    """Map a CLI --precision flag to a compute dtype.

    "auto" -> bf16 on TPU (the measured-best v5e operating point, PERF.md),
    fp32 everywhere else; "bf16"/"fp32" force the choice."""
    if precision == "bf16":
        return jnp.bfloat16
    if precision == "fp32":
        return jnp.float32
    if precision == "auto":
        return (jnp.bfloat16 if jax.default_backend() == "tpu"
                else jnp.float32)
    raise ValueError(f"unknown precision {precision!r}")


def cast_compute(tree, dtype):
    """Cast float leaves to the compute dtype (mixed precision: fp32 master
    params + optimizer state, bf16 activations/matmuls on the MXU; the
    selective-scan and depthwise-conv kernels force fp32 internally, and
    flax LayerNorm computes statistics in fp32 regardless of input dtype).
    The cast is differentiable, so cotangents arrive back as fp32."""
    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree.map(_cast, tree)


def make_fusion_train_step(model, compute_dtype=jnp.float32,
                           jit: bool = True,
                           scan_guard: bool = False) -> Callable:
    """Returns jitted (state, vis_y, ir, rng) -> (state, metrics).

    compute_dtype: activations dtype inside the forward/backward. bf16 is
    the measured-best operating point on v5e (77 pairs/s at batch 24 vs
    47.4 at batch 12 fp32 -- PERF.md timeline): the Pallas scan and
    depthwise-conv kernels take bf16 I/O natively (halving their HBM
    traffic) while ALL math inside them stays fp32, matching the
    reference's fp32-in-kernel policy; the fp32 loss trajectory matches to
    3 decimals over 12 steps. The CLIs default to precision=auto (bf16 on
    TPU, fp32 elsewhere); this function keeps fp32 as its own default for
    exactness-by-default at the library layer.

    scan_guard=True adds a `scan_sat_margin` metric: the max
    |A|*group-sum(delta) any selective scan in the step saw (the shipped
    cumsum_mm scan is exact only below ops.scan_guard.SATURATION_CLIP,
    72 by default -- the training CLIs log it and warn on approach, so saturated
    decay weights cannot pass silently). Costs ~2 extra passes over the
    UNEXPANDED dt arrays (~1-2% of a step).

    jit=False returns the raw traceable step (for embedding in a larger
    jitted region, e.g. bench.py's multi-step fori_loop).
    """
    import contextlib

    from ..ops.scan_guard import collect_saturation_margins, reduce_margins

    def train_step(state: TrainState, vis_y, ir, rng):
        def loss_fn(params):
            guard_ctx = (collect_saturation_margins() if scan_guard
                         else contextlib.nullcontext([]))
            with guard_ctx as margins:
                gen = model.apply(
                    {"params": cast_compute(params, compute_dtype)},
                    vis_y.astype(compute_dtype),
                    ir.astype(compute_dtype),
                    deterministic=False, rngs={"dropout": rng})
            gen = gen.astype(jnp.float32)
            gen = jnp.clip(gen, 0.0, 1.0)   # train.py:149-152 clamp
            out = fusion_loss(vis_y, ir, gen)
            if scan_guard == "vector":
                return out.total, (out, jnp.stack(margins))
            return out.total, (out, reduce_margins(margins))

        (_, (aux, margin)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        metrics = {
            "loss_total": aux.total,
            "loss_in": aux.loss_in,
            "loss_ssim": aux.ssim_value,
            "loss_grad": aux.loss_grad,
        }
        if scan_guard:
            metrics["scan_sat_margin"] = (
                jnp.max(margin) if margin.ndim else margin)
            if scan_guard == "vector":
                # per-scan margins in trace order (one per selective_scan
                # call) -- the trip-distribution evidence behind the
                # steady-state bench arm (tools/margin_profile.py)
                metrics["scan_sat_margins_vec"] = margin
        return state, metrics

    if jit:
        return jax.jit(train_step, donate_argnums=(0,))
    return train_step


def make_seg_train_step(model, num_classes: int, mode: str = "segmentation",
                        fusion_weight: float = 1.0, seg_weight: float = 1.0,
                        class_weights=None, improved: bool = False,
                        compute_dtype=jnp.float32, scan_guard: bool = False):
    """Seg / combined train step (train_segmentation.py:367-465).

    scan_guard mirrors `make_fusion_train_step`: a `scan_sat_margin`
    metric so a long seg fine-tune drifting past the cumsum rescale clip
    cannot saturate decay weights silently."""
    import contextlib

    from ..ops.scan_guard import collect_saturation_margins, reduce_margins

    @functools.partial(jax.jit, donate_argnums=(0,),
                       static_argnames=())
    def train_step(state: TrainState, vis_y, ir, labels, rng):
        def loss_fn(params):
            variables = {"params": cast_compute(params, compute_dtype),
                         "batch_stats": state.batch_stats}
            guard_ctx = (collect_saturation_margins() if scan_guard
                         else contextlib.nullcontext([]))
            with guard_ctx as margins:
                outs, updates = model.apply(
                    variables,
                    vis_y.astype(compute_dtype), ir.astype(compute_dtype),
                    deterministic=False,
                    return_fusion=(mode != "segmentation"),
                    return_segmentation=(mode != "fusion"),
                    rngs={"dropout": rng}, mutable=["batch_stats"])
            total = 0.0
            metrics = {}
            if "fusion" in outs:
                gen = jnp.clip(outs["fusion"].astype(jnp.float32), 0.0, 1.0)
                f = fusion_loss(vis_y, ir, gen)
                total = total + fusion_weight * f.total
                metrics["fusion_total"] = f.total
            if "segmentation" in outs:
                logits = outs["segmentation"].astype(jnp.float32)
                if improved:
                    s = improved_pst900_loss(logits, labels,
                                             num_classes, class_weights)
                else:
                    s = segmentation_loss(logits, labels,
                                          num_classes, weight=class_weights)
                total = total + seg_weight * s.total
                metrics["seg_total"] = s.total
            metrics["total"] = total
            if scan_guard:
                metrics["scan_sat_margin"] = reduce_margins(margins)
            return total, (metrics, updates)

        (_, (metrics, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=updates["batch_stats"])
        return state, metrics

    return train_step


class SegTrainState(train_state.TrainState):
    batch_stats: Any = None

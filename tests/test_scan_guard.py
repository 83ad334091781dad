"""Saturation guard for the cumsum-family scan algorithms (VERDICT r2 #4):
the shipped default `cumsum_mm` is exact only while |A|*group-sum(delta)
stays inside the +-60 rescale clip (`ops/scan_pallas.py:76-85`). These tests
pin the margin computation, the trace-time collector, and the train-step
metric so saturated decay weights cannot pass silently."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fusionmamba_tpu.ops import selective_scan
from fusionmamba_tpu.ops.scan_guard import (
    SATURATION_CLIP,
    collect_saturation_margins,
    reduce_margins,
    saturation_margin,
)


def _mk(L=256, D=128, N=4, B=2, K=1, dt_const=None, seed=0):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.standard_normal((B, K, L, D)), jnp.float32)
    if dt_const is None:
        dt = jnp.asarray(0.1 * rng.standard_normal((B, K, L, D)), jnp.float32)
    else:
        dt = jnp.full((B, K, L, D), dt_const, jnp.float32)
    A = -jnp.exp(jnp.asarray(rng.uniform(0, 1.5, (K, D, N)), jnp.float32))
    Bm = jnp.asarray(rng.standard_normal((B, K, L, N)), jnp.float32)
    Cm = jnp.asarray(rng.standard_normal((B, K, L, N)), jnp.float32)
    return u, dt, A, Bm, Cm


def test_margin_constant_delta_closed_form():
    """Constant post-softplus delta d and uniform |A| give margin exactly
    q * d * max|A| (the last row of each q=32 group's cumsum)."""
    L, D, N = 256, 128, 4
    dval = 0.5
    # pick delta_raw so softplus(delta_raw) == dval exactly
    draw = float(np.log(np.exp(dval) - 1.0))
    _, dt, A, _, _ = _mk(L=L, D=D, N=N, dt_const=draw)
    m = float(saturation_margin(dt, A, None, delta_softplus=True))
    amax = float(jnp.max(jnp.abs(A)))
    np.testing.assert_allclose(m, 32 * dval * amax, rtol=1e-5)


def test_margin_scales_with_delta_bias():
    u, dt, A, Bm, Cm = _mk()
    bias = jnp.full(A.shape[:2], 2.0, jnp.float32)
    m0 = float(saturation_margin(dt, A, None))
    m1 = float(saturation_margin(dt, A, bias))
    assert m1 > m0  # positive bias raises post-softplus delta everywhere


def test_reference_init_regime_is_inside_clip():
    """At init-regime magnitudes (softplus-inverse dt bias ~= dt in
    [1e-3, 0.1], `models/cross.py:556-566`; |A| <= d_state via S4D init)
    the margin stays below the clip -- the documented envelope."""
    rng = np.random.default_rng(3)
    L, D, N, B, K = 1024, 128, 16, 2, 4
    dt = jnp.asarray(0.1 * rng.standard_normal((B, K, L, D)) - 4.0,
                     jnp.float32)  # softplus ~ 0.02
    A = -jnp.asarray(np.log(np.arange(1, N + 1))[None, None]
                     * np.ones((K, D, 1)), jnp.float32)  # S4D-real init
    m = float(saturation_margin(dt, A, None))
    assert 0.0 < m < SATURATION_CLIP, m


def test_scaled_trained_regime_is_detected():
    """dt drifted up ~x8 of its init ceiling and |A| grown x8 (the
    VERDICT's trained-regime proxy) push the margin PAST the clip -- and
    the guard reports it instead of letting decay weights saturate
    silently."""
    rng = np.random.default_rng(3)
    L, D, N, B, K = 1024, 128, 16, 2, 4
    dt = jnp.asarray(0.1 * rng.standard_normal((B, K, L, D)), jnp.float32)
    bias = jnp.full((K, D), 0.8, jnp.float32)   # softplus ~ 1.17
    A = -8.0 * jnp.asarray(
        np.log(np.arange(1, N + 1))[None, None] * np.ones((K, D, 1)),
        jnp.float32)
    m = float(saturation_margin(dt, A, bias))
    assert m > SATURATION_CLIP, m


def test_collector_records_one_margin_per_scan():
    u, dt, A, Bm, Cm = _mk(L=64, D=128)
    with collect_saturation_margins() as margins:
        selective_scan(u, dt, A, Bm, Cm, delta_softplus=True, impl="assoc")
        selective_scan(u, dt, A, Bm, Cm, delta_softplus=True, impl="ref")
    assert len(margins) == 2
    direct = float(saturation_margin(dt, A, None))
    np.testing.assert_allclose(float(reduce_margins(margins)), direct,
                               rtol=1e-6)
    # collector restored: recording stops outside the context
    selective_scan(u, dt, A, Bm, Cm, delta_softplus=True, impl="assoc")
    assert len(margins) == 2


def test_reduce_margins_empty_is_zero():
    assert float(reduce_margins([])) == 0.0


def test_train_step_emits_margin_metric():
    from fusionmamba_tpu.config import test_config
    from fusionmamba_tpu.models import VSSMFusion
    from fusionmamba_tpu.train import (
        TrainState, make_fusion_optimizer, make_fusion_train_step)

    cfg = test_config(scan_impl="assoc")
    model = VSSMFusion(cfg)
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 1)), jnp.float32)
    x2 = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 1)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x1, x2)
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"],
                              tx=make_fusion_optimizer(1e-4))
    step = make_fusion_train_step(model, scan_guard=True)
    state, metrics = step(state, x1, x2, jax.random.PRNGKey(1))
    m = float(metrics["scan_sat_margin"])
    assert 0.0 < m < SATURATION_CLIP, m

    # guard off: no metric, no margin ops in the program
    step2 = make_fusion_train_step(model, scan_guard=False)
    _, metrics2 = step2(state, x1, x2, jax.random.PRNGKey(1))
    assert "scan_sat_margin" not in metrics2


def test_saturation_action_decision_table():
    """The CLIs' shared margin-response policy (ops/scan_guard.py)."""
    from fusionmamba_tpu.ops.scan_guard import (SATURATION_CLIP,
                                                saturation_action)
    clip = SATURATION_CLIP
    # below everything: silent
    assert saturation_action(1.0, "auto", True) is None
    # near the clip: warn
    assert saturation_action(0.95 * clip, "auto", True) == "warn_near"
    # over the clip on the switchable impl with auto_exact: switch
    assert saturation_action(clip, "auto", True) == "switch"
    assert saturation_action(10 * clip, "auto", True) == "switch"
    # over the clip but auto_exact opted out: warn loudly
    assert saturation_action(2 * clip, "auto", False) == "warn_exceed"
    # explicit (non-"auto") impls are never silently rebuilt
    assert saturation_action(2 * clip, "pallas", True) == "warn_exceed"
    # already on the exact tier: margin is moot, stay quiet
    assert saturation_action(100 * clip, "auto_exact", True) is None
    assert saturation_action(0.95 * clip, "auto_exact", True) is None
    # ANY magnitude-exact impl is exempt, not just auto_exact (ADVICE r4);
    # "adaptive" self-corrects per call and needs no action either
    for impl in ("adaptive", "pallas_exact", "ref", "assoc"):
        assert saturation_action(100 * clip, impl, True) is None, impl
    # a cumsum-family impl forced onto the exact doubling algorithm is
    # exempt too -- and the exemption must NOT leak out of the context
    from fusionmamba_tpu.ops.scan_pallas import force_scan_algo
    with force_scan_algo("doubling"):
        assert saturation_action(100 * clip, "pallas", True) is None
        assert saturation_action(100 * clip, "auto", True) is None
    assert saturation_action(2 * clip, "pallas", True) == "warn_exceed"


def test_adaptive_impl_records_free_margin():
    """impl="adaptive" feeds the guard collector the margin it computes
    anyway (kernel output on TPU, assoc-side computation on CPU) -- one
    margin per scan call, no separate dt materialization."""
    import numpy as np

    from fusionmamba_tpu.ops.scan_guard import (collect_saturation_margins,
                                                reduce_margins)
    from fusionmamba_tpu.ops.selective_scan import selective_scan

    rng = np.random.default_rng(7)
    B, K, L, D, N = 1, 2, 32, 8, 4
    u = jnp.asarray(rng.standard_normal((B, K, L, D)), jnp.float32)
    dt = jnp.asarray(0.2 * np.abs(rng.standard_normal((B, K, L, D))),
                     jnp.float32)
    A = -jnp.exp(jnp.asarray(rng.uniform(0, 1.5, (K, D, N)), jnp.float32))
    Bm = jnp.asarray(rng.standard_normal((B, K, L, N)), jnp.float32)
    Cm = jnp.asarray(rng.standard_normal((B, K, L, N)), jnp.float32)
    with collect_saturation_margins() as margins:
        selective_scan(u, dt, A, Bm, Cm, delta_softplus=True,
                       impl="adaptive")
        selective_scan(u, dt, A, Bm, Cm, delta_softplus=True,
                       impl="adaptive")
    assert len(margins) == 2
    m = float(reduce_margins(margins))
    # cross-check against the standalone margin helper
    from fusionmamba_tpu.ops.scan_pallas import saturation_margin
    want = float(saturation_margin(dt, A, None, True))
    np.testing.assert_allclose(m, want, rtol=1e-5)

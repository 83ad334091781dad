"""Test config.

Default tier: EVERYTHING runs on a local 8-virtual-device CPU backend —
fast, deterministic, no TPU tunnel round trips (SURVEY.md §4: multi-chip
SPMD correctness via fake meshes; kernel math via pallas interpret mode and
the ops' `jax.lax.platform_dependent` CPU fallbacks).

TPU tier: tests marked `@pytest.mark.tpu` exercise the COMPILED Pallas
kernels / the real device and only run with `FM_TESTS_TPU=1` set
(`FM_TESTS_TPU=1 python -m pytest -m tpu tests/`). Without it they are
skipped and the axon/TPU backend is never touched.

Note on mechanics: the axon sitecustomize registers the tunneled TPU
backend at interpreter start and pins `jax_platforms="axon,cpu"`, which
silently overrides the JAX_PLATFORMS env var. Re-pinning via
`jax.config.update("jax_platforms", "cpu")` BEFORE first backend use is
what actually forces the CPU tier.
"""
import os
import sys

os.environ.setdefault("JAX_NUM_CPU_DEVICES", "8")
# persistent compilation cache: TPU-tier compiles through the tunnel take
# tens of seconds each; cache them across test runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

TPU_TIER = os.environ.get("FM_TESTS_TPU") == "1"
if not TPU_TIER:
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: needs the real TPU backend (set FM_TESTS_TPU=1)")
    config.addinivalue_line(
        "markers", "slow: heavy test (torch golden / full configs)")
    config.addinivalue_line(
        "markers", "smoke: fast pure-CPU tier (`pytest -m smoke` targets "
                   "< 3 min cold on a 1-core box; see the verify skill)")


# modules whose non-slow/non-tpu tests form the smoke tier: one fast check
# per layer (kernel math, 2-D layouts, losses, data, guard) -- chosen so a
# COLD `pytest -m smoke` stays < 3 min on the 1-core box (measured 2026-08:
# ~170 s cold / ~105 s warm; checkpoints + the compiled-train-step guard
# test are excluded for their torch-import setup / train-step compile cost)
_SMOKE_MODULES = {
    "test_scan.py",        # scan oracle/assoc/interpret golden + grads
    "test_scan2d.py",      # efficient/cross scan layouts + autodiff
    "test_scan_guard.py",  # saturation margin + collector
    "test_losses.py",      # SSIM/MS-SSIM/Fusionloss vs torch
    "test_data.py",        # dataset discovery/synthetic/prefetch
}

# individually too heavy for the smoke budget (compile-dominated)
_SMOKE_EXCLUDE = {"test_train_step_emits_margin_metric"}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        if (item.fspath.basename in _SMOKE_MODULES
                and item.originalname not in _SMOKE_EXCLUDE
                and "slow" not in item.keywords
                and "tpu" not in item.keywords):
            item.add_marker(pytest.mark.smoke)

    if TPU_TIER:
        return

    skip = pytest.mark.skip(reason="TPU tier disabled (set FM_TESTS_TPU=1)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)

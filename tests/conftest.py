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


def pytest_collection_modifyitems(config, items):
    if TPU_TIER:
        return
    import pytest

    skip = pytest.mark.skip(reason="TPU tier disabled (set FM_TESTS_TPU=1)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)

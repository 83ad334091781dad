"""Test config: force an 8-virtual-device CPU platform so sharding tests run
without TPU hardware (SURVEY.md §4: multi-chip SPMD correctness via fake meshes)."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_NUM_CPU_DEVICES", "8")
# persistent compilation cache: compiles through the tunneled TPU backend
# take tens of seconds each; cache them across test runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# NOTE: in the axon-tunnel environment JAX_PLATFORMS=cpu is ignored and the
# default backend stays TPU; tests that need a multi-device mesh should use
# jax.devices("cpu") (8 virtual devices via JAX_NUM_CPU_DEVICES).

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

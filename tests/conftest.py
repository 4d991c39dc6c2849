"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware via
XLA's host-platform device splitting (the TPU analog of the reference's
single-process CI, SURVEY.md section 4). x64 is enabled so numerical
oracles can be checked at float64 like the reference test-suite.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Don't let estimator fits under test write a persistent compilation
# cache (utils/system.py::enable_compilation_cache honors '' = off).
os.environ.setdefault("MODL_JAX_CACHE", "")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax may already be imported by site customization with JAX_PLATFORMS
# latched to a TPU backend — override through the config API, which works
# as long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled-executable caches at module boundaries.

    A single pytest process compiles ~1000 XLA:CPU programs across the
    suite; leaving them all live eventually segfaults LLVM's JIT inside
    ``backend_compile_and_load`` (observed on 1-core boxes around the
    70% mark — the per-file runs are unaffected). Per-module clearing
    keeps the live-executable count bounded at no measurable cost: each
    file's programs are only reused within that file anyway. Module
    scoping (teardown-side clear) stays correct under plugins that
    interleave tests across modules (pytest-randomly/xdist).
    """
    yield
    jax.clear_caches()

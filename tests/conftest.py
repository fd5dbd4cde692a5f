"""Test configuration: force an 8-virtual-device CPU platform BEFORE jax
imports so every test can exercise mesh/sharding/collective logic without
TPU hardware (SURVEY.md §4 test strategy)."""

import os

# Force CPU unconditionally: the session environment exports
# JAX_PLATFORMS=axon (the real TPU tunnel), but tests must run on the
# 8-virtual-device CPU platform for determinism and mesh coverage.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import pytest  # noqa: E402

# The axon sitecustomize calls jax.config.update("jax_platforms", "axon,cpu")
# at interpreter start, overriding the env var — force it back to cpu before
# any backend initialization so the 8-virtual-device CPU platform is used.
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU platform, got "
    + jax.devices()[0].platform
)


@pytest.fixture(scope="session")
def mesh8():
    from dinomc_tpu.core.mesh import make_mesh

    return make_mesh(jax.devices())


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    A full-suite run compiles hundreds of XLA:CPU programs in one process;
    with that much accumulated LLVM JIT state the compiler has been observed
    to segfault (~180 tests in, during a large grad-graph compile) while the
    same module passes in isolation. Bounding live-executable state per
    module keeps the single-process suite stable; per-test clearing would
    throw away compiles that fixtures intentionally share.

    Set DINOMC_NO_CACHE_CLEAR=1 to disable (the repro handle for chasing
    the underlying XLA:CPU issue; see docs/performance.md test-suite note).
    """
    yield
    if not os.environ.get("DINOMC_NO_CACHE_CLEAR"):
        jax.clear_caches()

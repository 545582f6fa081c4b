import os
import sys

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware, and so the suite never contends with
# benchmark runs for the single tunneled chip.
#
# Forcing CPU needs more than the JAX_PLATFORMS env var: the axon
# sitecustomize hook (triggered by PALLAS_AXON_POOL_IPS at interpreter boot,
# before any conftest runs) force-registers the tunneled TPU backend via
# jax.config — so the config must be overridden back after import.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax
jax.config.update("jax_platforms", "cpu")

# The persistent jit cache is DISABLED for the suite: PJRT
# executable.serialize()/deserialize_executable intermittently segfaults
# for the big fused CPU programs in this image (observed twice at
# jax/_src/compilation_cache.py:238/265), killing the whole run.  CPU
# compiles here are small; correctness beats warm-cache speed.
jax.config.update("jax_enable_compilation_cache", False)

import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _release_jit_memory():
    """Drop compiled executables between test modules.

    The suite compiles hundreds of large fused CPU programs in one
    process; XLA:CPU's in-process JIT eventually segfaults inside
    backend_compile_and_load once enough executable code accumulates
    (deterministic at the same test with the same prefix, passes in
    isolation — observed twice at tests/test_shvc.py in this image).
    Clearing jax's jit caches at module boundaries releases the loaded
    executables and keeps the whole tier comfortably under the limit,
    at the cost of some intra-suite recompiles."""
    yield
    jax.clear_caches()
    gc.collect()


def cpu_subprocess_env():
    """Environment for CLI subprocess tests: CPU jax, no TPU tunnel."""
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("TPU_", "AXON_", "LIBTPU", "PALLAS_AXON"))}
    env["JAX_PLATFORMS"] = "cpu"
    return env

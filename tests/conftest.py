"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic (data-parallel frame sharding, spatial partitioning
with halo exchange) is exercised host-side via
``--xla_force_host_platform_device_count=8``, per the reference test strategy
gap analysis (SURVEY.md section 4, item 6).
"""

import os

# Must happen before jax is imported anywhere. Forced (not setdefault): the
# session may carry an axon/TPU platform which would tunnel every test op.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Deep exact-statistic programs overflow the default 8 MB stack inside the
# XLA:CPU compiler (observed SIGSEGV in backend_compile_and_load); raise the
# limit before any compile can run.
from pqa2_tpu.utils.stacklimit import raise_stack_limit

raise_stack_limit()

import jax

# The environment's sitecustomize can programmatically pin jax_platforms to a
# TPU plugin at interpreter start, overriding the env var — force CPU again at
# the config level before any backend initialises.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_programs_per_module():
    """Free compiled XLA executables at every test-module boundary.

    The full suite compiles hundreds of XLA:CPU programs in one process
    (including the very large interpret-mode exact-statistic cascades); with
    all of them held live by jax's jit caches, the compile of the largest
    program late in the suite dies with a deterministic SIGSEGV inside
    backend_compile_and_load — while the same test passes in a fresh
    process, whatever the stack rlimit (round-3 finding; see
    ROUND3_NOTES.md). Dropping the caches between modules bounds the live
    compiled-code footprint; modules recompile what they share (small —
    programs are mostly module-specific)."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()


@pytest.fixture()
def rng(request):
    # Function-scoped and seeded per test name (stable hash): deterministic
    # data for every test regardless of suite ordering or -k selection.
    import zlib

    seed = zlib.crc32(request.node.name.encode())
    return np.random.default_rng(seed)

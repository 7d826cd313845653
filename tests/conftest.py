"""Test configuration: CPU backend, 8 virtual devices, float64 parity mode.

Parity tests (SURVEY.md §7 "Hard parts", f64 vs TPU) run on the CPU backend
with x64 enabled; multi-device sharding tests use 8 virtual CPU devices via
--xla_force_host_platform_device_count.  The TPU path is exercised by
bench.py / __graft_entry__.py on real hardware.
"""
import os
import sys

# NOTE: this image's sitecustomize imports jax and registers the 'axon' TPU
# platform before conftest runs, so env vars alone don't switch backends —
# the runtime config.update below is what actually selects CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


# The XLA CPU compiler can segfault late in a long single-process run
# (observed compiling the ~180th test's scan after hundreds of cached
# executables; the same test passes in isolation).  Bound accumulated
# compiler/executable state by dropping JAX caches between test modules
# — within-module sharing (the expensive case) is preserved.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()


# r3: the bound above stopped sufficing once test_fused_mc grew past ~75
# tests of Pallas-interpret programs — the segfault moved INSIDE the
# module (observed at the fused-polar-DA while_loop compile, which
# passes in isolation).  Add a within-module bound: drop caches every
# N tests.  Within-module jit reuse mostly spans a handful of
# neighboring tests sharing a helper, so the recompile cost is small
# next to the stability win.
_CLEAR_EVERY = 40
_counter = {"n": 0}


@pytest.fixture(autouse=True)
def _clear_jax_caches_periodically():
    yield
    _counter["n"] += 1
    if _counter["n"] % _CLEAR_EVERY == 0:
        jax.clear_caches()

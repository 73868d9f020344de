"""Test configuration.

Tests run on CPU with 8 virtual devices (the TPU answer to multi-device
testing without a pod: XLA_FLAGS=--xla_force_host_platform_device_count=8).
Set FLAMINGO_TEST_TPU=1 to run on real TPU hardware instead.

Must set env vars before jax is imported anywhere.
"""
import os

if not os.environ.get("FLAMINGO_TEST_TPU"):
    # NB: in environments whose sitecustomize pre-imports jax AND force-
    # registers a TPU platform (the axon TPU kernel image does — its
    # register() call overrides JAX_PLATFORMS, so neither shell env nor
    # os.environ assignments select CPU), the only reliable override is
    # jax.config.update BEFORE the first backend initialization. XLA_FLAGS
    # is still read lazily at CPU-client creation, so the env assignment
    # below works even with jax already imported.
    os.environ.pop("JAX_PLATFORMS", None)
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    # The persistent compilation cache is a TPU deployment feature; inside
    # the CPU suite it only adds risk — a full-suite process at high RSS
    # segfaulted inside jax's cache-entry deserialization (cache READ in
    # compilation_cache.get_executable_and_time), and CPU test compiles are
    # cheap anyway. Tests that exercise the cache itself (test_compile_cache)
    # re-enable it explicitly in subprocess children.
    os.environ.setdefault("FLAMINGO_COMPILE_CACHE", "0")

import sys
import types

import pytest


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    A full-suite single process accumulates ~hundreds of XLA:CPU executables;
    at that point compiling the GSPMD tensor-parallel programs segfaults
    inside backend_compile_and_load (reproducible at tests/test_tp_serving.py
    after the full alphabetical prefix, absent when the same tests run solo
    or after a short prefix — and independent of the persistent compile
    cache). Clearing jax's caches between modules keeps the live-executable
    population bounded; per-module recompiles are the (small) price.
    """
    yield
    import gc

    import jax

    jax.clear_caches()
    gc.collect()


def _install_einops_exts_shim():
    """The reference imports ``einops_exts`` (not installed); it is a tiny
    wrapper over einops, so provide the two functions it uses."""
    if "einops_exts" in sys.modules:
        return
    import einops

    m = types.ModuleType("einops_exts")

    def rearrange_many(xs, *args, **kwargs):
        return [einops.rearrange(x, *args, **kwargs) for x in xs]

    def repeat_many(xs, *args, **kwargs):
        return [einops.repeat(x, *args, **kwargs) for x in xs]

    m.rearrange_many = rearrange_many
    m.repeat_many = repeat_many
    sys.modules["einops_exts"] = m


@pytest.fixture(scope="session")
def reference():
    """Import the PyTorch reference package for numerical parity testing."""
    _install_einops_exts_shim()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import flamingo_mini as ref

    return ref

"""Test configuration.

Tests run on CPU with 8 virtual devices (the TPU answer to multi-device
testing without a pod: XLA_FLAGS=--xla_force_host_platform_device_count=8).
Set FLAMINGO_TEST_TPU=1 to run on real TPU hardware instead.

Must set env vars before jax is imported anywhere.
"""
import os

if not os.environ.get("FLAMINGO_TEST_TPU"):
    # NB: in environments whose sitecustomize pre-imports jax (the axon TPU
    # kernel image does), these assignments are too late — there, launch
    # pytest with `JAX_PLATFORM_NAME=cpu XLA_FLAGS=--xla_force_host_platform_
    # device_count=8` set in the shell instead. Tests that need >= 8 devices
    # skip gracefully when only the TPU chip is visible.
    os.environ.pop("JAX_PLATFORMS", None)
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import sys
import types

import pytest


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

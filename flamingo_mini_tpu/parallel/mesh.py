"""Device mesh construction + multi-host initialization.

Replaces the reference's torchrun/NCCL bootstrap (training/train.sh:36) with
``jax.distributed.initialize`` (DCN rendezvous across hosts) + a named mesh
over all devices (ICI within a slice).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def distributed_init(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host init. No-op on single-process setups; on TPU pods the
    arguments are inferred from the environment when omitted."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (ValueError, RuntimeError):
        pass  # already initialized or single-process


def create_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Build a named mesh.

    Default: all devices on the 'data' axis, 'model' size 1 (pure DP, the
    reference-parity configuration). Pass e.g. shape=(2, 4) for 2-way DP x
    4-way TP.
    """
    if devices is None:
        devices = jax.devices()
        if shape is not None and int(np.prod(shape)) != len(devices):
            # fall back to host CPU devices (virtual-device testing:
            # --xla_force_host_platform_device_count)
            try:
                cpu = jax.devices("cpu")
                if int(np.prod(shape)) == len(cpu):
                    devices = cpu
            except RuntimeError:
                pass
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))

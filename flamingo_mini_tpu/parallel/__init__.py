"""Parallelism tier: device meshes, sharding rules, distributed init.

The reference's only parallelism is torchrun+DDP data parallelism
(/root/reference/training/train.sh:26,31-37; gradient sync inside HF
Trainer). Here parallelism is expressed TPU-natively: a
``jax.sharding.Mesh`` with named axes, NamedSharding rules over the param
pytree, and ``jit``-compiled train/infer steps whose collectives (psum for
grad sync, all-gathers for TP) are inserted by XLA/GSPMD over ICI.
"""
from .mesh import create_mesh, distributed_init
from .sharding import (
    AxisNames, data_sharding, param_shardings, replicate, shard_batch, shard_params,
)

__all__ = [
    "create_mesh", "distributed_init", "AxisNames", "data_sharding",
    "param_shardings", "replicate", "shard_batch", "shard_params",
]

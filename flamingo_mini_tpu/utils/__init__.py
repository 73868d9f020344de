"""Utility tier: weight conversion, param-tree tooling, images, misc."""
from .params import (
    tree_size,
    trainable_mask,
    partition_params,
    merge_params,
)

__all__ = ["tree_size", "trainable_mask", "partition_params", "merge_params"]

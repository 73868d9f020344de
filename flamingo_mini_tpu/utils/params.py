"""Parameter-pytree tooling: sizes, trainable partitioning, merging.

Reproduces the reference's freeze semantics
(/root/reference/flamingo_mini/modeling_flamingo.py:100-138) functionally:
instead of mutating ``requires_grad`` flags, we build a boolean mask pytree
and let optax/`jax.grad` act only on the trainable leaves.

Freeze rules (matching freeze_lm/freeze_vm):
* vision tower: always frozen (the reference additionally runs it under
  ``torch.no_grad()`` regardless of flags; modeling_flamingo.py:169-170).
* LM trunk: frozen EXCEPT the token-embedding matrix (which holds the new
  ``<EOC>`` row; the lm_head is weight-tied so it follows), and all gated
  xattn blocks stay trainable (modeling_flamingo.py:105-119).
* resampler: trainable.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp


def tree_size(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def trainable_mask(
    params: Dict[str, Any],
    *,
    freeze_lm: bool = True,
    freeze_vision: bool = True,
    lm_embed_key: str = "wte",
) -> Dict[str, Any]:
    """Boolean mask pytree: True = trainable.

    ``lm_embed_key`` is the name of the token-embedding leaf inside
    ``params['lm']`` ('wte' for GPT-2, 'embed_tokens' for OPT).
    """

    def mask_subtree(tree, value: bool):
        return jax.tree_util.tree_map(lambda _: value, tree)

    mask: Dict[str, Any] = {}
    for top, sub in params.items():
        if top == "vision":
            # vision encoder never trains, independent of flags
            # (modeling_flamingo.py:169-170 keeps it under no_grad always)
            mask[top] = mask_subtree(sub, False)
        elif top == "lm":
            if freeze_lm:
                m = {}
                for k, v in sub.items():
                    if k == lm_embed_key:
                        m[k] = mask_subtree(v, True)
                    else:
                        m[k] = mask_subtree(v, False)
                mask[top] = m
            else:
                mask[top] = mask_subtree(sub, True)
        else:
            # resampler, xattn blocks: trainable
            mask[top] = mask_subtree(sub, True)
    return mask


def partition_params(params, mask) -> Tuple[Any, Any]:
    """Split params into (trainable, frozen) trees with None holes."""
    trainable = jax.tree_util.tree_map(
        lambda p, m: p if m else None, params, mask,
        is_leaf=lambda x: x is None)
    frozen = jax.tree_util.tree_map(
        lambda p, m: None if m else p, params, mask,
        is_leaf=lambda x: x is None)
    return trainable, frozen


def merge_params(trainable, frozen):
    return jax.tree_util.tree_map(
        lambda t, f: t if t is not None else f, trainable, frozen,
        is_leaf=lambda x: x is None)


def state_dict_trainable(params, mask) -> Dict[str, jnp.ndarray]:
    """Flat {path: leaf} of trainable leaves — the reference's partial
    checkpointing of only-trainable weights (modeling_flamingo.py:125-130)."""
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_m = jax.tree_util.tree_leaves(mask)
    out = {}
    for (path, leaf), m in zip(flat_p, flat_m):
        if m:
            out[jax.tree_util.keystr(path)] = leaf
    return out

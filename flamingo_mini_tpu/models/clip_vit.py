"""CLIP ViT vision tower (JAX, functional).

Replaces the reference's ``CLIPVisionModel.from_pretrained``
(/root/reference/flamingo_mini/modeling_flamingo.py:63, :169-170). The output
consumed by Flamingo is ``last_hidden_state``, which in HF is the final
encoder layer output WITHOUT post_layernorm (post_layernorm only applies to
the pooled CLS vector) — reproduced exactly here.

TPU-first design: the patch convolution is re-expressed as
patch-extraction-by-reshape followed by one large GEMM on the MXU (stride ==
kernel size makes them mathematically identical). The vision tower always
runs under ``stop_gradient`` in Flamingo (the reference keeps it under
``torch.no_grad()`` regardless of freeze flags).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..configuration_flamingo import CLIPViTArch
from ..ops.attention import attend, merge_heads, split_heads
from ..ops.layers import Policy, init_layer_norm, init_linear, layer_norm, linear, get_activation

Params = Dict[str, Any]


def init_clip_vit(key, arch: CLIPViTArch) -> Params:
    d = arch.hidden_size
    keys = jax.random.split(key, 3 + arch.num_hidden_layers)
    layers = []
    for i in range(arch.num_hidden_layers):
        kb = jax.random.split(keys[3 + i], 6)
        layers.append({
            "ln_1": init_layer_norm(d),
            "q_proj": init_linear(kb[0], d, d),
            "k_proj": init_linear(kb[1], d, d),
            "v_proj": init_linear(kb[2], d, d),
            "out_proj": init_linear(kb[3], d, d),
            "ln_2": init_layer_norm(d),
            "fc1": init_linear(kb[4], d, arch.intermediate_size),
            "fc2": init_linear(kb[5], arch.intermediate_size, d),
        })
    patch_dim = arch.patch_size * arch.patch_size * 3
    return {
        "class_embedding": jax.random.normal(keys[0], (d,), jnp.float32) * 0.02,
        "patch_embedding": {"w": jax.random.normal(keys[1], (patch_dim, d), jnp.float32) * 0.02},
        "position_embedding": jax.random.normal(keys[2], (arch.seq_len, d), jnp.float32) * 0.02,
        "pre_layernorm": init_layer_norm(d),
        "layers": layers,
        "post_layernorm": init_layer_norm(d),
    }


def patchify(pixel_values: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(b, c, H, W) -> (b, n_patches, patch*patch*c) rows ordered to match the
    conv-weight reshape in hf_weights.convert_clip_vit (ph, pw, c)."""
    b, c, H, W = pixel_values.shape
    gh, gw = H // patch, W // patch
    x = pixel_values.reshape(b, c, gh, patch, gw, patch)
    # (b, gh, gw, patch_h, patch_w, c)
    x = x.transpose(0, 2, 4, 3, 5, 1)
    return x.reshape(b, gh * gw, patch * patch * c)


def apply_clip_vit(
    p: Params,
    pixel_values: jnp.ndarray,  # (b, 3, H, W)
    *,
    arch: CLIPViTArch,
    policy: Policy,
) -> jnp.ndarray:
    """Returns last_hidden_state (b, 1 + n_patches, d) — pre-post_layernorm,
    matching HF CLIPVisionModel.last_hidden_state."""
    b = pixel_values.shape[0]
    d = arch.hidden_size
    eps = arch.layer_norm_epsilon
    n_head = arch.num_attention_heads
    scale = (d // n_head) ** -0.5

    patches = patchify(policy.cast(pixel_values), arch.patch_size)
    x = linear(patches, p["patch_embedding"], policy)               # (b, n, d)
    cls = jnp.broadcast_to(p["class_embedding"].astype(x.dtype), (b, 1, d))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["position_embedding"].astype(x.dtype)[None]
    x = layer_norm(x, p["pre_layernorm"], eps)

    act = get_activation(arch.activation)
    for bp in p["layers"]:
        residual = x
        h = layer_norm(x, bp["ln_1"], eps)
        q = split_heads(linear(h, bp["q_proj"], policy), n_head)
        k = split_heads(linear(h, bp["k_proj"], policy), n_head)
        v = split_heads(linear(h, bp["v_proj"], policy), n_head)
        if policy.pallas:
            from ..ops.pallas_attn import fused_attention
            out = fused_attention(q, k, v, scale=scale)
        else:
            out = attend(q * jnp.asarray(scale, h.dtype), k, v,
                         precision=policy.precision)
        x = residual + linear(merge_heads(out), bp["out_proj"], policy)

        residual = x
        h = layer_norm(x, bp["ln_2"], eps)
        h = act(linear(h, bp["fc1"], policy))
        x = residual + linear(h, bp["fc2"], policy)

    return x

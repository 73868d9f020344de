"""PerceiverResampler: compress CLIP visual features to a fixed latent set.

Functional re-design of the reference module
(/root/reference/flamingo_mini/perceiver_resampler.py:9-188). Semantics kept
exactly (required for parity):

* latents are learned ``(num_latents, dim)``; time embeddings are learned
  ``(num_time_embeds, 1, dim)`` added per frame before flattening frames.
* each attention layer computes K/V over ``concat(features, latents)``
  (perceiver_resampler.py:65-70), queries from the latents, with q scaled by
  ``dim_head**-0.5`` and an amax-subtracted softmax (":88").
* ``depth`` x (attention + FeedForward) with residuals, then a final LayerNorm.

TPU notes: all matmuls are large batched GEMMs on the MXU; the layer loop is
unrolled at trace time (depth is small, default 6). Input is always the
4-D ``(b, T, v, d)`` layout — images are videos with T=1.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops.attention import attend, merge_heads, split_heads
from ..ops.layers import (
    Policy, feed_forward, init_feed_forward, init_layer_norm, init_linear,
    layer_norm, linear,
)

Params = Dict[str, Any]


def init_perceiver_attention(key, dim: int, dim_head: int, heads: int) -> Params:
    ks = jax.random.split(key, 4)
    inner = dim_head * heads
    return {
        "norm_media": init_layer_norm(dim),
        "norm_latents": init_layer_norm(dim),
        "to_q": init_linear(ks[0], dim, inner, bias=False),
        "to_k": init_linear(ks[1], dim, inner, bias=False),
        "to_v": init_linear(ks[2], dim, inner, bias=False),
        "to_out": init_linear(ks[3], inner, dim, bias=False),
    }


def apply_perceiver_attention(
    p: Params,
    features: jnp.ndarray,   # (b, f, dim)
    latents: jnp.ndarray,    # (b, q, dim)
    *,
    heads: int,
    dim_head: int,
    policy: Policy,
) -> jnp.ndarray:
    """Latents cross-attend to ``concat(features, latents)``. Returns (b, q, dim)."""
    x = layer_norm(features, p["norm_media"])
    lat = layer_norm(latents, p["norm_latents"])

    q = split_heads(linear(lat, p["to_q"], policy), heads)          # (b, h, q, d)
    kv_in = jnp.concatenate([x, lat], axis=1)                        # (b, f+q, dim)
    k = split_heads(linear(kv_in, p["to_k"], policy), heads)
    v = split_heads(linear(kv_in, p["to_v"], policy), heads)

    if policy.pallas:
        from ..ops.pallas_attn import fused_attention
        out = fused_attention(q, k, v, scale=dim_head ** -0.5)
    else:
        q = q * jnp.asarray(dim_head ** -0.5, q.dtype)
        out = attend(q, k, v, stabilize=True, precision=policy.precision)
    return linear(merge_heads(out), p["to_out"], policy)


def init_resampler(
    key,
    *,
    dim: int,
    depth: int,
    dim_head: int = 64,
    heads: int = 8,
    num_latents: int = 64,
    num_time_embeds: int = 4,
    ff_mult: int = 4,
) -> Params:
    k_lat, k_time, *k_layers = jax.random.split(key, 2 + depth)
    layers = []
    for kl in k_layers:
        ka, kf = jax.random.split(kl)
        layers.append({
            "attn": init_perceiver_attention(ka, dim, dim_head, heads),
            "ffw": init_feed_forward(kf, dim, ff_mult),
        })
    return {
        "latents": jax.random.normal(k_lat, (num_latents, dim), jnp.float32),
        "time_pos_emb": jax.random.normal(k_time, (num_time_embeds, 1, dim), jnp.float32),
        "layers": layers,
        "norm": init_layer_norm(dim),
    }


def apply_resampler(
    p: Params,
    x_f: jnp.ndarray,  # (b, T, v, d) visual features (images: T=1)
    *,
    heads: int,
    dim_head: int,
    act: str,
    policy: Policy,
) -> jnp.ndarray:
    """Compress ``(b, T, v, d)`` to ``(b, num_latents, d)``.

    Matches reference perceiver_resampler.py:143-188: add time embeddings per
    frame, flatten frames into the feature axis, run depth x (attn + ffw) with
    residuals, final LayerNorm.
    """
    b, T, v, d = x_f.shape
    x_f = x_f + p["time_pos_emb"][:T].astype(x_f.dtype)      # (T,1,d) broadcast over v
    x_f = x_f.reshape(b, T * v, d)

    x = jnp.broadcast_to(p["latents"].astype(x_f.dtype), (b,) + p["latents"].shape)

    for layer in p["layers"]:
        x = x + apply_perceiver_attention(
            layer["attn"], x_f, x, heads=heads, dim_head=dim_head, policy=policy)
        x = x + feed_forward(x, layer["ffw"], act, policy)

    return layer_norm(x, p["norm"])

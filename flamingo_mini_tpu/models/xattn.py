"""Media-masked gated cross-attention (text queries -> resampled visual tokens).

Functional re-design of the reference
(/root/reference/flamingo_mini/gated_cross_attention.py:15-184). Exact
semantics reproduced:

* ``text_time = media_locations.cumsum(-1)``; ``media_time = arange(n_media)+1``
  broadcast over the ``n_visual`` latents of each image; the attention mask is
  ``text_time == media_time`` — each text token attends ONLY to the most
  recent preceding image (gated_cross_attention.py:97-112; NB the in-code
  comment there describes the ``>=`` variant, but the shipped behavior is
  ``==`` and that is what we match).
* masked logits filled with ``-finfo.max``; amax-subtracted softmax; tokens
  with ``text_time == 0`` get their post-softmax alphas zeroed (":114-121").
* gating: ``y += tanh(alpha_attn) * attn(y); y += tanh(alpha_ffw) * ffw(y)``
  with both alphas initialized to 0 -> identity at init (":155-182").

Design departure from the reference: no layer hijacking / ``condition()``
side-channel (gated_cross_attention.py:187-252). Visual K/V and ``text_time``
are explicit function arguments; the xattn K/V "cache" is just the (k, v)
tuple computed once from the visual features — callers thread it through the
decode loop as a normal pytree.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import attend, merge_heads, split_heads
from ..ops.layers import (
    Policy, feed_forward, init_feed_forward, init_layer_norm, init_linear,
    layer_norm, linear,
)

Params = Dict[str, Any]
KV = Tuple[jnp.ndarray, jnp.ndarray]  # each (b, h, n_media*n_visual, d)


def init_masked_xattn(key, *, dim: int, dim_visual: int, dim_head: int, heads: int) -> Params:
    ks = jax.random.split(key, 3)
    inner = dim_head * heads
    return {
        "norm": init_layer_norm(dim),
        "to_q": init_linear(ks[0], dim, inner, bias=False),
        # one fused (dim_visual, 2*inner) matrix, chunked into K and V —
        # mirrors the reference's to_kv (gated_cross_attention.py:39, :86)
        "to_kv": init_linear(ks[1], dim_visual, inner * 2, bias=False),
        "to_out": init_linear(ks[2], inner, dim, bias=False),
    }


def compute_visual_kv(
    p: Params,
    visual_features: jnp.ndarray,  # (b, n_media, n_visual, d_visual)
    *,
    heads: int,
    policy: Policy,
) -> KV:
    """Project visual features to per-head K/V once (cached across decode steps)."""
    b, n_media, n_visual, d = visual_features.shape
    flat = visual_features.reshape(b, n_media * n_visual, d)
    kv = linear(flat, p["to_kv"], policy)
    k, v = jnp.split(kv, 2, axis=-1)
    return split_heads(k, heads), split_heads(v, heads)


def apply_masked_xattn(
    p: Params,
    y: jnp.ndarray,            # (b, n_token, dim) language features
    kv: KV,                    # visual K/V from compute_visual_kv
    text_time: jnp.ndarray,    # (b, n_token) int: #media at-or-before each token
    *,
    n_visual: int,
    heads: int,
    dim_head: int,
    policy: Policy,
) -> jnp.ndarray:
    """Returns conditioned tokens (b, n_token, dim).

    ``kv`` is either the (k, v) tuple from compute_visual_kv or its int8
    form from ops.quant.quantize_kv_pair (decode reads it every step; int8
    halves that HBM stream)."""
    if isinstance(kv, dict):
        from ..ops.quant import dequantize_kv
        dt = y.dtype
        k = dequantize_kv(kv["k8"], kv["ks"], dt)
        v = dequantize_kv(kv["v8"], kv["vs"], dt)
    else:
        k, v = kv
    n_media = k.shape[2] // n_visual

    y_n = layer_norm(y, p["norm"])
    q = linear(y_n, p["to_q"], policy)
    q = q * jnp.asarray(dim_head ** -0.5, q.dtype)  # reference scales q pre-matmul (":78")
    q = split_heads(q, heads)

    if policy.pallas and y.shape[1] > 1:
        # prefill/training path -> fused Pallas kernel (mask + softmax +
        # no-media zeroing fused in VMEM; q already scaled -> scale=1)
        from ..ops.pallas_xattn import fused_media_xattn
        out = fused_media_xattn(q, k, v, text_time, scale=1.0,
                                n_visual=n_visual)
        return linear(merge_heads(out), p["to_out"], policy)

    # (b, 1, n_token, 1) == (1, 1, 1, n_media*n_visual)
    media_time = jnp.arange(1, n_media + 1, dtype=text_time.dtype)
    media_time = jnp.repeat(media_time, n_visual)
    mask = text_time[:, None, :, None] == media_time[None, None, None, :]

    sim = jnp.matmul(q, jnp.swapaxes(k, -1, -2), precision=policy.precision,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    # dtype-aware fill like the reference's masked_fill(-finfo(sim.dtype).max)
    # (gated_cross_attention.py:112): f32's min would overflow bf16 to -inf
    # and NaN any fully-masked row (e.g. text_time beyond the media count)
    sim = jnp.where(mask, sim, jnp.asarray(jnp.finfo(q.dtype).min, q.dtype))
    sim = sim - jax.lax.stop_gradient(jnp.max(sim, axis=-1, keepdims=True))
    alphas = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(q.dtype)

    # zero attention for text with no preceding media (":117-121")
    no_media = (text_time == 0)[:, None, :, None]
    alphas = jnp.where(no_media, jnp.zeros((), alphas.dtype), alphas)

    out = jnp.matmul(alphas, v, precision=policy.precision,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return linear(merge_heads(out), p["to_out"], policy)


def init_gated_xattn_block(
    key, *, dim: int, dim_visual: int, dim_head: int, heads: int, ff_mult: int,
) -> Params:
    ka, kf = jax.random.split(key)
    return {
        "attn": init_masked_xattn(ka, dim=dim, dim_visual=dim_visual,
                                  dim_head=dim_head, heads=heads),
        "alpha_attn": jnp.zeros((1,), jnp.float32),
        "ffw": init_feed_forward(kf, dim, ff_mult),
        "alpha_ffw": jnp.zeros((1,), jnp.float32),
    }


def apply_gated_xattn_block(
    p: Params,
    y: jnp.ndarray,
    kv: KV,
    text_time: jnp.ndarray,
    *,
    n_visual: int,
    heads: int,
    dim_head: int,
    act: str,
    policy: Policy,
) -> jnp.ndarray:
    """tanh-gated residual xattn + tanh-gated residual FFW (identity at init)."""
    attn_out = apply_masked_xattn(
        p["attn"], y, kv, text_time,
        n_visual=n_visual, heads=heads, dim_head=dim_head, policy=policy)
    y = y + jnp.tanh(p["alpha_attn"]).astype(y.dtype) * attn_out
    y = y + jnp.tanh(p["alpha_ffw"]).astype(y.dtype) * feed_forward(y, p["ffw"], act, policy)
    return y

"""OPT decoder trunk (JAX, functional) with explicit KV cache.

Replaces the reference's frozen HF ``OPTModel`` trunk
(/root/reference/flamingo_mini/modeling_flamingo.py:334-356). Same explicit
``layer_hook`` injection design as gpt2.py.

Numerics match HF ``OPTModel`` eager attention: scores = QK^T * d_head**-0.5
(post-matmul), additive causal+padding mask, fp32 softmax (transformers opt
eager_attention_forward). Learned positional embeddings with offset 2,
positions derived from the attention mask:
``positions = cumsum(mask)*mask - 1`` (HF OPTLearnedPositionalEmbedding).
Activation is relu; pre-norm layout (do_layer_norm_before=True) for all
supported sizes except opt-350m (post-norm + project_in/out).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..configuration_flamingo import OPTArch
from ..ops.attention import attend, merge_heads, split_heads
from ..ops.layers import Policy, init_layer_norm, init_linear, layer_norm, linear, dot, get_activation

Params = Dict[str, Any]
LayerHook = Callable[[int, jnp.ndarray], jnp.ndarray]
Cache = List[Dict[str, jnp.ndarray]]

POS_OFFSET = 2  # HF OPTLearnedPositionalEmbedding offset


def init_opt(key, arch: OPTArch, extra_tokens: int = 1) -> Params:
    n_vocab = arch.vocab_size + extra_tokens
    d = arch.hidden_size
    w = arch.word_embed_proj_dim
    keys = jax.random.split(key, 3 + arch.num_hidden_layers)
    layers = []
    for i in range(arch.num_hidden_layers):
        kb = jax.random.split(keys[3 + i], 6)
        layers.append({
            "attn_ln": init_layer_norm(d),
            "q_proj": init_linear(kb[0], d, d),
            "k_proj": init_linear(kb[1], d, d),
            "v_proj": init_linear(kb[2], d, d),
            "out_proj": init_linear(kb[3], d, d),
            "final_ln": init_layer_norm(d),
            "fc1": init_linear(kb[4], d, arch.ffn_dim),
            "fc2": init_linear(kb[5], arch.ffn_dim, d),
        })
    p: Params = {
        "embed_tokens": jax.random.normal(keys[0], (n_vocab, w), jnp.float32) * 0.02,
        "embed_positions": jax.random.normal(keys[1], (arch.max_position_embeddings + POS_OFFSET, d), jnp.float32) * 0.02,
        "layers": layers,
    }
    if arch.do_layer_norm_before:
        p["final_ln"] = init_layer_norm(d)
    if w != d:
        k1, k2 = jax.random.split(keys[2])
        p["project_in"] = init_linear(k1, w, d, bias=False)
        p["project_out"] = init_linear(k2, d, w, bias=False)
    return p


def init_cache(arch: OPTArch, batch: int, max_len: int, dtype,
               int8: bool = False, flat: bool = False) -> Cache:
    d_head = arch.hidden_size // arch.num_attention_heads
    if flat:
        # T-major (64-multiple, b, hidden) layout for the Pallas
        # decode-attention streaming kernel — see gpt2.init_cache flat notes
        assert not int8, "flat cache is bf16/f32-only"
        fshape = (-(-max_len // 64) * 64, batch, arch.hidden_size)
        return [{"kf": jnp.zeros(fshape, dtype), "vf": jnp.zeros(fshape, dtype)}
                for _ in range(arch.num_hidden_layers)]
    shape = (batch, arch.num_attention_heads, max_len, d_head)
    if int8:
        return [
            {"k8": jnp.zeros(shape, jnp.int8),
             "ks": jnp.zeros(shape[:-1] + (1,), jnp.bfloat16),
             "v8": jnp.zeros(shape, jnp.int8),
             "vs": jnp.zeros(shape[:-1] + (1,), jnp.bfloat16)}
            for _ in range(arch.num_hidden_layers)
        ]
    return [
        {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
        for _ in range(arch.num_hidden_layers)
    ]


def opt_position_ids(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """HF OPT position scheme: cumsum(mask)*mask - 1 (pads get -1 -> clamped
    row 1 of the offset table, exactly as HF indexes offset+pos)."""
    m = attention_mask.astype(jnp.int32)
    return jnp.cumsum(m, axis=1) * m - 1


def apply_opt(
    p: Params,
    input_ids: jnp.ndarray,           # (b, n)
    *,
    arch: OPTArch,
    policy: Policy,
    attention_mask: Optional[jnp.ndarray] = None,  # (b, n_kv) 1=real
    position_ids: Optional[jnp.ndarray] = None,    # (b, n) pre-offset
    layer_hook: Optional[LayerHook] = None,
    cache: Optional[Cache] = None,
    cache_index: Optional[jnp.ndarray] = None,
    dropout_rng=None,                              # training mode when set
    kv_limit: Optional[int] = None,    # static live-prefix length
    ring_mesh=None,                    # context-parallel self-attention
    ring_axis: str = "data",
    beam_anc: Optional[jnp.ndarray] = None,  # (b, kb, max_len) int32: lazy
                                       # beam reorder — cache rows stay put,
                                       # ancestry masks the attention read
) -> Tuple[jnp.ndarray, Optional[Cache]]:
    """Returns (hidden (b, n, word_embed_proj_dim), updated cache)."""
    b, n = input_ids.shape
    flat = cache is not None and "kf" in cache[0]
    if flat:
        n_full = cache[0]["kf"].shape[0]
        n_kv = n  # prefill attends the fresh prompt K/V; decode is in-kernel
    elif cache is not None:
        buf = cache[0]["k8" if "k8" in cache[0] else "k"]
        n_full = buf.shape[2]
        n_kv = n_full if kv_limit is None else kv_limit
    else:
        n_full = n_kv = n

    # ring path: the padding mask is sharded over the sequence axis and its
    # chunks rotate around the ring with K/V (parallel/ring_attention.py)
    ring_pad_mask = attention_mask if ring_mesh is not None else None
    if attention_mask is None:
        attention_mask = jnp.ones((b, n_full), jnp.int32)
    if position_ids is None:
        pos_full = opt_position_ids(attention_mask)  # (b, n_kv) or (b, n)
        if cache is not None:
            position_ids = lax.dynamic_slice_in_dim(pos_full, cache_index, n, axis=1)
        else:
            position_ids = pos_full

    if "embed_tokens_q" in p:
        from ..ops.quant import embed_lookup
        x = embed_lookup(p["embed_tokens_q"], input_ids, policy.dtype)
    else:
        x = p["embed_tokens"].astype(policy.dtype)[input_ids]
    if "project_in" in p:
        x = linear(x, p["project_in"], policy)
    x = x + p["embed_positions"].astype(policy.dtype)[position_ids + POS_OFFSET]
    from ..ops.layers import dropout as _dropout
    if dropout_rng is not None:
        x = _dropout(x, arch.dropout, jax.random.fold_in(dropout_rng, 10_000))

    # additive causal + padding bias, HF-style
    neg = jnp.finfo(jnp.float32).min
    npad = None
    if flat and n == 1:
        # flat-cache decode: validity (npad <= t <= cache_index) lives in
        # the Pallas kernel; left-pad-contiguous masks only
        npad = jnp.argmax(attention_mask, axis=-1).astype(jnp.int32)
        bias = None
    else:
        if cache is not None and not flat:
            q_pos = cache_index + jnp.arange(n, dtype=jnp.int32)
            kv_pos = jnp.arange(n_kv, dtype=jnp.int32)
            causal = (kv_pos[None, :] <= q_pos[:, None])[None, None]
        else:
            causal = jnp.tril(jnp.ones((n, n), bool))[None, None]
        am = attention_mask if attention_mask.shape[-1] == n_kv \
            else attention_mask[:, :n_kv]
        pad_ok = am[:, None, None, :].astype(bool)
        bias = jnp.where(causal & pad_ok, 0.0, neg).astype(policy.dtype)

    n_head = arch.num_attention_heads
    d_head = arch.hidden_size // n_head
    scale = d_head ** -0.5
    eps = arch.layer_norm_epsilon
    new_cache: Optional[Cache] = [] if cache is not None else None

    for i, bp in enumerate(p["layers"]):
        if layer_hook is not None:
            x = layer_hook(i, x)

        residual = x
        h = layer_norm(x, bp["attn_ln"], eps) if arch.do_layer_norm_before else x
        rng_i = None if dropout_rng is None else jax.random.fold_in(dropout_rng, i)
        if flat:
            qf = linear(h, bp["q_proj"], policy)          # (b, n, d)
            kf = linear(h, bp["k_proj"], policy)
            vf = linear(h, bp["v_proj"], policy)
            # T-major write: free reshape at decode, one-time transpose at
            # prefill (see gpt2._self_attention flat notes)
            dm = qf.shape[-1]
            at2 = (cache_index, 0, 0)
            kT = kf.reshape(1, -1, dm) if n == 1 else kf.swapaxes(0, 1)
            vT = vf.reshape(1, -1, dm) if n == 1 else vf.swapaxes(0, 1)
            kbuf = lax.dynamic_update_slice(cache[i]["kf"], kT, at2)
            vbuf = lax.dynamic_update_slice(cache[i]["vf"], vT, at2)
            layer_kv = {"kf": kbuf, "vf": vbuf}
            if n == 1:
                if beam_anc is not None:
                    from ..ops.pallas_decode import decode_attention_beam
                    out2d = decode_attention_beam(
                        qf[:, 0], kbuf, vbuf, beam_anc, npad, cache_index,
                        n_head=n_head, scale=scale,
                        kb=beam_anc.shape[1], kv_limit=kv_limit)
                else:
                    from ..ops.pallas_decode import decode_attention
                    out2d = decode_attention(qf[:, 0], kbuf, vbuf, npad,
                                             cache_index, n_head=n_head,
                                             scale=scale, kv_limit=kv_limit)
                h = linear(out2d[:, None, :], bp["out_proj"], policy)
            else:
                out = attend(split_heads(qf, n_head), split_heads(kf, n_head),
                             split_heads(vf, n_head), scale=scale, bias=bias,
                             precision=policy.precision)
                h = linear(merge_heads(out), bp["out_proj"], policy)
            x = residual + h
            if not arch.do_layer_norm_before:
                x = layer_norm(x, bp["attn_ln"], eps)
            residual = x
            h = layer_norm(x, bp["final_ln"], eps) \
                if arch.do_layer_norm_before else x
            h = get_activation(arch.activation)(linear(h, bp["fc1"], policy))
            h = linear(h, bp["fc2"], policy)
            if rng_i is not None:
                h = _dropout(h, arch.dropout, jax.random.fold_in(rng_i, 1))
            x = residual + h
            if not arch.do_layer_norm_before:
                x = layer_norm(x, bp["final_ln"], eps)
            new_cache.append(layer_kv)
            continue
        q = split_heads(linear(h, bp["q_proj"], policy), n_head)
        k = split_heads(linear(h, bp["k_proj"], policy), n_head)
        v = split_heads(linear(h, bp["v_proj"], policy), n_head)
        layer_kv = None
        if cache is not None:
            if "k8" in cache[i]:
                from ..ops.quant import dequantize_kv, quantize_kv_write
                k8, ks = quantize_kv_write(k)
                v8, vs = quantize_kv_write(v)
                at = (0, 0, cache_index, 0)
                layer_kv = {
                    "k8": lax.dynamic_update_slice(cache[i]["k8"], k8, at),
                    "ks": lax.dynamic_update_slice(cache[i]["ks"], ks, at),
                    "v8": lax.dynamic_update_slice(cache[i]["v8"], v8, at),
                    "vs": lax.dynamic_update_slice(cache[i]["vs"], vs, at),
                }
                lim = slice(None) if kv_limit is None else slice(0, kv_limit)
                k = dequantize_kv(layer_kv["k8"][:, :, lim],
                                  layer_kv["ks"][:, :, lim], q.dtype)
                v = dequantize_kv(layer_kv["v8"][:, :, lim],
                                  layer_kv["vs"][:, :, lim], q.dtype)
            else:
                k = lax.dynamic_update_slice(cache[i]["k"], k, (0, 0, cache_index, 0))
                v = lax.dynamic_update_slice(cache[i]["v"], v, (0, 0, cache_index, 0))
                layer_kv = {"k": k, "v": v}
                if kv_limit is not None:
                    k = k[:, :, :kv_limit]
                    v = v[:, :, :kv_limit]
        if cache is not None and beam_anc is not None:
            # ancestor-indexed beam decode (see ops/attention.attend_beam_lazy);
            # ``bias`` already combines the causal + padding masks, so the
            # helper only adds the ancestry constraint on top
            from ..ops.attention import attend_beam_lazy
            out = attend_beam_lazy(q, k, v, beam_anc, causal=None,
                                   bias=bias, scale=scale,
                                   precision=policy.precision)
        elif cache is None and ring_mesh is not None:
            from ..parallel.ring_attention import ring_attention
            out = ring_attention(q, k, v, mesh=ring_mesh, axis_name=ring_axis,
                                 scale=scale, attention_mask=ring_pad_mask)
        elif cache is None and policy.pallas and rng_i is None:
            from ..ops.pallas_attn import fused_attention
            row = jnp.where(attention_mask.astype(bool), 0.0, neg
                            ).astype(policy.dtype)
            out = fused_attention(q, k, v, scale=scale, causal=True,
                                  row_bias=row)
        else:
            out = attend(q, k, v, scale=scale, bias=bias,
                         precision=policy.precision)
        h = linear(merge_heads(out), bp["out_proj"], policy)
        if rng_i is not None:
            h = _dropout(h, arch.dropout, jax.random.fold_in(rng_i, 0))
        x = residual + h
        if not arch.do_layer_norm_before:
            x = layer_norm(x, bp["attn_ln"], eps)

        residual = x
        h = layer_norm(x, bp["final_ln"], eps) if arch.do_layer_norm_before else x
        h = get_activation(arch.activation)(linear(h, bp["fc1"], policy))
        h = linear(h, bp["fc2"], policy)
        if rng_i is not None:
            h = _dropout(h, arch.dropout, jax.random.fold_in(rng_i, 1))
        x = residual + h
        if not arch.do_layer_norm_before:
            x = layer_norm(x, bp["final_ln"], eps)

        if new_cache is not None:
            new_cache.append(layer_kv)

    if "final_ln" in p:
        x = layer_norm(x, p["final_ln"], eps)
    if "project_out" in p:
        x = linear(x, p["project_out"], policy)
    return x, new_cache


def lm_head(p: Params, hidden: jnp.ndarray, policy: Policy,
            n_valid: Optional[int] = None) -> jnp.ndarray:
    """Tied lm_head: logits = hidden @ embed_tokens^T.

    ``n_valid`` masks logits of vocab-padding rows added for tensor-parallel
    sharding (see gpt2.lm_head)."""
    if "embed_tokens_q" in p:
        q = p["embed_tokens_q"]
        logits = jnp.matmul(hidden, jnp.swapaxes(q["w8"].astype(hidden.dtype), 0, 1),
                            precision=policy.precision,
                            preferred_element_type=jnp.float32)
        logits = (logits * q["scale"]).astype(hidden.dtype)
    else:
        logits = dot(hidden, jnp.swapaxes(
            p["embed_tokens"].astype(hidden.dtype), 0, 1), policy)
    from .gpt2 import _mask_pad_vocab
    return _mask_pad_vocab(logits, n_valid)

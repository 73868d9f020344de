"""GPT-2 decoder trunk (JAX, functional) with explicit KV cache.

Replaces the reference's frozen HF ``GPT2Model`` trunk
(/root/reference/flamingo_mini/modeling_flamingo.py:309-331). We own the
decoder implementation, so Flamingo's gated cross-attention is injected as an
explicit ``layer_hook`` callback before every ``xattn_every``-th block — no
layer hijacking / ``condition()`` side-channel (reference
gated_cross_attention.py:187-252).

Numerics match HF ``GPT2Model`` eager attention for bitwise greedy parity:
QK matmul -> divide by sqrt(d_head) -> causal masked_fill(finfo.min) ->
additive padding bias -> softmax (transformers gpt2 eager_attention_forward).
MLP activation is 'gelu_new' (tanh GELU).

KV cache: preallocated ``(b, h, max_len, d_head)`` per layer, written with
``lax.dynamic_update_slice`` at ``cache_index`` — static shapes throughout,
as required under ``jit``/``lax.while_loop`` decode.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..configuration_flamingo import GPT2Arch
from ..ops.attention import attend, merge_heads, split_heads
from ..ops.layers import Policy, init_layer_norm, init_linear, layer_norm, linear, dot, get_activation

Params = Dict[str, Any]
LayerHook = Callable[[int, jnp.ndarray], jnp.ndarray]
Cache = List[Dict[str, jnp.ndarray]]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_gpt2(key, arch: GPT2Arch, extra_tokens: int = 1) -> Params:
    """Random-init trunk. ``extra_tokens`` adds rows to wte for ``<EOC>``
    (the reference resizes vocab+1; modeling_flamingo.py:323)."""
    n_vocab = arch.vocab_size + extra_tokens
    d = arch.n_embd
    keys = jax.random.split(key, 2 + arch.n_layer)
    blocks = []
    for i in range(arch.n_layer):
        kb = jax.random.split(keys[2 + i], 4)
        blocks.append({
            "ln_1": init_layer_norm(d),
            "c_attn": init_linear(kb[0], d, 3 * d),
            "c_proj": init_linear(kb[1], d, d),
            "ln_2": init_layer_norm(d),
            "mlp_fc": init_linear(kb[2], d, 4 * d),
            "mlp_proj": init_linear(kb[3], 4 * d, d),
        })
    return {
        "wte": jax.random.normal(keys[0], (n_vocab, d), jnp.float32) * 0.02,
        "wpe": jax.random.normal(keys[1], (arch.n_positions, d), jnp.float32) * 0.01,
        "blocks": blocks,
        "ln_f": init_layer_norm(d),
    }


def init_cache(arch: GPT2Arch, batch: int, max_len: int, dtype,
               int8: bool = False, flat: bool = False) -> Cache:
    """Preallocated KV cache. ``int8=True`` stores values as int8 with
    per-position bf16 scales — halves the decode-dominant KV HBM stream.

    ``flat=True`` stores K/V as ``(b, max_len, n_embd)`` — the layout the
    QKV projection produces — instead of per-head ``(b, h, max_len, 64)``.
    The 64-wide minor dim of the head layout is physically padded ~1.6x in
    HBM (XLA tiles minor dims into 128-lane tiles); the flat layout's
    1024-wide minor dim has zero padding, and decode-step attention reads
    it with the Pallas streaming kernel (ops/pallas_decode.py) at the
    chip's full HBM rate instead of the 250-290 GB/s the XLA decode
    fusion reaches (BENCH.md r4). Greedy/sample decode only (beam decode
    keeps the head layout for the ancestry-masked attention)."""
    d_head = arch.n_embd // arch.n_head
    if flat:
        assert not int8, "flat cache is bf16/f32-only (int8 lost on-chip; BENCH.md)"
        # T-MAJOR (T, b, d), T rounded to a 64-multiple: every decode-step
        # attention chunk and every cache write is one contiguous stream
        # (b-major chunks are b strided 64 KB runs — 300 vs 400-470 GB/s,
        # tools/probe_decode_kernel.py), chunks never read past the array,
        # and the zeroed tail makes a V mask unnecessary
        # (ops/pallas_decode.py contract)
        fshape = (-(-max_len // 64) * 64, batch, arch.n_embd)
        return [{"kf": jnp.zeros(fshape, dtype), "vf": jnp.zeros(fshape, dtype)}
                for _ in range(arch.n_layer)]
    shape = (batch, arch.n_head, max_len, d_head)
    if int8:
        return [
            {"k8": jnp.zeros(shape, jnp.int8),
             "ks": jnp.zeros(shape[:-1] + (1,), jnp.bfloat16),
             "v8": jnp.zeros(shape, jnp.int8),
             "vs": jnp.zeros(shape[:-1] + (1,), jnp.bfloat16)}
            for _ in range(arch.n_layer)
        ]
    return [
        {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
        for _ in range(arch.n_layer)
    ]


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def _self_attention(
    bp: Params,
    x: jnp.ndarray,              # (b, n, d)
    *,
    n_head: int,
    causal_mask: jnp.ndarray,    # (b or 1, 1, n, n_kv) bool
    pad_bias: Optional[jnp.ndarray],  # (b, 1, 1, n_kv) additive or None
    layer_cache: Optional[Dict[str, jnp.ndarray]],
    cache_index: Optional[jnp.ndarray],
    eps: float,
    policy: Policy,
    attn_pdrop: float = 0.0,
    dropout_rng=None,
    kv_limit: Optional[int] = None,   # static: attend only cache[:kv_limit]
    ring_mesh=None,                   # context parallelism: shard the seq dim
    ring_axis: str = "data",
    ring_pad_mask: Optional[jnp.ndarray] = None,  # (b, n) 1=real, 0=pad
    beam_anc: Optional[jnp.ndarray] = None,  # (b, kb, max_len) ancestry table
    npad: Optional[jnp.ndarray] = None,  # (b,) first real slot (flat decode)
) -> Tuple[jnp.ndarray, Optional[Dict[str, jnp.ndarray]]]:
    h = layer_norm(x, bp["ln_1"], eps)
    qkv = linear(h, bp["c_attn"], policy)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    d_model = q.shape[-1]

    if layer_cache is not None and "kf" in layer_cache:
        # T-major flat cache (see init_cache flat notes). The decode-step
        # write is a free reshape ((b, 1, d) -> (1, b, d), the 1-dim moves
        # without data movement); the prefill write transposes the prompt
        # K/V once (tiny, one-time)
        n = q.shape[1]
        at2 = (cache_index, 0, 0)
        kT = k.reshape(1, -1, d_model) if n == 1 else k.swapaxes(0, 1)
        vT = v.reshape(1, -1, d_model) if n == 1 else v.swapaxes(0, 1)
        kf = lax.dynamic_update_slice(layer_cache["kf"], kT, at2)
        vf = lax.dynamic_update_slice(layer_cache["vf"], vT, at2)
        new_cache = {"kf": kf, "vf": vf}
        if n == 1:
            # decode step: Pallas streaming attention over the live prefix;
            # beams ride the ancestry-masked variant over the same flat
            # cache (rows never move — r5, VERDICT #4)
            if beam_anc is not None:
                from ..ops.pallas_decode import decode_attention_beam
                out2d = decode_attention_beam(
                    q[:, 0], kf, vf, beam_anc, npad, cache_index,
                    n_head=n_head, scale=1.0 / ((d_model // n_head) ** 0.5),
                    kb=beam_anc.shape[1], kv_limit=kv_limit)
            else:
                from ..ops.pallas_decode import decode_attention
                out2d = decode_attention(
                    q[:, 0], kf, vf, npad, cache_index,
                    n_head=n_head, scale=1.0 / ((d_model // n_head) ** 0.5),
                    kv_limit=kv_limit)
            return linear(out2d[:, None, :], bp["c_proj"], policy), new_cache
        # prefill (cache_index == 0): attend over the fresh prompt K/V —
        # equivalent to masked attention over the buffer, without reading
        # the empty tail
        out = attend(
            split_heads(q, n_head), split_heads(k, n_head),
            split_heads(v, n_head),
            scale=1.0 / ((d_model // n_head) ** 0.5),
            mask=causal_mask, bias=pad_bias, precision=policy.precision,
            dropout_rate=attn_pdrop, dropout_rng=dropout_rng)
        return linear(merge_heads(out), bp["c_proj"], policy), new_cache

    q = split_heads(q, n_head)
    k = split_heads(k, n_head)
    v = split_heads(v, n_head)
    d_head = q.shape[-1]

    new_cache = None
    if layer_cache is not None:
        if "k8" in layer_cache:
            from ..ops.quant import dequantize_kv, quantize_kv_write
            k8, ks = quantize_kv_write(k)
            v8, vs = quantize_kv_write(v)
            at = (0, 0, cache_index, 0)
            new_cache = {
                "k8": lax.dynamic_update_slice(layer_cache["k8"], k8, at),
                "ks": lax.dynamic_update_slice(layer_cache["ks"], ks, at),
                "v8": lax.dynamic_update_slice(layer_cache["v8"], v8, at),
                "vs": lax.dynamic_update_slice(layer_cache["vs"], vs, at),
            }
            lim = slice(None) if kv_limit is None else slice(0, kv_limit)
            k = dequantize_kv(new_cache["k8"][:, :, lim], new_cache["ks"][:, :, lim], q.dtype)
            v = dequantize_kv(new_cache["v8"][:, :, lim], new_cache["vs"][:, :, lim], q.dtype)
        else:
            k = lax.dynamic_update_slice(layer_cache["k"], k, (0, 0, cache_index, 0))
            v = lax.dynamic_update_slice(layer_cache["v"], v, (0, 0, cache_index, 0))
            new_cache = {"k": k, "v": v}
            if kv_limit is not None:
                k = k[:, :, :kv_limit]
                v = v[:, :, :kv_limit]

    if layer_cache is not None and beam_anc is not None:
        # ancestor-indexed beam decode: cache rows never physically reordered
        from ..ops.attention import attend_beam_lazy
        return linear(merge_heads(attend_beam_lazy(
            q, k, v, beam_anc,
            causal=causal_mask,
            bias=pad_bias,
            scale=1.0 / (d_head ** 0.5),
            precision=policy.precision,
        )), bp["c_proj"], policy), new_cache

    if layer_cache is None and ring_mesh is not None:
        # context parallelism: exact causal attention with the sequence
        # sharded over the mesh axis (parallel/ring_attention.py) — the
        # O(n^2) score matrix lives chunked per device
        from ..parallel.ring_attention import ring_attention
        out = ring_attention(q, k, v, mesh=ring_mesh, axis_name=ring_axis,
                             scale=1.0 / (d_head ** 0.5),
                             attention_mask=ring_pad_mask)
    elif layer_cache is None and policy.pallas and dropout_rng is None:
        # full-sequence path -> Pallas fused attention (causal in-kernel,
        # padding as a per-batch row bias); dropout forces the XLA path
        from ..ops.pallas_attn import fused_attention
        row = None if pad_bias is None else pad_bias[:, 0, 0, :]
        out = fused_attention(q, k, v, scale=1.0 / (d_head ** 0.5),
                              causal=True, row_bias=row)
    else:
        out = attend(
            q, k, v,
            scale=1.0 / (d_head ** 0.5),  # HF divides post-matmul
            mask=causal_mask,
            bias=pad_bias,
            precision=policy.precision,
            dropout_rate=attn_pdrop,
            dropout_rng=dropout_rng,
        )
    return linear(merge_heads(out), bp["c_proj"], policy), new_cache


def apply_gpt2(
    p: Params,
    input_ids: jnp.ndarray,            # (b, n)
    *,
    arch: GPT2Arch,
    policy: Policy,
    position_ids: Optional[jnp.ndarray] = None,   # (b, n)
    attention_mask: Optional[jnp.ndarray] = None,  # (b, n_kv) 1=real token
    layer_hook: Optional[LayerHook] = None,
    cache: Optional[Cache] = None,
    cache_index: Optional[jnp.ndarray] = None,     # scalar int32, write offset
    dropout_rng=None,                              # training mode when set
    kv_limit: Optional[int] = None,    # static live-prefix length: attend only
                                       # the first kv_limit cache slots
    ring_mesh=None,                    # context-parallel self-attention: shard
                                       # the sequence over this mesh's axis
    ring_axis: str = "data",
    beam_anc: Optional[jnp.ndarray] = None,  # (b, kb, max_len) int32: lazy
                                       # beam reorder — cache rows stay put,
                                       # ancestry masks the attention read
) -> Tuple[jnp.ndarray, Optional[Cache]]:
    """Run the trunk. Returns final hidden states (b, n, d) and the updated
    cache (None when not caching).

    Without ``cache``: standard full-sequence causal attention over n tokens.
    With ``cache``: K/V are written at ``cache_index``; attention spans the
    full preallocated ``max_len`` with positions masked by causality against
    the absolute query positions (``cache_index + arange(n)``) and by
    ``attention_mask`` over kv slots.
    """
    b, n = input_ids.shape
    if position_ids is None:
        base = jnp.arange(n, dtype=jnp.int32)[None, :]
        position_ids = base + (0 if cache_index is None else cache_index)

    if "wte_q" in p:
        from ..ops.quant import embed_lookup
        tok_emb = embed_lookup(p["wte_q"], input_ids, policy.dtype)
    else:
        tok_emb = p["wte"].astype(policy.dtype)[input_ids]
    x = tok_emb + p["wpe"].astype(policy.dtype)[position_ids]
    if dropout_rng is not None:
        from ..ops.layers import dropout as _dropout
        x = _dropout(x, arch.embd_pdrop, jax.random.fold_in(dropout_rng, 10_000))

    npad = None
    flat = cache is not None and "kf" in cache[0]
    if flat:
        # flat-cache decode: validity is (npad <= t <= cache_index) inside
        # the Pallas kernel — left-pad-contiguous masks only (the generate
        # loop's invariant). Prefill (n > 1, cache_index == 0) attends over
        # the fresh prompt K/V with an (n, n) causal mask.
        if n == 1:
            npad = jnp.argmax(attention_mask, axis=-1).astype(jnp.int32) \
                if attention_mask is not None else jnp.zeros((b,), jnp.int32)
            causal = None
            n_kv = n
        else:
            n_kv = n
            causal = jnp.tril(jnp.ones((n, n), bool))[None, None]
    elif cache is not None:
        buf = cache[0]["k8" if "k8" in cache[0] else "k"]
        n_kv = buf.shape[2] if kv_limit is None else kv_limit
        q_pos = cache_index + jnp.arange(n, dtype=jnp.int32)           # (n,)
        kv_pos = jnp.arange(n_kv, dtype=jnp.int32)                      # (n_kv,)
        causal = (kv_pos[None, :] <= q_pos[:, None])[None, None]        # (1,1,n,n_kv)
    else:
        n_kv = n
        causal = jnp.tril(jnp.ones((n, n), bool))[None, None]

    pad_bias = None
    ring_pad_mask = None
    if attention_mask is not None:
        if ring_mesh is not None:
            # the padding mask is sharded over the sequence axis and its
            # chunks rotate around the ring with K/V (ring_attention)
            ring_pad_mask = attention_mask
        else:
            neg = jnp.finfo(jnp.float32).min
            am = attention_mask if attention_mask.shape[-1] == n_kv \
                else attention_mask[:, :n_kv]
            pad_bias = jnp.where(am[:, None, None, :].astype(bool),
                                 0.0, neg).astype(policy.dtype)

    new_cache: Optional[Cache] = [] if cache is not None else None
    from ..ops.layers import dropout as _dropout
    for i, bp in enumerate(p["blocks"]):
        if layer_hook is not None:
            x = layer_hook(i, x)
        rng_i = None if dropout_rng is None else jax.random.fold_in(dropout_rng, i)
        attn_out, layer_kv = _self_attention(
            bp, x,
            n_head=arch.n_head,
            causal_mask=causal,
            pad_bias=pad_bias,
            layer_cache=None if cache is None else cache[i],
            cache_index=cache_index,
            eps=arch.layer_norm_epsilon,
            policy=policy,
            attn_pdrop=arch.attn_pdrop,
            dropout_rng=None if rng_i is None else jax.random.fold_in(rng_i, 0),
            kv_limit=kv_limit,
            ring_mesh=ring_mesh,
            ring_axis=ring_axis,
            ring_pad_mask=ring_pad_mask,
            beam_anc=beam_anc,
            npad=npad,
        )
        if rng_i is not None:
            attn_out = _dropout(attn_out, arch.resid_pdrop,
                                jax.random.fold_in(rng_i, 1))
        x = x + attn_out
        h = layer_norm(x, bp["ln_2"], arch.layer_norm_epsilon)
        h = linear(h, bp["mlp_fc"], policy)
        h = get_activation(arch.activation)(h)
        h = linear(h, bp["mlp_proj"], policy)
        if rng_i is not None:
            h = _dropout(h, arch.resid_pdrop, jax.random.fold_in(rng_i, 2))
        x = x + h
        if new_cache is not None:
            new_cache.append(layer_kv)

    x = layer_norm(x, p["ln_f"], arch.layer_norm_epsilon)
    return x, new_cache


def lm_head(p: Params, hidden: jnp.ndarray, policy: Policy,
            n_valid: Optional[int] = None) -> jnp.ndarray:
    """Tied lm_head: logits = hidden @ wte^T (GPT-2 ties embeddings).

    ``n_valid``: true vocab row count (incl. <EOC>). When the embedding was
    padded to a mesh multiple for tensor-parallel sharding
    (parallel/sharding.pad_vocab_params), the padded rows are zeros — their
    logits would be 0.0, not -inf — so columns >= n_valid are masked to
    finfo.min before any softmax/argmax consumer sees them."""
    if "wte_q" in p:
        q = p["wte_q"]
        logits = jnp.matmul(hidden, jnp.swapaxes(q["w8"].astype(hidden.dtype), 0, 1),
                            precision=policy.precision,
                            preferred_element_type=jnp.float32)
        logits = (logits * q["scale"]).astype(hidden.dtype)
    else:
        logits = dot(hidden, jnp.swapaxes(p["wte"].astype(hidden.dtype), 0, 1),
                     policy)
    return _mask_pad_vocab(logits, n_valid)


def _mask_pad_vocab(logits: jnp.ndarray, n_valid: Optional[int]) -> jnp.ndarray:
    if n_valid is None or logits.shape[-1] <= n_valid:
        return logits
    cols = jnp.arange(logits.shape[-1])
    neg = jnp.asarray(jnp.finfo(logits.dtype).min, logits.dtype)
    return jnp.where(cols[None, None, :] < n_valid, logits, neg)

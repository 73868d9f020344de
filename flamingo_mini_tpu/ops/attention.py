"""Shared attention core (XLA path).

One `attend` function serves every attention in the framework (perceiver
cross-attention, media-masked text->visual cross-attention, causal LM
self-attention, ViT self-attention). XLA fuses the softmax chain with the
surrounding matmuls; the Pallas fast path lives in ``ops/pallas_attn.py``.

Numerics notes for parity with the reference:
- The reference masks with ``-finfo.max`` then subtracts a detached rowwise
  amax before softmax (/root/reference/flamingo_mini/gated_cross_attention.py:112-115,
  perceiver_resampler.py:88-89). We reproduce exactly that sequence.
- HF GPT-2/OPT/CLIP instead use additive masks with ``finfo.min`` and plain
  softmax; those trunks pass ``bias`` instead of ``mask``.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# Most-negative finite value used by the reference's masked_fill.
NEG_MAX = float(jnp.finfo(jnp.float32).max)


def split_heads(x: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """(b, n, h*d) -> (b, h, n, d)"""
    b, n, hd = x.shape
    return x.reshape(b, n, n_heads, hd // n_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(b, h, n, d) -> (b, n, h*d)"""
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def attend_beam_lazy(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    anc: jnp.ndarray,
    *,
    causal: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    precision=None,
) -> jnp.ndarray:
    """Single-token decode attention over an UNPERMUTED beam KV cache.

    Ancestor-indexed (lazy) beam reorder: instead of physically gathering the
    whole KV cache by parent index every beam step (the reference pays a
    host-side per-tensor ``index_select``,
    /root/reference/flamingo_mini/modeling_flamingo.py:536-547; our previous
    design paid an on-chip full-cache gather + write-back), the cache rows are
    never moved. Each logical beam ``i`` attends over ALL ``kb`` physical
    rows of its batch group, and an ancestry mask keeps exactly the entries
    ``anc[b, i, t] == j`` — the row that logically owns position ``t``. The
    permutation rides in a boolean mask (free: fused into the softmax chain)
    instead of HBM traffic; K/V are read once, nothing is written back. The
    score compute grows ``kb``× in FLOPs, which is noise in the
    bandwidth-bound decode regime.

    LAYOUT/LOWERING-CRITICAL (measured on TPU v5e, flamingo-mini beam-3
    bs=32): the cross-beam scores must be computed as ``kb`` SEPARATE
    rows-1 einsums ("Bhd,Bhtd->Bht"), one per beam offset — XLA
    multi-output-fuses them into a single streaming pass over the K/V cache
    (+1.4 ms/step over plain decode attention for kb=3). Every "natural"
    alternative is catastrophically slower inside the decode loop:
    a 5-D batched einsum over a split (b, beam) axis forces a physical
    relayout COPY of the whole sliced cache per layer per step, and even a
    layout-clean packed (B, h, kb, d) x (B, h, T, d) dot lowers to ~1536
    tiny MXU matmuls instead of the streaming reduce (+17 ms/step either
    way). All ancestry masking / joint softmax below runs on score-sized
    (~1 MB) tensors; only the rows-1 einsums touch the cache.

    Exactness: every valid (i, t) score is the same dot product the gathered
    layout would compute; masked entries softmax to exact 0.0 in fp32, so the
    output matches the physical-gather path.

    Args:
      q: (b*kb, h, 1, d) one query per logical beam.
      k, v: (b*kb, h, T, d) physical cache, possibly kv_limit-sliced.
      anc: (b, kb, >=T) int32 ancestry table (sliced to T here).
      causal: optional bool, broadcastable to (1, 1, 1, T) — kv_pos <= q_pos.
      bias: optional additive mask (b*kb, 1, 1, T) (HF padding convention).
      scale: post-matmul score multiplier (HF divides after the QK matmul).
    """
    dtype = q.dtype
    bk, h, _, d = q.shape
    T = k.shape[2]
    b, kb = anc.shape[0], anc.shape[1]
    assert b * kb == bk, (b, kb, bk)
    qr = q.reshape(b, kb, h, d)
    ar = jnp.arange(kb)
    # scores, one streaming rows-1 pass per beam offset o: physical row
    # r = (b, j) scores the query of logical beam i = (j + o) % kb
    sims = []                                                   # o -> (b,j,h,t)
    for o in range(kb):
        qo = qr[:, (ar + o) % kb].reshape(bk, h, d)
        so = jnp.einsum("Bhd,Bhtd->Bht", qo, k, precision=precision,
                        preferred_element_type=jnp.float32)
        sims.append(so.reshape(b, kb, h, T))
    # logical layout (b, i, h, j, t): sim for (i, j) sits in pass o=(i-j)%kb
    sim_l = jnp.stack([
        jnp.stack([sims[(i - j) % kb][:, j] for j in range(kb)], axis=2)
        for i in range(kb)], axis=1)                            # (b,i,h,j,t)
    if scale is not None:
        sim_l = sim_l * jnp.asarray(scale, jnp.float32)
    valid = anc[:, :, :T][:, :, None, :] == \
        ar[None, None, :, None]                                 # (b, i, j, t)
    mask = valid[:, :, None]                                    # (b, i, 1, j, t)
    if causal is not None:
        mask = mask & jnp.reshape(causal, causal.shape[-1:])    # broadcast t
    neg = jnp.float32(jnp.finfo(jnp.float32).min)
    sim_l = jnp.where(mask, sim_l, neg)
    if bias is not None:
        # padding bias per logical query row i (beam-invariant over j)
        sim_l = sim_l + bias.astype(jnp.float32).reshape(b, kb, 1, 1, T)
    sim_l = jnp.maximum(sim_l, neg)
    # joint softmax over (j, t) per logical beam i, fp32
    m = jnp.max(sim_l, axis=(3, 4), keepdims=True)
    p = jnp.exp(sim_l - m)
    p = jnp.where(mask, p, 0.0)
    l = jnp.sum(p, axis=(3, 4), keepdims=True)
    al = p / jnp.maximum(l, jnp.float32(1e-30))                 # (b,i,h,j,t)
    # output: one streaming rows-1 pass per offset; pass o weights row
    # r = (b, j) by logical beam i = (j + o) % kb's alphas for that row
    out = jnp.zeros((b, kb, h, d), jnp.float32)
    for o in range(kb):
        ao = jnp.stack([al[:, (j + o) % kb, :, j, :]            # (b, h, t)
                        for j in range(kb)], axis=1)            # (b, j, h, t)
        oo = jnp.einsum("Bht,Bhtd->Bhd", ao.reshape(bk, h, T).astype(dtype),
                        v, precision=precision,
                        preferred_element_type=jnp.float32)     # (B, h, d)
        # contribution of row j lands on logical beam i = (j + o) % kb
        oo = oo.reshape(b, kb, h, d)
        out = out.at[:, (ar + o) % kb].add(oo)
    return out.astype(dtype).reshape(bk, h, d)[:, :, None, :]


def attend(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mask: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    stabilize: bool = False,
    precision=None,
    dropout_rate: float = 0.0,
    dropout_rng=None,
) -> jnp.ndarray:
    """Scaled-dot-product attention core.

    Args:
      q: (..., n_q, d) — already scaled by the caller (the reference scales q
         by dim_head**-0.5 before the QK matmul).
      k, v: (..., n_kv, d)
      mask: optional boolean (broadcastable to (..., n_q, n_kv)); False
         positions are filled with ``-finfo.max`` (reference masked_fill).
      bias: optional additive float mask (HF-style, already contains
         finfo.min at disallowed positions).
      scale: optional multiplier applied to the raw scores *after* the QK
         matmul (HF GPT-2 divides scores by sqrt(d) post-matmul; pre-scaling q
         gives ulp-different results, which matters for bitwise greedy parity).
      stabilize: subtract detached rowwise amax before softmax (the
         reference's explicit stabilization; mathematically a no-op but kept
         for exact numerics in parity mode).

    Returns (..., n_q, d).
    """
    dtype = q.dtype
    sim = jnp.matmul(q, jnp.swapaxes(k, -1, -2), precision=precision,
                     preferred_element_type=jnp.float32).astype(dtype)
    if scale is not None:
        sim = sim * jnp.asarray(scale, dtype)
    # masked_fill (where) comes before the additive bias: HF GPT-2 applies the
    # causal where(finfo.min) first, then adds the padding bias. finfo.min is
    # the same value as -finfo.max, so one constant serves both conventions.
    # The fill must be finite IN THE COMPUTE DTYPE (the torch reference's
    # masked_fill(-finfo(sim.dtype).max) is dtype-aware too): f32's min cast
    # to bf16 overflows to -inf, and a fully-masked row (e.g. a left-pad
    # query) would then softmax to NaN and 0*NaN-poison every downstream
    # matmul. The clamp also absorbs causal-fill + pad-bias double counting.
    if mask is not None or bias is not None:
        neg = jnp.asarray(jnp.finfo(dtype).min, dtype)
        if mask is not None:
            sim = jnp.where(mask, sim, neg)
        if bias is not None:
            sim = sim + bias.astype(dtype)
        sim = jnp.maximum(sim, neg)
    if stabilize:
        sim = sim - jax.lax.stop_gradient(jnp.max(sim, axis=-1, keepdims=True))
    # softmax in fp32 for bf16 stability
    alphas = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(dtype)
    if dropout_rng is not None and dropout_rate > 0.0:
        # attention-prob dropout (HF training mode)
        from .layers import dropout as _dropout
        alphas = _dropout(alphas, dropout_rate, dropout_rng)
    out = jnp.matmul(alphas, v, precision=precision,
                     preferred_element_type=jnp.float32).astype(dtype)
    return out

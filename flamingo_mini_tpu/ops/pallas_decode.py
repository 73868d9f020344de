"""Pallas TPU decode-step attention over a FLAT (b, T, h*dh) KV cache.

Replaces the XLA decode attention (ops/attention.attend inside the generate
while_loop) on two measured grounds (tools/probe_stream.py, BENCH.md r4):

1. **Layout**: the (b, h, T, dh=64) cache layout is physically padded 1.6x in
   HBM (XLA tiles the 64-wide minor dim into 128-lane tiles), so every decode
   step streams 1.6x the logical KV bytes. The flat (b, T, h*dh) layout has a
   1024-wide minor dim — zero padding — and is what the QKV projection
   produces anyway (no per-step split_heads relayout).
2. **Bandwidth**: a Pallas kernel streams HBM at ~700 GB/s on this chip where
   the XLA decode-attention fusion reaches ~195-290 GB/s (the r2/r3
   decomposition's ceiling). Attention at decode is a batched matvec —
   bandwidth-bound — so the stream rate is the whole game.

Per-head scores from the flat layout WITHOUT relayout, via a block-diagonal
selector on the MXU: with E[d, j] = (d // dh == j),

    Qmat = E * q^T                  (D, H)  — q's values routed per head
    scores = K @ Qmat               (T, D) x (D, H) -> (T, H)
    alphas = softmax_T(scores)      (masked: npad <= t <= cur)
    alE    = alphas @ E^T           (T, H) x (H, D) -> (T, D)
    out    = sum_T(alE * V)         (1, D)

Both cache streams (K, V) flow through MXU/VPU at full 128-lane utilization.
The T axis is chunked into grid steps with online softmax (flash-style
running max/sum), so VMEM holds only (block_t, D) tiles and any max_length
fits; Pallas double-buffers the chunk DMA across grid steps.

Semantics match gpt2/opt decode attention exactly: scores scaled by
``scale`` post-matmul, masked with f32 min where invalid, softmax in f32,
alphas cast to the compute dtype before weighting V (f32 accumulation) —
the reference chain of /root/reference/flamingo_mini/modeling_flamingo.py's
HF attention (see ops/attention.attend notes). Left-padded prompts are
handled by per-row ``npad`` (first real slot); generated slots are valid
iff ``t <= cur``.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = float(jnp.finfo(jnp.float32).min)


def _decode_kernel(scal_ref, q_ref, k_ref, v_ref, o_ref,
                   m_ref, l_ref, acc_ref, *,
                   n_head: int, scale: float, block_t: int):
    """Grid (b, n_chunks); chunk axis innermost (sequential, online softmax).

    scal_ref (SMEM, int32, (b + 1,)): per-row first-valid slot ``npad``
    followed by the scalar ``cur`` (last valid slot).
    """
    bi = pl.program_id(0)
    tj = pl.program_id(1)
    b = q_ref.shape[0]
    T_blk, D = k_ref.shape[1], k_ref.shape[2]
    dh = D // n_head
    npad = scal_ref[bi]
    cur = scal_ref[pl.num_programs(0)]

    @pl.when(tj == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # row bi of the resident (b, D) query block, via an iota-mask reduce
    # (TPU block shapes must tile (8, 128) or equal the array; a (1, D)
    # sliced block would violate that for small b)
    q_rows = lax.broadcasted_iota(jnp.int32, (b, 1), 0) == bi
    q = jnp.sum(jnp.where(q_rows, q_ref[...].astype(jnp.float32), 0.0),
                axis=0, keepdims=True)                      # (1, D)
    # block-diagonal head selector E (D, H) routes q's values per head:
    # qm = E * q^T via (H, D)-side ops only (no lane->sublane transpose)
    selT = jnp.where((lax.broadcasted_iota(jnp.int32, (n_head, D), 1) // dh)
                     == lax.broadcasted_iota(jnp.int32, (n_head, D), 0),
                     1.0, 0.0)                              # (H, D) f32
    qmT = selT * q                                          # (H, D) routed q

    k = k_ref[0]                                            # (T_blk, D)
    s = lax.dot_general(k, qmT.astype(k.dtype), (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (T_blk, H)
    s = s * scale

    t_pos = tj * T_blk + lax.broadcasted_iota(jnp.int32, (T_blk, n_head), 0)
    valid = (t_pos >= npad) & (t_pos <= cur)
    s = jnp.where(valid, s, NEG)

    m_prev = m_ref[...]                                     # (1, H)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)                         # (1, H)
    p = jnp.where(valid, jnp.exp(s - m_new), 0.0)           # (T_blk, H)
    l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=0, keepdims=True)
    m_ref[...] = m_new

    # expand per-head weights to the flat D axis (MXU routing, no relayout);
    # cast to the compute dtype first — matches the XLA path's
    # alphas.astype(dtype) before the V matmul (ops/attention.attend)
    pE = lax.dot_general(p.astype(k.dtype), selT.astype(k.dtype),
                         (((1,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)  # (T_blk, D)
    alphaE = lax.dot_general(alpha, selT, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (1, D)
    # mask V rows too: OOB pad lanes of a partial boundary block are
    # unspecified (NaN in interpret mode) and 0 * NaN = NaN
    v_valid = valid[:, :1]                                   # (T_blk, 1)
    vv = jnp.where(v_valid, v_ref[0].astype(jnp.float32), 0.0)
    contrib = jnp.sum(pE * vv, axis=0, keepdims=True)
    acc_ref[...] = acc_ref[...] * alphaE + contrib

    @pl.when(tj == pl.num_programs(1) - 1)
    def _finish():
        lE = lax.dot_general(l_ref[...], selT, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
        row = (acc_ref[...] / jnp.maximum(lE, 1e-30)).astype(o_ref.dtype)
        # scatter row bi into the resident (b, D) output block
        o_ref[...] = jnp.where(q_rows, row, o_ref[...])


@functools.partial(jax.jit, static_argnames=(
    "n_head", "scale", "kv_limit", "block_t", "interpret"))
def decode_attention(
    q: jnp.ndarray,        # (b, D) current token's query (unscaled)
    k_cache: jnp.ndarray,  # (b, max_len, D) flat K cache
    v_cache: jnp.ndarray,  # (b, max_len, D) flat V cache
    npad: jnp.ndarray,     # (b,) int32 first real (non-pad) slot per row
    cur: jnp.ndarray,      # () int32 last valid slot (== current write pos)
    *,
    n_head: int,
    scale: float,
    kv_limit: Optional[int] = None,   # static live-prefix bound (<= max_len)
    block_t: int = 128,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Single-token decode attention over the flat cache. Returns (b, D).

    The full cache buffers are passed (never sliced — a slice would
    materialize a copy of the live cache every step); the grid only COVERS
    ceil(kv_limit / block_t) chunks, so per-step HBM traffic is the live
    prefix rounded up to ``block_t``. Slots beyond ``cur`` (zeros, or stale
    beam rows) are masked in-kernel.
    """
    b, max_len, D = k_cache.shape
    assert D % n_head == 0
    T = max_len if kv_limit is None else min(kv_limit, max_len)
    # keep the chunk a sublane multiple (bf16 tiles are (16, 128)); a partial
    # final chunk never hurts — boundary blocks are padded + masked
    blk = min(block_t, -(-max(T, 16) // 16) * 16)
    n_chunks = pl.cdiv(T, blk)
    # A partial final chunk may read past T (or even max_len): Pallas pads
    # boundary blocks, the lanes are unspecified, and the t<=cur validity
    # mask (cur < max_len always) zeroes them — the standard flash pattern.
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")

    scal = jnp.concatenate([npad.astype(jnp.int32),
                            jnp.reshape(cur, (1,)).astype(jnp.int32)])
    grid = (b, n_chunks)
    out = pl.pallas_call(
        functools.partial(_decode_kernel, n_head=n_head, scale=float(scale),
                          block_t=blk),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((b, D), lambda i, j: (0, 0)),   # resident q block
            pl.BlockSpec((1, blk, D), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, blk, D), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((b, D), lambda i, j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, n_head), jnp.float32),   # running max
            pltpu.VMEM((1, n_head), jnp.float32),   # running sum
            pltpu.VMEM((1, D), jnp.float32),        # output accumulator
        ],
        interpret=interpret,
    )(scal, q, k_cache, v_cache)
    return out


def decode_attention_reference(q, k_cache, v_cache, npad, cur, *,
                               n_head: int, scale: float,
                               kv_limit: Optional[int] = None):
    """XLA reference with identical semantics (tests; shapes as above)."""
    b, max_len, D = k_cache.shape
    dh = D // n_head
    T = max_len if kv_limit is None else min(kv_limit, max_len)
    k = k_cache[:, :T].reshape(b, T, n_head, dh).transpose(0, 2, 1, 3)
    v = v_cache[:, :T].reshape(b, T, n_head, dh).transpose(0, 2, 1, 3)
    qh = q.reshape(b, 1, n_head, dh).transpose(0, 2, 1, 3)   # (b, h, 1, dh)
    s = jnp.einsum("bhqd,bhtd->bhqt", qh.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    t_pos = jnp.arange(T)
    valid = (t_pos[None, :] >= npad[:, None]) & (t_pos[None, :] <= cur)
    s = jnp.where(valid[:, None, None, :], s, NEG)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    o = jnp.einsum("bhqt,bhtd->bhqd", p.astype(jnp.float32),
                   v.astype(jnp.float32))
    return o.transpose(0, 2, 1, 3).reshape(b, D).astype(q.dtype)

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
selector on the MXU: with selT[h, d] = (d // dh == h),

    qr     = selT * q[:, None, :]        (B, H, D) — q's values routed per head
    scores = K x qr  ("btd,bhd->bth")    batched MXU, contract D
    alphas = softmax_T(scores)           (masked: npad <= t <= cur)
    bhd    = alphas^T x V ("bth,btd->bhd")
    out    = sum_h bhd * selT            ("bhd,hd->bd")

Both cache streams (K, V) flow through the MXU at full 128-lane utilization;
nothing is ever transposed or re-laid-out. The grid is
(b-blocks, T-chunks) with the T axis innermost (sequential): online softmax
(flash-style running max/sum) carries (B_blk, H) statistics and a
(B_blk, D) output accumulator in VMEM scratch, so any max_length fits and
Pallas double-buffers the next chunk's DMA behind the current compute. The
whole batch rides in ONE grid row by default — the v1 per-row grid paid a
~1.75 us/step grid overhead x 32 rows x 24 layers ~= 1.3 ms/step; batching
rows cuts the grid to ~ceil(T/block_t) steps per layer (measured ladder in
BENCH.md r4).

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


def _decode_kernel(cur_ref, npad_ref, q_ref, k_ref, v_ref, o_ref,
                   m_ref, l_ref, acc_ref, *,
                   n_head: int, scale: float):
    """Grid (b-blocks, T-chunks); chunk axis innermost (sequential, online
    softmax). cur_ref (SMEM, (1,)): last valid slot. npad_ref (VMEM,
    (B_blk, 128) int32, lane-broadcast): per-row first real slot."""
    tj = pl.program_id(1)
    B, T_blk, D = k_ref.shape
    dh = D // n_head
    cur = cur_ref[0]

    @pl.when(tj == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # block-diagonal head selector (H, D) and the per-row routed query
    selT = jnp.where((lax.broadcasted_iota(jnp.int32, (n_head, D), 1) // dh)
                     == lax.broadcasted_iota(jnp.int32, (n_head, D), 0),
                     1.0, 0.0)                              # (H, D) f32
    q = q_ref[...].astype(jnp.float32)                      # (B, D)
    qr = selT[None] * q[:, None, :]                         # (B, H, D)

    k = k_ref[...]                                          # (B, T_blk, D)
    s = lax.dot_general(k, qr.astype(k.dtype),
                        (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)  # (B, T_blk, H)
    s = s * scale

    # validity mask built directly in 3D — Mosaic rejects minor-dim inserts
    # on sub-32-bit (bool) values, so the comparisons run on 3D int32 iotas
    t_pos = tj * T_blk + lax.broadcasted_iota(jnp.int32, (B, T_blk, n_head), 1)
    npad3 = jnp.broadcast_to(npad_ref[:, :1][:, :, None],
                             (B, T_blk, n_head))
    valid = (t_pos >= npad3) & (t_pos <= cur)               # (B, T_blk, H)
    s = jnp.where(valid, s, NEG)

    m_prev = m_ref[...]                                     # (B, H)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1))
    alpha = jnp.exp(m_prev - m_new)                         # (B, H)
    p = jnp.where(valid, jnp.exp(s - m_new[:, None, :]), 0.0)
    l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=1)
    m_ref[...] = m_new

    # V needs no mask: the caller guarantees blocks never read past the
    # cache array (cache length is a block multiple) and unwritten cache
    # slots are REAL zeros, so invalid rows enter the dot with p == 0
    # against finite values
    vv = v_ref[...].astype(jnp.float32)
    # alphas cast to the compute dtype before weighting V — matches the XLA
    # path's alphas.astype(dtype) (ops/attention.attend)
    bhd = lax.dot_general(p.astype(k.dtype).astype(jnp.float32), vv,
                          (((1,), (1,)), ((0,), (0,))),
                          preferred_element_type=jnp.float32)  # (B, H, D)
    contrib = jnp.sum(bhd * selT[None], axis=1)             # (B, D)
    alphaE = lax.dot_general(alpha, selT, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (B, D)
    acc_ref[...] = acc_ref[...] * alphaE + contrib

    @pl.when(tj == pl.num_programs(1) - 1)
    def _finish():
        lE = lax.dot_general(l_ref[...], selT, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
        o_ref[...] = (acc_ref[...] / jnp.maximum(lE, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "n_head", "scale", "kv_limit", "block_t", "block_b", "interpret"))
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
    block_t: Optional[int] = None,
    block_b: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Single-token decode attention over the flat cache. Returns (b, D).

    The full cache buffers are passed (never sliced — a slice would
    materialize a copy of the live cache every step); the grid only COVERS
    ceil(kv_limit / block_t) chunks, so per-step HBM traffic is the live
    prefix rounded up to ``block_t``. Slots beyond ``cur`` (zeros, or stale
    beam rows) and partial-boundary-block padding are masked in-kernel.
    """
    b, max_len, D = k_cache.shape
    assert D % n_head == 0
    # the no-V-mask contract: chunks must never read past the cache array
    # (n_chunks * blk <= max_len needs blk | max_len), and the unwritten tail
    # must be zeros (init_cache flat allocates zeroed 64-multiples)
    assert max_len % 16 == 0, \
        f"flat cache length must be a multiple of 16, got {max_len}"
    T = max_len if kv_limit is None else min(kv_limit, max_len)
    if block_b is None:
        block_b = b if b <= 64 else 32
    bb = min(block_b, b)
    while b % bb:
        bb -= 1
    if block_t is None:
        # ~2 MB bf16 K-blocks: bb * blk * D * 2 bytes
        block_t = max(16, (2 * 1024 * 1024) // (bb * D * 2) // 16 * 16)
    # largest sublane-multiple chunk <= block_t that divides the cache length
    blk = 16
    for cand in (256, 128, 64, 32, 16):
        if cand <= max(block_t, 16) and max_len % cand == 0:
            blk = cand
            break
    n_chunks = pl.cdiv(T, blk)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")

    # npad lane-broadcast to a (b, 128) int32 VMEM operand (a (b,) or (b, 1)
    # block would violate the (8, 128) minor-tile constraint)
    npad_v = jnp.broadcast_to(npad.astype(jnp.int32)[:, None], (b, 128))
    grid = (b // bb, n_chunks)
    out = pl.pallas_call(
        functools.partial(_decode_kernel, n_head=n_head, scale=float(scale)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bb, 128), lambda i, j: (i, 0)),
            pl.BlockSpec((bb, D), lambda i, j: (i, 0)),
            pl.BlockSpec((bb, blk, D), lambda i, j: (i, j, 0)),
            pl.BlockSpec((bb, blk, D), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((bb, D), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bb, n_head), jnp.float32),   # running max
            pltpu.VMEM((bb, n_head), jnp.float32),   # running sum
            pltpu.VMEM((bb, D), jnp.float32),        # output accumulator
        ],
        interpret=interpret,
    )(jnp.reshape(cur, (1,)).astype(jnp.int32), npad_v, q, k_cache, v_cache)
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

"""Pallas TPU fused attention kernels.

The XLA path (ops/attention.attend) materializes the (n_q, n_kv) score
matrix in HBM between fusions for large shapes; this kernel keeps the whole
softmax(QK^T)V chain in VMEM per q-block, streaming K/V once. Used for the
inference/training forward of the ViT encoder, LM prefill and resampler
(sequence lengths here are <= ~1k so a full-KV-per-q-block layout fits VMEM
comfortably; a streaming flash variant is only needed beyond ~4k).

Backward: ``custom_vjp`` recomputes attention with the XLA reference and
differentiates that — fast Pallas forward, exact XLA gradients, zero extra
residual memory (the flash trade: recompute instead of storing scores).

Numerics: scores accumulate in fp32 on the MXU regardless of input dtype;
softmax in fp32; matches the XLA path to bf16 rounding.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = float(jnp.finfo(jnp.float32).min)


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, row_bias_ref, o_ref, *,
                 scale: float, causal: bool, block_q: int, have_bias: bool,
                 have_row_bias: bool):
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)                     # (block_q, d)
    k = k_ref[0].astype(jnp.float32)                     # (n_kv, d)
    v = v_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * scale                                         # (block_q, n_kv)
    if have_bias:
        s = s + bias_ref[0].astype(jnp.float32)
    if have_row_bias:
        # per-batch additive bias over kv positions (padding mask),
        # shared by every head and q row
        s = s + row_bias_ref[0].astype(jnp.float32)       # (1, n_kv)
    if causal:
        n_kv = k.shape[0]
        q_pos = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, n_kv), 0)
        kv_pos = jax.lax.broadcasted_iota(jnp.int32, (block_q, n_kv), 1)
        s = jnp.where(kv_pos <= q_pos, s, NEG)

    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _pallas_attention_fwd_impl(q, k, v, bias, row_bias, *, scale: float,
                               causal: bool, block_q: int, interpret: bool,
                               n_head: int):
    """q,k,v: (BH, n_q, d)/(BH, n_kv, d); bias None or (BH, n_q, n_kv);
    row_bias None or (B, 1, n_kv) shared across heads/q-rows."""
    BH, n_q, d = q.shape
    n_kv = k.shape[1]
    block_q = min(block_q, n_q)
    # pad n_q to a multiple of block_q (outputs for pad rows are dropped)
    pad = (-n_q) % block_q
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        if bias is not None:
            bias = jnp.pad(bias, ((0, 0), (0, pad), (0, 0)))
    n_q_p = q.shape[1]
    grid = (BH, n_q_p // block_q)

    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, n_kv, d), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, n_kv, d), lambda b, i: (b, 0, 0)),
    ]
    args = [q, k, v]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, block_q, n_kv), lambda b, i: (b, i, 0)))
        args.append(bias)
    else:
        in_specs.append(pl.BlockSpec((1, 1, 1), lambda b, i: (0, 0, 0)))
        args.append(jnp.zeros((1, 1, 1), q.dtype))
    if row_bias is not None:
        in_specs.append(pl.BlockSpec(
            (1, 1, n_kv), lambda b, i: (b // n_head, 0, 0)))
        args.append(row_bias)
    else:
        in_specs.append(pl.BlockSpec((1, 1, 1), lambda b, i: (0, 0, 0)))
        args.append(jnp.zeros((1, 1, 1), q.dtype))

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, causal=causal,
                          block_q=block_q, have_bias=bias is not None,
                          have_row_bias=row_bias is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, n_q_p, d), q.dtype),
        interpret=interpret,
    )(*args)
    return out[:, :n_q]


def _flash_kernel(q_ref, k_ref, v_ref, rb_ref, o_ref, m_ref, l_ref, acc_ref,
                  *, scale: float, causal: bool, block_q: int, block_kv: int,
                  have_row_bias: bool):
    """Streaming (online-softmax) flash attention: the kv-block axis is the
    innermost sequential grid dim; running max/sum/accumulator live in VMEM
    scratch across kv iterations. Scores never exceed (block_q, block_kv)."""
    qi = pl.program_id(1)
    kj = pl.program_id(2)

    @pl.when(kj == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32)                     # (block_q, d)
    k = k_ref[0].astype(jnp.float32)                     # (block_kv, d)
    v = v_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if have_row_bias:
        s = s + rb_ref[0].astype(jnp.float32)            # (1, block_kv)
    if causal:
        q_pos = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_kv), 0)
        kv_pos = kj * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_kv), 1)
        s = jnp.where(kv_pos <= q_pos, s, NEG)

    m_prev = m_ref[...]                                  # (block_q, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    m_ref[...] = m_new

    # write every iteration (cheap; the last kv block's write is final)
    o_ref[0] = (acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)).astype(o_ref.dtype)


def _flash_attention_fwd_impl(q, k, v, row_bias, *, scale: float,
                              causal: bool, block_q: int, block_kv: int,
                              interpret: bool, n_head: int):
    """Streaming variant: q/k/v (BH, n, d); row_bias None or (B, 1, n_kv)."""
    BH, n_q, d = q.shape
    n_kv = k.shape[1]
    block_q = min(block_q, n_q)
    block_kv = min(block_kv, n_kv)
    pad_q = (-n_q) % block_q
    pad_kv = (-n_kv) % block_kv
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
    if pad_kv:
        k = jnp.pad(k, ((0, 0), (0, pad_kv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_kv), (0, 0)))
        # padded kv slots must be masked out
        if row_bias is None:
            row_bias = jnp.zeros((BH // n_head, 1, n_kv), q.dtype)
        row_bias = jnp.pad(row_bias, ((0, 0), (0, 0), (0, pad_kv)),
                           constant_values=NEG)
    n_q_p, n_kv_p = q.shape[1], k.shape[1]
    grid = (BH, n_q_p // block_q, n_kv_p // block_kv)

    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, block_kv, d), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, block_kv, d), lambda b, i, j: (b, j, 0)),
    ]
    args = [q, k, v]
    if row_bias is not None:
        in_specs.append(pl.BlockSpec(
            (1, 1, block_kv), lambda b, i, j, nh=n_head: (b // nh, 0, j)))
        args.append(row_bias)
    else:
        in_specs.append(pl.BlockSpec((1, 1, 1), lambda b, i, j: (0, 0, 0)))
        args.append(jnp.zeros((1, 1, 1), q.dtype))

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, causal=causal,
                          block_q=block_q, block_kv=block_kv,
                          have_row_bias=row_bias is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, n_q_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),   # running max
            pltpu.VMEM((block_q, 1), jnp.float32),   # running sum
            pltpu.VMEM((block_q, d), jnp.float32),   # output accumulator
        ],
        interpret=interpret,
    )(*args)
    return out[:, :n_q]


def _reference_attention(q, k, v, bias, row_bias, *, scale: float,
                         causal: bool, n_head: int):
    """XLA reference with identical numerics (used for the backward pass)."""
    s = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    if row_bias is not None:
        BH = q.shape[0]
        rb = jnp.repeat(row_bias.astype(jnp.float32), n_head, axis=0)
        s = s + rb
    if causal:
        n_q, n_kv = s.shape[-2:]
        mask = jnp.arange(n_kv)[None, :] <= jnp.arange(n_q)[:, None]
        s = jnp.where(mask[None], s, NEG)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v.astype(jnp.float32)).astype(q.dtype)


def _dispatch_fwd(q, k, v, bias, row_bias, *, scale, causal, block_q,
                  interpret, n_head, streaming):
    if streaming and bias is None:
        return _flash_attention_fwd_impl(
            q, k, v, row_bias, scale=scale, causal=causal, block_q=block_q,
            block_kv=block_q, interpret=interpret, n_head=n_head)
    return _pallas_attention_fwd_impl(q, k, v, bias, row_bias, scale=scale,
                                      causal=causal, block_q=block_q,
                                      interpret=interpret, n_head=n_head)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _pallas_attention(q, k, v, bias, row_bias, scale, causal, block_q,
                      interpret, n_head, streaming):
    return _dispatch_fwd(q, k, v, bias, row_bias, scale=scale, causal=causal,
                         block_q=block_q, interpret=interpret, n_head=n_head,
                         streaming=streaming)


def _fwd(q, k, v, bias, row_bias, scale, causal, block_q, interpret, n_head,
         streaming):
    out = _dispatch_fwd(q, k, v, bias, row_bias, scale=scale, causal=causal,
                        block_q=block_q, interpret=interpret, n_head=n_head,
                        streaming=streaming)
    return out, (q, k, v, bias, row_bias)


def _bwd(scale, causal, block_q, interpret, n_head, streaming, res, g):
    q, k, v, bias, row_bias = res
    diff_args = [q, k, v]
    f = lambda q_, k_, v_, b_, rb_: _reference_attention(
        q_, k_, v_, b_, rb_, scale=scale, causal=causal, n_head=n_head)
    _, vjp = jax.vjp(lambda q_, k_, v_: f(q_, k_, v_, bias, row_bias), *diff_args)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


_pallas_attention.defvjp(_fwd, _bwd)


def fused_attention(
    q: jnp.ndarray,              # (b, h, n_q, d)
    k: jnp.ndarray,              # (b, h, n_kv, d)
    v: jnp.ndarray,
    *,
    scale: float = 1.0,
    bias: Optional[jnp.ndarray] = None,      # broadcastable (b, h, n_q, n_kv)
    row_bias: Optional[jnp.ndarray] = None,  # (b, n_kv) padding bias
    causal: bool = False,
    block_q: int = 256,
    interpret: Optional[bool] = None,
    streaming: Optional[bool] = None,        # online-softmax kv-block streaming
) -> jnp.ndarray:
    """Fused softmax(scale * QK^T + bias) V on the TPU (Pallas).

    Differentiable in q/k/v (exact XLA gradients via recompute; bias args are
    treated as constants — they are masks here). ``interpret`` defaults to
    auto (True off-TPU so tests run on CPU).
    """
    b, h, n_q, d = q.shape
    n_kv = k.shape[2]
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if streaming is None:
        # the full-KV-per-q-block layout needs (block_q, n_kv) scores in
        # VMEM; stream kv blocks beyond ~2k (long-context path)
        streaming = n_kv > 2048 and bias is None

    qf = q.reshape(b * h, n_q, d)
    kf = k.reshape(b * h, n_kv, d)
    vf = v.reshape(b * h, n_kv, d)
    bf = None
    if bias is not None:
        bf = jnp.broadcast_to(bias, (b, h, n_q, n_kv)).reshape(b * h, n_q, n_kv)
    rbf = None if row_bias is None else row_bias.reshape(b, 1, n_kv)
    out = _pallas_attention(qf, kf, vf, bf, rbf, float(scale), bool(causal),
                            int(block_q), bool(interpret), int(h),
                            bool(streaming))
    return out.reshape(b, h, n_q, d)

"""Pallas kernel for Flamingo's media-masked cross-attention.

Fuses the flamingo-specific attention pattern
(/root/reference/flamingo_mini/gated_cross_attention.py:95-123) into one
VMEM-resident kernel:

  * mask: ``text_time[i] == media_time[j]`` where ``media_time[j] =
    j // n_visual + 1`` (each text token attends ONLY to the latents of its
    most recent preceding image);
  * masked logits at ``-finfo.max``; rowwise max-subtracted softmax;
  * rows with ``text_time == 0`` (no preceding media) zeroed post-softmax.

The media_time vector never materializes (computed from an in-kernel iota)
and the (n_token, n_media*n_visual) score matrix never leaves VMEM.

Backward: custom_vjp recomputing via the XLA reference (the same structure
models/xattn.apply_masked_xattn uses), so the kernel is training-safe.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG = float(jnp.finfo(jnp.float32).min)


def _xattn_kernel(q_ref, k_ref, v_ref, tt_ref, o_ref, *, scale: float,
                  n_visual: int, block_q: int):
    q = q_ref[0].astype(jnp.float32)                      # (block_q, d)
    k = k_ref[0].astype(jnp.float32)                      # (n_kv, d)
    v = v_ref[0].astype(jnp.float32)
    # tt arrives lane-broadcast as (block_q, 128): Mosaic's tiling rules
    # reject narrow int blocks and its remote compile rejects in-kernel
    # pl.ds on them, so the host pre-broadcasts into the lane dim and the
    # kernel takes a static (block_q, 1) column
    tt_col = tt_ref[0][:, 0:1]                            # (block_q, 1) int32

    n_kv = k.shape[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale

    media_time = jax.lax.broadcasted_iota(jnp.int32, (block_q, n_kv), 1) \
        // n_visual + 1
    mask = tt_col == media_time
    s = jnp.where(mask, s, NEG)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    p = jnp.where(tt_col == 0, 0.0, p)                    # no-media zeroing
    o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _reference(q, k, v, tt, *, scale: float, n_visual: int, n_head: int):
    """XLA reference (same math as models/xattn.apply_masked_xattn)."""
    BH, n_q, d = q.shape
    n_kv = k.shape[1]
    s = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    media_time = jnp.arange(n_kv) // n_visual + 1
    tt_bh = jnp.repeat(tt, n_head, axis=0)                # (BH, n_q)
    mask = tt_bh[:, :, None] == media_time[None, None, :]
    s = jnp.where(mask, s, NEG)
    s = s - jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where((tt_bh == 0)[:, :, None], 0.0, p)
    return jnp.einsum("bqk,bkd->bqd", p, v.astype(jnp.float32)).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _impl(q, k, v, tt, scale, n_visual, n_head, block_q, interpret):
    BH, n_q, d = q.shape
    n_kv = k.shape[1]
    block_q = min(block_q, n_q)
    pad = (-n_q) % block_q
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        tt = jnp.pad(tt, ((0, 0), (0, pad)))
    n_q_p = q.shape[1]
    grid = (BH, n_q_p // block_q)
    tt_lane = jnp.broadcast_to(tt[:, :, None], tt.shape + (128,))
    out = pl.pallas_call(
        functools.partial(_xattn_kernel, scale=scale, n_visual=n_visual,
                          block_q=block_q),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, n_kv, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, n_kv, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_q, 128),
                         lambda b, i, nh=n_head: (b // nh, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, n_q_p, d), q.dtype),
        interpret=interpret,
    )(q, k, v, tt_lane)
    return out[:, :n_q]


def _fwd(q, k, v, tt, scale, n_visual, n_head, block_q, interpret):
    out = _impl(q, k, v, tt, scale, n_visual, n_head, block_q, interpret)
    return out, (q, k, v, tt)


def _bwd(scale, n_visual, n_head, block_q, interpret, res, g):
    q, k, v, tt = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _reference(q_, k_, v_, tt, scale=scale,
                                      n_visual=n_visual, n_head=n_head),
        q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_impl.defvjp(_fwd, _bwd)


def fused_media_xattn(
    q: jnp.ndarray,          # (b, h, n_token, d) — pre-scaling handled here
    k: jnp.ndarray,          # (b, h, n_media*n_visual, d)
    v: jnp.ndarray,
    text_time: jnp.ndarray,  # (b, n_token) int
    *,
    scale: float,
    n_visual: int,
    block_q: int = 256,
    interpret=None,
) -> jnp.ndarray:
    """Fused media-masked cross-attention. Returns (b, h, n_token, d)."""
    b, h, n_q, d = q.shape
    n_kv = k.shape[2]
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    out = _impl(q.reshape(b * h, n_q, d), k.reshape(b * h, n_kv, d),
                v.reshape(b * h, n_kv, d), text_time.astype(jnp.int32),
                float(scale), int(n_visual), int(h), int(block_q),
                bool(interpret))
    return out.reshape(b, h, n_q, d)

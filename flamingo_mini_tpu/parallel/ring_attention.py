"""Ring attention: causal self-attention with the sequence sharded across
devices (context parallelism).

The reference has NO long-context machinery (SURVEY.md §5: max sequence =
the frozen LM's positional limit); this is a TPU-native additive capability:
shard the sequence over the mesh's 'data' axis with ``shard_map``, and rotate
K/V chunks around the ring with ``ppermute`` so every query chunk sees every
KV chunk while communication overlaps compute (the ring-attention pattern;
collectives ride ICI).

Semantics: exact causal attention (online-softmax accumulation across ring
steps — not an approximation). Each device holds queries for one contiguous
sequence chunk; at ring step s it attends its queries against the KV chunk
originally owned by device (my_idx - s) mod n, masked causally by absolute
position.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

NEG = float(jnp.finfo(jnp.float32).min)


def _chunk_attend(q, k, v, q_pos0, kv_pos0, chunk, scale, kv_mask=None):
    """Scores for one (q-chunk, kv-chunk) pair with absolute-position causal
    masking (and optional per-batch KV padding mask). q: (b, h, c, d);
    returns (scores_exp_sum, max, weighted_v)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    q_pos = q_pos0 + jnp.arange(chunk)
    kv_pos = kv_pos0 + jnp.arange(chunk)
    causal = kv_pos[None, :] <= q_pos[:, None]
    valid = causal[None, None]                               # (1,1,c,k)
    if kv_mask is not None:
        valid = valid & kv_mask[:, None, None, :]            # (b,1,c,k)
    s = jnp.where(valid, s, NEG)
    m = jnp.max(s, axis=-1)                                  # (b, h, c)
    p = jnp.exp(s - m[..., None])
    # fully-masked rows: exp(NEG - NEG) = 1 -> zero them via the mask
    p = jnp.where(valid, p, 0.0)
    l = jnp.sum(p, axis=-1)                                  # (b, h, c)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return m, l, o


def _ring_body(axis_name: str, q, k, v, mask, scale: float, chunk: int,
               n_dev: int):
    """Runs on ONE device under shard_map: q/k/v (and the optional padding
    ``mask``, (b, chunk) bool, rotated around the ring with K/V) are the
    local chunks."""
    my = lax.axis_index(axis_name)
    q_pos0 = my * chunk

    # online-softmax accumulators
    b, h, c, d = q.shape
    m_acc = jnp.full((b, h, c), NEG, jnp.float32)
    l_acc = jnp.zeros((b, h, c), jnp.float32)
    o_acc = jnp.zeros((b, h, c, d), jnp.float32)

    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    has_mask = mask is not None
    if not has_mask:                     # keep the carry pytree uniform
        mask = jnp.ones((b, c), bool)

    def step(carry, s):
        k_cur, v_cur, mk_cur, m_acc, l_acc, o_acc = carry
        kv_owner = (my - s) % n_dev
        kv_pos0 = kv_owner * chunk
        m_new, l_new, o_new = _chunk_attend(
            q, k_cur, v_cur, q_pos0, kv_pos0, chunk, scale,
            kv_mask=mk_cur if has_mask else None)
        # online-softmax merge
        m_tot = jnp.maximum(m_acc, m_new)
        a = jnp.exp(m_acc - m_tot)
        b_ = jnp.exp(m_new - m_tot)
        l_tot = l_acc * a + l_new * b_
        o_tot = o_acc * a[..., None] + o_new * b_[..., None]
        # rotate KV around the ring (overlaps with next step's compute)
        k_nxt = lax.ppermute(k_cur, axis_name, perm)
        v_nxt = lax.ppermute(v_cur, axis_name, perm)
        mk_nxt = lax.ppermute(mk_cur, axis_name, perm) if has_mask else mk_cur
        return (k_nxt, v_nxt, mk_nxt, m_tot, l_tot, o_tot), None

    (k, v, mask, m_acc, l_acc, o_acc), _ = lax.scan(
        step, (k, v, mask, m_acc, l_acc, o_acc), jnp.arange(n_dev))
    out = o_acc / jnp.maximum(l_acc[..., None], 1e-30)
    return out.astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,            # (b, h, n, d) — n divisible by mesh axis size
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mesh: Mesh,
    axis_name: str = "data",
    scale: Optional[float] = None,
    attention_mask: Optional[jnp.ndarray] = None,   # (b, n) 1=real, 0=pad
) -> jnp.ndarray:
    """Exact causal attention with the sequence sharded over ``axis_name``.

    The caller may pass fully-replicated arrays; shard_map partitions the
    sequence dim and the result comes back with the same sequence sharding.
    ``attention_mask`` (right- or left-padding, HF convention) is sharded
    the same way and its chunks rotate around the ring with K/V.
    """
    b, h, n, d = q.shape
    n_dev = dict(zip(mesh.axis_names, mesh.devices.shape))[axis_name]
    assert n % n_dev == 0, f"sequence {n} not divisible by {n_dev} devices"
    chunk = n // n_dev
    if scale is None:
        scale = d ** -0.5

    spec = P(None, None, axis_name, None)
    if attention_mask is None:
        fn = jax.shard_map(
            lambda q_, k_, v_: _ring_body(axis_name, q_, k_, v_, None,
                                          scale=scale, chunk=chunk,
                                          n_dev=n_dev),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_vma=False)
        return fn(q, k, v)
    mask = attention_mask.astype(bool)
    fn = jax.shard_map(
        lambda q_, k_, v_, m_: _ring_body(axis_name, q_, k_, v_, m_,
                                          scale=scale, chunk=chunk,
                                          n_dev=n_dev),
        mesh=mesh, in_specs=(spec, spec, spec, P(None, axis_name)),
        out_specs=spec, check_vma=False)
    return fn(q, k, v, mask)

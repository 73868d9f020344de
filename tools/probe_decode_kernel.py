#!/usr/bin/env python
"""In-situ decode-attention probe: per-layer cost of attention variants
inside a while-loop with dynamic_update_slice-carried caches (isolated
microbenchmarks LIE for this op — layouts get re-chosen; BENCH.md r3).

Mimics the real decode loop: N steps, each running `n_layer` attention calls
over carried caches, each layer writing the running hidden row into its cache
first (the real data flow). Trip count is a TRACED fori_loop bound so two
lengths share one compile; per-step = (t_full - t_half) / (reps/2); per-layer
= per-step / n_layer. Fresh random buffers per process (tunnel caching).

Variants:
  pallas        ops.pallas_decode.decode_attention (flat cache), block_b/t
  xla_flat      XLA einsum attention on the flat layout (relayout cost shows)
  xla_head      the r3 head-layout path: (b, h, T, dh) cache + ops.attend
"""
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from flamingo_mini_tpu.ops.pallas_decode import decode_attention
from flamingo_mini_tpu.ops.attention import attend

B, T, D, H, NLAYER = 32, 192, 1024, 16, 24
KV_LIMIT = 128   # ~the live prefix the headline's prefix_block averages
SCALE = (D // H) ** -0.5


def attn_stream_only(q, kf, vf, npad, cur, block_b, block_t):
    """Same grid/blocks as the real kernel, compute replaced by a running
    sum — isolates the DMA stream rate from the attention math."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, max_len, D = kf.shape
    bb = block_b or b
    blk = block_t or 32
    n_chunks = pl.cdiv(KV_LIMIT, blk)

    def kern(q_ref, k_ref, v_ref, o_ref, acc_ref):
        tj = pl.program_id(1)

        @pl.when(tj == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
        acc_ref[...] += (jnp.sum(k_ref[...].astype(jnp.float32), axis=1)
                         + jnp.sum(v_ref[...].astype(jnp.float32), axis=1))

        @pl.when(tj == n_chunks - 1)
        def _f():
            o_ref[...] = (acc_ref[...] + q_ref[...].astype(jnp.float32)
                          ).astype(o_ref.dtype)

    return pl.pallas_call(
        kern,
        grid=(b // bb, n_chunks),
        in_specs=[
            pl.BlockSpec((bb, D), lambda i, j: (i, 0)),
            pl.BlockSpec((bb, blk, D), lambda i, j: (i, j, 0)),
            pl.BlockSpec((bb, blk, D), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((bb, D), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((bb, D), jnp.float32)],
    )(q, kf, vf)


def make_tmajor_stream(block_t):
    """Stream-only over a T-MAJOR (T, b, D) cache: chunk blocks are fully
    contiguous (blk*b*D*2 bytes each) instead of b strided 64 KB runs."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_chunks = pl.cdiv(KV_LIMIT, block_t)

    def kern(q_ref, k_ref, v_ref, o_ref, acc_ref):
        tj = pl.program_id(0)

        @pl.when(tj == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
        acc_ref[...] += (jnp.sum(k_ref[...].astype(jnp.float32), axis=0)
                         + jnp.sum(v_ref[...].astype(jnp.float32), axis=0))

        @pl.when(tj == n_chunks - 1)
        def _f():
            o_ref[...] = (acc_ref[...] + q_ref[...].astype(jnp.float32)
                          ).astype(o_ref.dtype)

    def attn(q, kf, vf, npad, cur, *_):
        # kf/vf here are (T, B, D)
        return pl.pallas_call(
            kern,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((B, D), lambda j: (0, 0)),
                pl.BlockSpec((block_t, B, D), lambda j: (j, 0, 0)),
                pl.BlockSpec((block_t, B, D), lambda j: (j, 0, 0)),
            ],
            out_specs=pl.BlockSpec((B, D), lambda j: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, D), q.dtype),
            scratch_shapes=[pltpu.VMEM((B, D), jnp.float32)],
        )(q, kf, vf)
    return attn


def make_tmajor_loop(block_t, real_kernel=False):
    if real_kernel:
        def attn(q, kf, vf, npad, cur, *_):
            return decode_attention(q, kf, vf, npad, cur, n_head=H,
                                    scale=SCALE, kv_limit=KV_LIMIT,
                                    block_t=block_t)
    else:
        stream = make_tmajor_stream(block_t)

        def attn(q, kf, vf, npad, cur, *_):
            return stream(q, kf, vf, npad, cur)

    @jax.jit
    def run(q0, npad, reps, seed):
        ck = jnp.zeros((NLAYER, T, B, D), jnp.bfloat16) \
            + q0.astype(jnp.bfloat16)[None, None, :, :] * 1e-3
        cv = ck + 1e-6

        def body(i, carry):
            q, ck, cv = carry
            cur = jnp.minimum(4 + i, KV_LIMIT - 1).astype(jnp.int32)
            for l in range(NLAYER):
                ck = lax.dynamic_update_slice(
                    ck, q.reshape(1, 1, B, D), (l, cur, 0, 0))
                cv = lax.dynamic_update_slice(
                    cv, q.reshape(1, 1, B, D), (l, cur, 0, 0))
                q = attn(q, ck[l], cv[l], npad, cur) + q * 1e-6
            return q, ck, cv
        q0s = q0 + seed.astype(q0.dtype) * 1e-6
        q, ck, cv = lax.fori_loop(0, reps, body, (q0s, ck, cv))
        return jnp.sum(q.astype(jnp.float32))
    return run


def make_tmajor_packed_loop(block_t):
    """Stream-only over ONE packed T-major (T, b, 2D) K||V cache: a single
    contiguous stream per launch, one cache write per layer per step."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_chunks = pl.cdiv(KV_LIMIT, block_t)

    def kern(q_ref, kv_ref, o_ref, acc_ref):
        tj = pl.program_id(0)

        @pl.when(tj == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
        k = kv_ref[:, :, :D]
        v = kv_ref[:, :, D:]
        acc_ref[...] += (jnp.sum(k.astype(jnp.float32), axis=0)
                         + jnp.sum(v.astype(jnp.float32), axis=0))

        @pl.when(tj == n_chunks - 1)
        def _f():
            o_ref[...] = (acc_ref[...] + q_ref[...].astype(jnp.float32)
                          ).astype(o_ref.dtype)

    def attn(q, ckv):
        return pl.pallas_call(
            kern,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((B, D), lambda j: (0, 0)),
                pl.BlockSpec((block_t, B, 2 * D), lambda j: (j, 0, 0)),
            ],
            out_specs=pl.BlockSpec((B, D), lambda j: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, D), q.dtype),
            scratch_shapes=[pltpu.VMEM((B, D), jnp.float32)],
        )(q, ckv)

    @jax.jit
    def run(q0, npad, reps, seed):
        ckv = jnp.zeros((NLAYER, T, B, 2 * D), jnp.bfloat16) \
            + q0.astype(jnp.bfloat16)[None, None, :, :1] * 1e-3

        def body(i, carry):
            q, ckv = carry
            cur = jnp.minimum(4 + i, KV_LIMIT - 1).astype(jnp.int32)
            row = jnp.concatenate([q, q * 0.5], -1).reshape(1, 1, B, 2 * D)
            for l in range(NLAYER):
                ckv = lax.dynamic_update_slice(ckv, row, (l, cur, 0, 0))
                q = attn(q, ckv[l]) + q * 1e-6
            return q, ckv
        q0s = q0 + seed.astype(q0.dtype) * 1e-6
        q, ckv = lax.fori_loop(0, reps, body, (q0s, ckv))
        return jnp.sum(q.astype(jnp.float32))
    return run


def attn_xla_flat(q, kf, vf, npad, cur, *_):
    k = kf[:, :KV_LIMIT].reshape(B, KV_LIMIT, H, D // H)
    v = vf[:, :KV_LIMIT].reshape(B, KV_LIMIT, H, D // H)
    qh = q.reshape(B, H, 1, D // H)
    s = jnp.einsum("bhqd,bthd->bhqt", qh.astype(jnp.float32),
                   k.astype(jnp.float32)) * SCALE
    t_pos = jnp.arange(KV_LIMIT)
    valid = (t_pos[None, :] >= npad[:, None]) & (t_pos[None, :] <= cur)
    s = jnp.where(valid[:, None, None, :], s, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    o = jnp.einsum("bhqt,bthd->bhqd", p.astype(jnp.float32),
                   v.astype(jnp.float32))
    return o.reshape(B, D).astype(q.dtype)


def make_flat_loop(attn, block_b=None, block_t=None):
    @functools.partial(jax.jit, static_argnames=())
    def run(q0, npad, reps, seed):
        # caches are created INSIDE the jit: argument-origin buffers in a
        # while_loop carry get pinned by the tunnel executor and copied per
        # iteration (the r2 rng-in-carry trap, BENCH.md) — the real decode
        # engine's caches are loop-local too
        ck = jnp.zeros((NLAYER, B, T, D), jnp.bfloat16) \
            + q0.astype(jnp.bfloat16)[None, :, None, :] * 1e-3
        cv = ck + 1e-6

        def body(i, carry):
            q, ck, cv = carry
            cur = jnp.minimum(4 + i, KV_LIMIT - 1).astype(jnp.int32)
            for l in range(NLAYER):
                ck = lax.dynamic_update_slice(
                    ck, q.reshape(1, B, 1, D), (l, 0, cur, 0))
                cv = lax.dynamic_update_slice(
                    cv, q.reshape(1, B, 1, D), (l, 0, cur, 0))
                q = attn(q, ck[l], cv[l], npad, cur, block_b, block_t) \
                    + q * 1e-6
            return q, ck, cv
        q0 = q0 + seed.astype(q0.dtype) * 1e-6
        q, ck, cv = lax.fori_loop(0, reps, body, (q0, ck, cv))
        return jnp.sum(q.astype(jnp.float32))
    return run


def make_head_loop():
    dh = D // H

    @jax.jit
    def run(q0, npad, reps, seed):
        # head-layout caches, loop-local (see make_flat_loop note)
        ck = jnp.zeros((NLAYER, B, H, T, dh), jnp.bfloat16) \
            + q0.astype(jnp.bfloat16).reshape(B, H, 1, dh)[None] * 1e-3
        cv = ck + 1e-6
        t_pos = jnp.arange(KV_LIMIT)

        def body(i, carry):
            q, ck, cv = carry
            cur = jnp.minimum(4 + i, KV_LIMIT - 1).astype(jnp.int32)
            qh = q.reshape(B, H, 1, dh)
            kv_row = qh.reshape(1, B, H, 1, dh)
            valid = (t_pos[None, :] >= npad[:, None]) & (t_pos[None, :] <= cur)
            bias = jnp.where(valid, 0.0,
                             jnp.finfo(jnp.float32).min
                             ).astype(q.dtype)[:, None, None, :]
            for l in range(NLAYER):
                ck = lax.dynamic_update_slice(ck, kv_row, (l, 0, 0, cur, 0))
                cv = lax.dynamic_update_slice(cv, kv_row, (l, 0, 0, cur, 0))
                o = attend(qh, ck[l, :, :, :KV_LIMIT], cv[l, :, :, :KV_LIMIT],
                           scale=SCALE, bias=bias)
                q = o.reshape(B, D) + q * 1e-6
                qh = q.reshape(B, H, 1, dh)
            return q, ck, cv
        q0 = q0 + seed.astype(q0.dtype) * 1e-6
        q, ck, cv = lax.fori_loop(0, reps, body, (q0, ck, cv))
        return jnp.sum(q.astype(jnp.float32))
    return run


def timed(run, ops, reps):
    def once():
        seed = jnp.float32(time.time_ns() % (1 << 30))
        return np.asarray(run(*ops, jnp.int32(reps), seed))
    once()
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        once()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rs = np.random.RandomState(time.time_ns() % (1 << 31))
    q0 = jnp.asarray(rs.randn(B, D) * 0.1, jnp.bfloat16)
    npad = jnp.asarray(rs.randint(0, 3, (B,)), jnp.int32)
    results = {}

    def measure(name, run, ops):
        t_lo = timed(run, ops, 8)
        t_hi = timed(run, ops, 40)
        per_step = (t_hi - t_lo) / 32
        per_layer_us = per_step / NLAYER * 1e6
        gbs = 2 * B * KV_LIMIT * D * 2 / (per_layer_us * 1e-6) / 1e9
        results[name] = round(per_layer_us, 2)
        print(f"{name:28s} {per_step*1e3:7.3f} ms/step  "
              f"{per_layer_us:6.2f} us/layer  {gbs:5.0f} GB/s", flush=True)

    variants = [
        ("tmajor_kernel_bt16", make_tmajor_loop(16, real_kernel=True)),
        ("tmajor_kernel_bt32", make_tmajor_loop(32, real_kernel=True)),
        ("tmajor_kernel_default", make_tmajor_loop(None, real_kernel=True)),
        ("stream_tmajor_bt32", make_tmajor_loop(32)),
    ]
    if "--full" in sys.argv:
        variants += [
            ("stream_tmajor_packed_bt16", make_tmajor_packed_loop(16)),
            ("xla_head_r3", make_head_loop()),
        ]
    for name, run in variants:
        measure(name, run, (q0, npad))

    print(json.dumps({"per_layer_us": results,
                      "shape": f"B{B} T{T} D{D} H{H} L{NLAYER} kv{KV_LIMIT}"}))


if __name__ == "__main__":
    main()

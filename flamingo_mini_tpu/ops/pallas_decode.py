"""Pallas TPU decode-step attention over a T-MAJOR flat (T, b, h*dh) KV cache.

Replaces the XLA decode attention (ops/attention.attend inside the generate
while_loop) on measured grounds (tools/probe_decode_kernel.py, BENCH.md r4):

1. **Layout**: the (b, h, T, dh=64) head-layout cache is physically padded
   ~1.6x in HBM (XLA tiles the 64-wide minor dim into 128 lanes) and the XLA
   decode fusion streams it at ~250 GB/s. A flat b-major (b, T, D) cache
   fixes the padding but its T-chunks are b strided 64 KB runs — measured
   ~300 GB/s. The T-MAJOR (T, b, D) layout makes every chunk ONE contiguous
   (blk*b*D*2)-byte stream — measured 400-470 GB/s in situ — and the decode
   write (1, b, D at position cur) is a single contiguous slab (the b-major
   write was b strided rows).
2. **Launch floor**: per-launch DMA ramp is ~12 us; at 24 layers/step that
   floor is architectural for per-layer kernels (the megakernel work attacks
   it); within one launch this kernel is bandwidth-bound, math-free
   (stream-only ablation equals the full kernel).

Per-head scores from the flat layout WITHOUT relayout, via a block-diagonal
selector on the MXU: with selT[h, d] = (d // dh == h),

    qr     = selT * q[:, None, :]          (b, H, D) — q routed per head
    scores = qr x K  ("bhd,tbd->bht")      batched MXU, contract D
    alphas = softmax_T(scores)             (masked: npad <= t <= cur)
    bhd    = alphas x V ("bht,tbd->bhd")
    out    = sum_h bhd * selT              ("bhd,hd->bd")

The grid is (T-chunks,) — sequential, so online softmax (flash-style running
max/sum) carries (b, H) statistics and a (b, D) accumulator in VMEM scratch
while Pallas double-buffers the next chunk's DMA behind the current compute.

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
                   n_head: int, scale: float, group: int):
    """Grid (T-chunks,), sequential (online softmax). cur_ref (SMEM, (1,)):
    last valid slot. npad_ref (VMEM, (b, 128) int32, lane-broadcast):
    per-row first real slot.

    GROUPED CROSS-BATCH form: batch rows are processed in groups of
    ``group`` (chosen so group * n_head ~= 128). For each group the kernel
    computes the FULL cross-product score matrix, queries on sublanes:

        s[(b, h), (t, b')] = qr[(b, h), :] . K[(t, b'), :]

    with ONE plain 2D MXU dot — no VMEM transposes, no batched dot_general
    (Mosaic lowers those to per-batch tiny matmuls; an explicit chunk
    transpose measured +20 us/layer), and no sublane<->lane relayouts:
    the online-softmax stats reduce over LANES into natural (GH, 1)
    column vectors. Cross-batch entries (b != b') are masked invalid
    alongside npad/cur, so they softmax to exact 0 and the V-weighting
    dot — also one plain 2D op — picks up nothing from foreign rows. The
    extra FLOPs (group x) are free: decode attention is bandwidth-bound
    by ~10x. Per-(b, h) output rows accumulate in a (B*H, D) scratch and
    collapse to (B, D) via the head selector once, at the last chunk.
    """
    tj = pl.program_id(0)
    T_blk, B, D = k_ref.shape
    dh = D // n_head
    G = group
    GH = G * n_head
    TG = T_blk * G
    cur = cur_ref[0]

    @pl.when(tj == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    kv_dtype = k_ref.dtype
    # block-diagonal head selector (H, D): routes q per head / collapses
    # per-head outputs back to the flat D axis (0/1 — exact in any dtype)
    selT = jnp.where((lax.broadcasted_iota(jnp.int32, (n_head, D), 1) // dh)
                     == lax.broadcasted_iota(jnp.int32, (n_head, D), 0),
                     1.0, 0.0).astype(kv_dtype)             # (H, D)

    # mask pieces for the (GH, TG) score matrix, hoisted out of the group
    # loop: row = b_local * H + h, col = t_local * G + b_local'
    rows_i = lax.broadcasted_iota(jnp.int32, (GH, TG), 0)
    cols_i = lax.broadcasted_iota(jnp.int32, (GH, TG), 1)
    t_pos = tj * T_blk + cols_i // G                        # (GH, TG)
    base_valid = ((rows_i // n_head) == (cols_i % G)) & (t_pos <= cur)

    for g in range(B // G):
        sl = slice(g * G, (g + 1) * G)
        slh = slice(g * GH, (g + 1) * GH)
        # qr: (G, H, D) routed queries -> (GH, D); kg/vg: merged (TG, D)
        qr = (selT[None] * q_ref[sl][:, None, :]).reshape(GH, D)
        kg = k_ref[:, sl, :].reshape(TG, D)
        vg = v_ref[:, sl, :].reshape(TG, D)

        s = lax.dot_general(qr, kg, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (GH, TG)
        s = s * scale
        # npad per query row (b, h): (G, 1) -> (G, H, 1) -> (GH, 1)
        npad_r = jnp.broadcast_to(npad_ref[sl, :1][:, None, :],
                                  (G, n_head, 1)).reshape(GH, 1)
        valid = base_valid & (t_pos >= npad_r)
        s = jnp.where(valid, s, NEG)

        m_prev = m_ref[slh, :1]                             # (GH, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)                     # (GH, 1)
        # invalid entries hold NEG; exp(NEG - m_new) underflows to exact 0,
        # so no second mask pass is needed
        p = jnp.exp(s - m_new)
        l_ref[slh, :1] = l_ref[slh, :1] * alpha \
            + jnp.sum(p, axis=1, keepdims=True)
        m_ref[slh, :1] = m_new

        # V-weighting: one 2D dot; cross-batch columns carry p == 0. Alphas
        # cast to the compute dtype first, f32 accumulation — exactly the
        # XLA path (ops/attention.attend: alphas.astype(dtype) @ v)
        bhd = lax.dot_general(p.astype(kv_dtype), vg,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # (GH, D)
        acc_ref[slh, :] = acc_ref[slh, :] * alpha + bhd

    @pl.when(tj == pl.num_programs(0) - 1)
    def _finish():
        # collapse per-(b, h) rows to (B, D): out[b, d] =
        # acc[(b, d//dh), d] / l[(b, d//dh)] via the selector, once
        selTf = selT.astype(jnp.float32)[None]              # (1, H, D)
        acc = acc_ref[...].reshape(B, n_head, D)
        l = jnp.maximum(l_ref[:, :1], 1e-30).reshape(B, n_head, 1)
        o_ref[...] = jnp.sum(acc / l * selTf, axis=1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "n_head", "scale", "kv_limit", "block_t", "interpret"))
def decode_attention(
    q: jnp.ndarray,        # (b, D) current token's query (unscaled)
    k_cache: jnp.ndarray,  # (max_len, b, D) T-major flat K cache
    v_cache: jnp.ndarray,  # (max_len, b, D) T-major flat V cache
    npad: jnp.ndarray,     # (b,) int32 first real (non-pad) slot per row
    cur: jnp.ndarray,      # () int32 last valid slot (== current write pos)
    *,
    n_head: int,
    scale: float,
    kv_limit: Optional[int] = None,   # static live-prefix bound (<= max_len)
    block_t: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Single-token decode attention over the T-major flat cache -> (b, D).

    The full cache buffers are passed (never sliced — a slice would
    materialize a copy of the live cache every step); the grid only COVERS
    ceil(kv_limit / block_t) chunks, so per-step HBM traffic is the live
    prefix rounded up to ``block_t``. Slots beyond ``cur`` are masked
    in-kernel (and are zero by the cache contract).
    """
    max_len, b, D = k_cache.shape
    assert D % n_head == 0
    assert max_len % 16 == 0, \
        f"flat cache length must be a multiple of 16, got {max_len}"
    T = max_len if kv_limit is None else min(kv_limit, max_len)
    if block_t is None:
        # largest chunk whose double-buffered K+V blocks fit Mosaic's 16 MB
        # scoped VMEM next to the scratch + score intermediates (measured
        # fastest at 2 MB blocks for the flamingo-mini shape: 55 us/layer
        # at kv=128 vs 60 at 1 MB, tools/probe_decode_kernel.py)
        scratch_bytes = b * n_head * (D + 256) * 4
        budget = 14 * 1024 * 1024 - scratch_bytes - 2 * 1024 * 1024
        block_t = max(8, budget // (4 * b * D * 2) // 16 * 16)
    # largest chunk <= block_t that divides the cache length, so chunks
    # never read past the array (the no-V-mask contract)
    blk = 8
    for cand in (256, 128, 64, 32, 16, 8):
        if cand <= max(block_t, 8) and max_len % cand == 0:
            blk = cand
            break
    n_chunks = pl.cdiv(T, blk)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if not interpret and D % 128 != 0:
        # Mosaic lane tiling needs the flat feature dim to fill whole
        # 128-lane tiles — narrow (test-scale) models fail to lower
        # (tpu.reshape on sub-lane-tile vectors). Fall back to the exact
        # XLA reference path; every production-scale arch (D = 768+) takes
        # the kernel.
        return decode_attention_reference(
            q, k_cache, v_cache, npad, cur, n_head=n_head, scale=scale,
            kv_limit=kv_limit)

    # group size: group * n_head ~= 128 (one full lane tile of score
    # columns per cross-batch dot), and group | b
    group = min(b, max(1, 128 // n_head))
    while b % group:
        group -= 1

    # npad lane-broadcast to a (b, 128) int32 VMEM operand (a (b,) or (b, 1)
    # block would violate the (8, 128) minor-tile constraint)
    npad_v = jnp.broadcast_to(npad.astype(jnp.int32)[:, None], (b, 128))
    out = pl.pallas_call(
        functools.partial(_decode_kernel, n_head=n_head, scale=float(scale),
                          group=group),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((b, 128), lambda j: (0, 0)),
            pl.BlockSpec((b, D), lambda j: (0, 0)),      # resident q
            pl.BlockSpec((blk, b, D), lambda j: (j, 0, 0)),
            pl.BlockSpec((blk, b, D), lambda j: (j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((b, D), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((b * n_head, 128), jnp.float32),  # running max (lane 0)
            pltpu.VMEM((b * n_head, 128), jnp.float32),  # running sum (lane 0)
            pltpu.VMEM((b * n_head, D), jnp.float32),    # per-(b, h) output acc
        ],
        interpret=interpret,
    )(jnp.reshape(cur, (1,)).astype(jnp.int32), npad_v, q, k_cache, v_cache)
    return out


def _decode_kernel_beam(cur_ref, npad_ref, anc_ref, q_ref, k_ref, v_ref,
                        o_ref, m_ref, l_ref, acc_ref, *,
                        n_head: int, scale: float, group: int, kb: int,
                        t_pad: int):
    """Beam variant of ``_decode_kernel`` (r5, VERDICT #4): ancestor-indexed
    (lazy) beam attention over the UNPERMUTED flat T-major cache.

    Rows come in beam families of ``kb`` physical rows; logical beam i of
    family f attends physical row j of family f at position t iff
    ``anc[f, i, t] == j`` (ops/attention.attend_beam_lazy semantics). The
    group width is lcm(8, kb): a multiple of 8 because Mosaic only slices
    the cache's sublane (batch) dim at 8-multiples — the exact misalignment
    that kept beam-3 off the kernel in r4 — and a multiple of kb so beam
    families never straddle groups.

    The per-element ancestry lookup A[(r,h),(t,c)] = anc[r, t] cannot be
    laid out directly (it would need a lane-granularity slice/transpose of
    the resident (B, T) table); instead it is computed EXACTLY on the MXU:
    anc values are tiny integers, so a 0/1 selection matrix W2[(tp),(c)] =
    (tp == t(c)) gives dot(anc_rows_bf16, W2)[(r,h),(c)] == anc[r, t(c)]
    bit-exactly (one 1.0 per column, values << bf16's 256 integer range).
    """
    tj = pl.program_id(0)
    T_blk, B, D = k_ref.shape
    dh = D // n_head
    G = group
    GH = G * n_head
    TG = T_blk * G
    cur = cur_ref[0]

    @pl.when(tj == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    kv_dtype = k_ref.dtype
    selT = jnp.where((lax.broadcasted_iota(jnp.int32, (n_head, D), 1) // dh)
                     == lax.broadcasted_iota(jnp.int32, (n_head, D), 0),
                     1.0, 0.0).astype(kv_dtype)             # (H, D)

    rows_i = lax.broadcasted_iota(jnp.int32, (GH, TG), 0)
    cols_i = lax.broadcasted_iota(jnp.int32, (GH, TG), 1)
    t_pos = tj * T_blk + cols_i // G                        # (GH, TG)
    # beam-family alignment: query row's family == cache row's family
    same_family = ((rows_i // n_head) // kb) == ((cols_i % G) // kb)
    base_valid = same_family & (t_pos <= cur)
    col_beam = ((cols_i % G) % kb).astype(jnp.float32)      # (GH, TG)
    # W2: selects lane window [tj*T_blk, (tj+1)*T_blk) of the resident
    # (B, t_pad) ancestry rows and expands t over the G-interleaved cols
    w_rows = lax.broadcasted_iota(jnp.int32, (t_pad, TG), 0)
    w_cols = lax.broadcasted_iota(jnp.int32, (t_pad, TG), 1)
    W2 = jnp.where(w_rows == tj * T_blk + w_cols // G,
                   1.0, 0.0).astype(jnp.bfloat16)           # (t_pad, TG)

    for g in range(B // G):
        sl = slice(g * G, (g + 1) * G)
        slh = slice(g * GH, (g + 1) * GH)
        qr = (selT[None] * q_ref[sl][:, None, :]).reshape(GH, D)
        kg = k_ref[:, sl, :].reshape(TG, D)
        vg = v_ref[:, sl, :].reshape(TG, D)

        s = lax.dot_general(qr, kg, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (GH, TG)
        s = s * scale
        npad_r = jnp.broadcast_to(npad_ref[sl, :1][:, None, :],
                                  (G, n_head, 1)).reshape(GH, 1)
        # ancestry per (query row, t): exact MXU selection (see docstring)
        a_gh = jnp.broadcast_to(
            anc_ref[sl][:, None, :].astype(jnp.bfloat16),
            (G, n_head, t_pad)).reshape(GH, t_pad)
        anc_elem = lax.dot_general(a_gh, W2, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        valid = (base_valid & (t_pos >= npad_r)
                 & (anc_elem == col_beam))
        s = jnp.where(valid, s, NEG)

        m_prev = m_ref[slh, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[slh, :1] = l_ref[slh, :1] * alpha \
            + jnp.sum(p, axis=1, keepdims=True)
        m_ref[slh, :1] = m_new

        bhd = lax.dot_general(p.astype(kv_dtype), vg,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
        acc_ref[slh, :] = acc_ref[slh, :] * alpha + bhd

    @pl.when(tj == pl.num_programs(0) - 1)
    def _finish():
        selTf = selT.astype(jnp.float32)[None]
        acc = acc_ref[...].reshape(B, n_head, D)
        l = jnp.maximum(l_ref[:, :1], 1e-30).reshape(B, n_head, 1)
        o_ref[...] = jnp.sum(acc / l * selTf, axis=1).astype(o_ref.dtype)


def beam_kernel_group(b_total: int, kb: int, n_head: int) -> int:
    """Group width for the beam kernel: a multiple of 8 (Mosaic sublane
    slice granularity) and of kb (families unsplit) that divides the total
    row count; 0 if none exists (caller falls back to the XLA path)."""
    import math
    g0 = (8 * kb) // math.gcd(8, kb)
    if b_total % g0:
        return 0
    return g0


@functools.partial(jax.jit, static_argnames=(
    "n_head", "scale", "kb", "kv_limit", "interpret"))
def decode_attention_beam(
    q: jnp.ndarray,        # (b*kb, D) one query per logical beam (unscaled)
    k_cache: jnp.ndarray,  # (max_len, b*kb, D) T-major flat K cache
    v_cache: jnp.ndarray,  # (max_len, b*kb, D) T-major flat V cache
    anc: jnp.ndarray,      # (b, kb, max_len) int32 ancestry table
    npad: jnp.ndarray,     # (b*kb,) int32 first real slot per row
    cur: jnp.ndarray,      # () int32 last valid slot (== current write pos)
    *,
    n_head: int,
    scale: float,
    kb: int,
    kv_limit: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Lazy-beam decode attention over the flat T-major cache -> (b*kb, D).

    Same streaming structure as ``decode_attention`` (grid over T-chunks,
    online softmax, full buffers passed, live prefix covered); the ancestry
    permutation rides in the in-kernel mask, so cache rows are never moved
    and the only per-step beam cost beyond the greedy kernel is the tiny
    exact ancestry-selection dot (docstring of ``_decode_kernel_beam``)."""
    max_len, B, D = k_cache.shape
    b, kb2, _ = anc.shape
    assert kb2 == kb and b * kb == B, (anc.shape, kb, B)
    if anc.shape[2] < max_len:
        # flat caches round their length to a 64-multiple; positions past
        # the (max_length-sized) table are t-masked anyway
        anc = jnp.pad(anc, ((0, 0), (0, 0), (0, max_len - anc.shape[2])))
    T = max_len if kv_limit is None else min(kv_limit, max_len)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    group = beam_kernel_group(B, kb, n_head)
    if (not interpret and D % 128 != 0) or group == 0:
        return decode_attention_beam_reference(
            q, k_cache, v_cache, anc, npad, cur, n_head=n_head, scale=scale,
            kb=kb, kv_limit=kv_limit)

    # block rows: the greedy kernel's VMEM-budget heuristic (small blocks
    # keep the live-prefix over-read low — r5 log: picking the largest
    # divisor of max_len read the whole 128-row buffer per step at T=36
    # and LOST 28 % end-to-end)
    scratch_bytes = B * n_head * (D + 256) * 4
    budget = (14 << 20) - scratch_bytes - (2 << 20)
    block_t = max(8, budget // (4 * B * D * 2) // 8 * 8)
    blk = 8
    for cand in (64, 32, 16, 8):
        if cand <= block_t and max_len % cand == 0:
            blk = cand
            break
    n_chunks = pl.cdiv(T, blk)
    t_pad = -(-max_len // 128) * 128   # lane-aligned resident ancestry width

    npad_v = jnp.broadcast_to(npad.astype(jnp.int32)[:, None], (B, 128))
    ancQ = jnp.pad(anc.reshape(B, max_len).astype(jnp.int32),
                   ((0, 0), (0, t_pad - max_len)))
    out = pl.pallas_call(
        functools.partial(_decode_kernel_beam, n_head=n_head,
                          scale=float(scale), group=group, kb=kb,
                          t_pad=t_pad),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((B, 128), lambda j: (0, 0)),
            pl.BlockSpec((B, t_pad), lambda j: (0, 0)),  # resident ancestry
            pl.BlockSpec((B, D), lambda j: (0, 0)),      # resident q
            pl.BlockSpec((blk, B, D), lambda j: (j, 0, 0)),
            pl.BlockSpec((blk, B, D), lambda j: (j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((B, D), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((B * n_head, 128), jnp.float32),
            pltpu.VMEM((B * n_head, 128), jnp.float32),
            pltpu.VMEM((B * n_head, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                (B * n_head * (D + 256) * 4 + 4 * blk * B * D * 2
                 + B * (t_pad + 128) * 4 + (48 << 20)), 110 << 20)),
        interpret=interpret,
    )(jnp.reshape(cur, (1,)).astype(jnp.int32), npad_v, ancQ, q,
      k_cache, v_cache)
    return out


def decode_attention_beam_reference(q, k_cache, v_cache, anc, npad, cur, *,
                                    n_head: int, scale: float, kb: int,
                                    kv_limit: Optional[int] = None):
    """XLA reference for the beam kernel (identical semantics, tests)."""
    max_len, B, D = k_cache.shape
    b = B // kb
    dh = D // n_head
    if anc.shape[2] < max_len:
        anc = jnp.pad(anc, ((0, 0), (0, 0), (0, max_len - anc.shape[2])))
    T = max_len if kv_limit is None else min(kv_limit, max_len)
    # (b, kb_j, h, T, dh) physical rows per family
    k = k_cache[:T].reshape(T, b, kb, n_head, dh).transpose(1, 2, 3, 0, 4)
    v = v_cache[:T].reshape(T, b, kb, n_head, dh).transpose(1, 2, 3, 0, 4)
    qh = q.reshape(b, kb, n_head, dh)
    # HIGHEST precision: this is a test oracle, and XLA CPU's default f32
    # matmul rides reduced-precision AMX-bf16 on this host (~2e-3 rel)
    s = jnp.einsum("bihd,bjhtd->bihjt", qh.astype(jnp.float32),
                   k.astype(jnp.float32),
                   precision=lax.Precision.HIGHEST) * scale
    t_pos = jnp.arange(T)
    own = anc[:, :, :T][:, :, None, :] == \
        jnp.arange(kb)[None, None, :, None]                # (b, i, j, t)
    valid = (own & (t_pos[None, None, None, :] <= cur)
             & (t_pos[None, None, None, :]
                >= npad.reshape(b, kb)[:, :, None, None]))
    s = jnp.where(valid[:, :, None], s, NEG)
    sf = s.reshape(b, kb, n_head, kb * T)
    p = jax.nn.softmax(sf, axis=-1).reshape(b, kb, n_head, kb, T)
    o = jnp.einsum("bihjt,bjhtd->bihd", p.astype(jnp.float32),
                   v.astype(jnp.float32), precision=lax.Precision.HIGHEST)
    return o.reshape(B, D).astype(q.dtype)


def decode_attention_reference(q, k_cache, v_cache, npad, cur, *,
                               n_head: int, scale: float,
                               kv_limit: Optional[int] = None):
    """XLA reference with identical semantics (tests; T-major shapes)."""
    max_len, b, D = k_cache.shape
    dh = D // n_head
    T = max_len if kv_limit is None else min(kv_limit, max_len)
    k = k_cache[:T].reshape(T, b, n_head, dh).transpose(1, 2, 0, 3)
    v = v_cache[:T].reshape(T, b, n_head, dh).transpose(1, 2, 0, 3)
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

"""Whole-decode-step Pallas megakernel: every gated-xattn + GPT-2 layer in
ONE launch (VERDICT r3 #1 — "fewer/larger kernels IS an implementational
lever").

Why: after the r4 flat-cache rework the decode step still pays ~12 us of
per-launch DMA ramp x ~48 launches plus XLA op boundaries (BENCH.md r4
ladder). The only way to stream weights + KV back-to-back at the chip's
full HBM rate is a single kernel whose DMA queue never drains: this kernel
executes the ENTIRE per-token trunk — for every layer the gated
cross-attention block (masked xattn + tanh gates + gated FFW) followed by
the GPT-2 block (LN -> QKV -> cache write -> causal attention over the
live prefix -> proj -> MLP) — with all weights streamed through a
double-buffered VMEM ping-pong and the KV caches read/written by manual
async DMA at dynamic positions. Embedding lookup and the lm_head/argmax
stay in XLA (two ops, already at roofline).

Restrictions (the decode fast path; generation.py falls back otherwise):
int8 weights (ops/quant layout), n_embd a multiple of 128 lanes (768 for
GPT-2 base, 1024 for gpt2-medium, ...), bf16 compute, single device,
xattn K/V in bf16, n_media * n_visual latents fitting one VMEM block.
Greedy/sample rows are independent; BEAMS (r5) run the same kernel with
rows in kb-sized families and the lazy-reorder ancestry table applied as
an in-kernel self-attention mask (beam_search._beam_impl packs it in;
needs lcm(8, kb) | batch rows).

Layout contracts (pack_decode_weights / pack_xattn_kv_flat):
* weights: ONE flat (TOTAL_CHUNKS, D, D) int8 array; every matrix is
  padded into D x D chunks (zero row-padding contracts against
  zero-padded activation columns — exact; zero col-padding produces
  outputs that are either sliced away or multiplied by zero downstream).
  The schedule is RAGGED (r5): layers without a gated-xattn block pack
  no xattn chunks at all, and the kernel gates the whole xattn phase
  (weight chunks, K/V DMAs AND compute) on a per-layer SMEM table,
  addressing chunks through per-layer base offsets — non-xattn layers
  stream zero xattn bytes (r4 streamed NX zero chunks: +33 % weight
  traffic at xattn_every=2).
* per-layer smalls (LN params, biases, per-chunk quant scales, gates):
  one (n_layer, SMALL) f32 array, ONE DMA per layer, static offsets.
* caches: stacked T-major (n_layer, T, b, D) bf16, aliased in/out; the
  step's K/V row is DMA-written at ``cur`` before the chunked attention
  read streams [0, kv_limit).
* xattn K/V: flat T-major (n_layer, NMNV, b, XI) bf16.

Numerics mirror the XLA decode path op-for-op (linear: int8 -> bf16 cast,
bf16 matmul, f32 accumulate, f32 per-channel scale, +bias in bf16, cast
bf16; LN stats in f32; residual adds in bf16; attention exactly as
ops/pallas_decode's grouped cross-batch form) so greedy tokens match the
non-mega engine — bitwise on most inputs; the irreducible delta is f32
accumulation ASSOCIATION in the row-chunked mms (fc2/xf2 sum n_embd-wide
partial dots because weights stream chunk-by-chunk, XLA's single K-wide
dot associates differently): +-1-2 bf16 ulp on ~0.03 % of elements
(measured; see BENCH.md megakernel notes and the OPT one-step test).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = float(jnp.finfo(jnp.float32).min)


def _kv_blk(D: int) -> int:
    """Cache-read chunk rows. r4 used 8 because 16 put the VMEM stack 512 B
    over Mosaic's DEFAULT 16 MB scoped limit; r5 measured the chip's real
    VMEM at >=120 MB and raised the limit (CompilerParams), and the r5
    sweep found 16-row chunks cut the headline step 1.86 -> ~1.6 ms
    (fewer KV sync points at ~4 % over-read; 24/32-row chunks give part of
    it back — BENCH.md r5 ladder)."""
    return 16


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------
# The chunk width CW equals n_embd: every weight matrix is padded into
# (CW, CW) int8 MXU-ready tiles (1 MB at D=1024, 576 KB at D=768). Any
# D that is a multiple of 128 lanes with Dff % D == 0 packs cleanly.


def _sched(D: int, Dff: int):
    CW = D
    sched = [("xq", 1), ("xo", 1), ("xf1", Dff // CW), ("xf2", Dff // CW),
             ("qkv", 3 * D // CW), ("o", 1), ("fc", Dff // CW),
             ("pr", Dff // CW)]
    offs, o = {}, 0
    for name, n in sched:
        offs[name] = o
        o += n
    return offs, o


def _small_layout(D: int, Dff: int, n_chunks: int):
    CW = D
    fields = [("ln1_s", D), ("ln1_b", D), ("ln2_s", D), ("ln2_b", D),
              ("xn_s", D), ("xn_b", D), ("xfn_s", D), ("xfn_b", D),
              ("b_qkv", 3 * D), ("b_o", D), ("b_fc", Dff), ("b_pr", D),
              ("gates", 128), ("wscale", n_chunks * CW)]
    soffs, so = {}, 0
    for name, n in fields:
        soffs[name] = so
        so += n
    return soffs, ((so + 127) // 128) * 128


def trunk_dims(arch) -> Tuple[int, int, int, int]:
    """(D, Dff, n_layer, n_head) for a GPT-2 or (pre-norm) OPT trunk."""
    if hasattr(arch, "n_embd"):          # GPT2Arch
        return arch.n_embd, 4 * arch.n_embd, arch.n_layer, arch.n_head
    return (arch.hidden_size, arch.ffn_dim, arch.num_hidden_layers,
            arch.num_attention_heads)


def supports_arch(arch) -> bool:
    """Megakernel trunk support: GPT-2, or pre-norm OPT without the
    opt-350m project_in/out (word_embed_proj_dim == hidden_size)."""
    if hasattr(arch, "n_embd"):
        D, Dff = arch.n_embd, 4 * arch.n_embd
    else:
        if not (arch.do_layer_norm_before
                and arch.word_embed_proj_dim == arch.hidden_size):
            return False
        D, Dff = arch.hidden_size, arch.ffn_dim
    return D % 128 == 0 and Dff % D == 0


def pack_decode_weights(params: Dict[str, Any], config) -> Dict[str, Any]:
    """Stack quantized LM + xattn weights into the megakernel layout.

    Pure functional jnp ops (pad/stack/concat), so it traces inside the
    jitted generate program: the packing runs once per CALL on device
    (~ms for 0.5 GB of copies), not per decode step.

    Trunks: GPT-2 (fused c_attn) and pre-norm OPT (separate q/k/v
    projections — packed as the three "qkv" column chunks, biases
    concatenated; attn_ln -> ln1, final_ln -> ln2, out_proj -> o,
    fc1 -> fc, fc2 -> pr; ReLU rides the act param). The kernel body is
    identical for both: pre-norm attn + pre-norm MLP with residuals.
    """
    lm = params["lm"]
    arch = config.lm_arch
    D, Dff, L, _H = trunk_dims(arch)
    CW = D
    XI = config.xattn_dim_head * config.xattn_heads
    assert supports_arch(arch), \
        f"megakernel does not support this trunk geometry: {arch}"
    assert XI <= CW and Dff % CW == 0
    assert abs(arch.layer_norm_epsilon - 1e-5) < 1e-12, \
        "kernel LN hardcodes eps=1e-5"
    offs, n_chunks = _sched(D, Dff)
    soffs, SMALL = _small_layout(D, Dff, n_chunks)

    def pad2(x, rows, cols):
        return jnp.pad(x, ((0, rows - x.shape[0]), (0, cols - x.shape[1])))

    def pad1(v, n):
        v = jnp.asarray(v, jnp.float32).reshape(-1)
        return jnp.pad(v, (0, n - v.shape[0]))

    def chunks_cols(p, n):
        w = jnp.asarray(p["w8"])
        s = jnp.asarray(p["scale"], jnp.float32)
        wp = pad2(w, CW, n * CW)
        sp = pad1(s, n * CW)
        return ([wp[:, c * CW:(c + 1) * CW] for c in range(n)],
                [sp[c * CW:(c + 1) * CW] for c in range(n)])

    def chunks_rows(p, n):
        w = jnp.asarray(p["w8"])
        s = jnp.asarray(p["scale"], jnp.float32)
        wp = pad2(w, n * CW, CW)
        scales = [pad1(s, CW)] + [jnp.zeros((CW,), jnp.float32)] * (n - 1)
        return ([wp[r * CW:(r + 1) * CW, :] for r in range(n)], scales)

    zero_chunk = jnp.zeros((CW, CW), jnp.int8)
    zero_scale = jnp.zeros((CW,), jnp.float32)
    zvec = lambda n: jnp.zeros((n,), jnp.float32)

    is_gpt2 = "blocks" in lm
    layer_w, layer_s = [], []
    for l in range(L):
        if is_gpt2:
            bp = lm["blocks"][l]
            assert "w8" in bp["c_attn"], \
                "megakernel needs int8-quantized weights"
            trunk_parts = ((bp["c_attn"], 3 * D // CW, "c"),
                           (bp["c_proj"], 1, "c"),
                           (bp["mlp_fc"], Dff // CW, "c"),
                           (bp["mlp_proj"], Dff // CW, "r"))
            ln1, ln2 = bp["ln_1"], bp["ln_2"]
            b_qkv = bp["c_attn"]["b"]
            b_o, b_fc, b_pr = (bp["c_proj"]["b"], bp["mlp_fc"]["b"],
                               bp["mlp_proj"]["b"])
        else:
            bp = lm["layers"][l]
            assert "w8" in bp["q_proj"], \
                "megakernel needs int8-quantized weights"
            trunk_parts = ((bp["q_proj"], 1, "c"), (bp["k_proj"], 1, "c"),
                           (bp["v_proj"], 1, "c"), (bp["out_proj"], 1, "c"),
                           (bp["fc1"], Dff // CW, "c"),
                           (bp["fc2"], Dff // CW, "r"))
            ln1, ln2 = bp["attn_ln"], bp["final_ln"]
            b_qkv = jnp.concatenate([
                jnp.asarray(bp[k]["b"], jnp.float32).reshape(-1)
                for k in ("q_proj", "k_proj", "v_proj")])
            b_o, b_fc, b_pr = (bp["out_proj"]["b"], bp["fc1"]["b"],
                               bp["fc2"]["b"])
        key = str(l)
        wlist, slist = [], []
        has_x = key in params["xattn"]
        if has_x:
            xb = params["xattn"][key]
            at = xb["attn"]
            assert xb["ffw"]["fc1"]["w8"].shape[1] == Dff, \
                "megakernel assumes xattn_ff_mult == 4"
            for p, n, kind in ((at["to_q"], 1, "c"), (at["to_out"], 1, "r"),
                               (xb["ffw"]["fc1"], Dff // CW, "c"),
                               (xb["ffw"]["fc2"], Dff // CW, "r")):
                ws, ss = (chunks_cols if kind == "c" else chunks_rows)(p, n)
                wlist += ws
                slist += ss
            xn_s, xn_b = at["norm"]["scale"], at["norm"]["bias"]
            xfn_s, xfn_b = xb["ffw"]["norm"]["scale"], xb["ffw"]["norm"]["bias"]
            gates = jnp.concatenate([
                jnp.tanh(jnp.asarray(xb["alpha_attn"], jnp.float32)),
                jnp.tanh(jnp.asarray(xb["alpha_ffw"], jnp.float32)),
                zvec(126)])
        else:
            # ragged schedule (r5, VERDICT #2): layers without a gated-xattn
            # block pack NO xattn chunks — the kernel's xattn phase (compute
            # + weight/KV DMAs) is runtime-gated by the has-xattn SMEM table,
            # so non-xattn layers stream zero xattn bytes instead of the r4
            # design's NX zero chunks (+33 % weight traffic at
            # xattn_every=2; reference config axis:
            # /root/reference/flamingo_mini/modeling_flamingo.py:76-94).
            # The per-chunk SCALES stay at their uniform positions (the
            # smalls row is uniform and tiny); only weight chunks go ragged.
            n_x = 2 + 2 * (Dff // CW)
            slist += [zero_scale] * n_x
            xn_s = xn_b = xfn_s = xfn_b = zvec(D)
            gates = zvec(128)
        for p, n, kind in trunk_parts:
            ws, ss = (chunks_cols if kind == "c" else chunks_rows)(p, n)
            wlist += ws
            slist += ss
        n_x_chunks = 2 + 2 * (Dff // CW)
        assert len(wlist) == (n_chunks if has_x else n_chunks - n_x_chunks), \
            (len(wlist), n_chunks, has_x)
        # small row: fields concatenated in _small_layout order
        row = jnp.concatenate([
            pad1(ln1["scale"], D), pad1(ln1["bias"], D),
            pad1(ln2["scale"], D), pad1(ln2["bias"], D),
            pad1(xn_s, D), pad1(xn_b, D), pad1(xfn_s, D), pad1(xfn_b, D),
            pad1(b_qkv, 3 * D), pad1(b_o, D),
            pad1(b_fc, Dff), pad1(b_pr, D),
            gates, jnp.concatenate(slist)])
        row = jnp.pad(row, (0, SMALL - row.shape[0]))
        layer_w.append(jnp.stack(wlist))
        layer_s.append(row)

    has_list = [1 if str(l) in params["xattn"] else 0 for l in range(L)]
    n_x_chunks = 2 + 2 * (Dff // CW)
    ragged = not all(has_list)
    wbase = []
    o = 0
    for h in has_list:
        wbase.append(o)
        o += n_chunks if h else n_chunks - n_x_chunks
    layout = dict(offs=offs, soffs=soffs, n_chunks=n_chunks, SMALL=SMALL,
                  D=D, Dff=Dff, XI=XI, ragged=ragged, NX=n_x_chunks)
    # gate scalars ride SMEM (Mosaic can't broadcast a (1,1) vector over
    # both sublanes and lanes, but scalar * vector is native); pre-rounded
    # to bf16 so the in-kernel f32 product rounds bit-identically to the
    # XLA path's bf16 x bf16 multiply
    gates_smem = jnp.stack(layer_s)[:, soffs["gates"]:soffs["gates"] + 2]
    gates_smem = gates_smem.astype(jnp.bfloat16).astype(jnp.float32)
    # (L, 1, SMALL): the layer index must ride an untiled MAJOR dim — a 2D
    # (L, SMALL) memref is (8, 128)-tiled even in HBM and a dim-0 slice of
    # one row is misaligned (Mosaic memref_slice)
    # weights are FLAT-packed (TOTAL_CHUNKS, D, D): with a ragged schedule
    # the per-layer chunk counts differ, and the kernel addresses chunks as
    # wbase[l] + local_id - (0 if has_x else NX) via the SMEM tables below
    return {"w8": jnp.concatenate(layer_w, axis=0),
            "small": jnp.stack(layer_s)[:, None, :],
            "gates": gates_smem,
            "wbase": jnp.asarray(wbase, jnp.int32),
            "hasx": jnp.asarray(has_list, jnp.int32),
            "layout": layout}


def pack_xattn_kv_flat(xattn_kv: Dict[str, Tuple], n_layer: int):
    """{layer: (k, v)} with k (b, XH, NMNV, dh) -> flat T-major stacks
    (n_layer, NMNV, b, XI) bf16 (zeros for layers without xattn)."""
    any_kv = next(iter(xattn_kv.values()))
    assert not isinstance(any_kv, dict), \
        "megakernel path needs bf16 xattn K/V (int8_kv_cache off)"
    k0, _ = any_kv
    b, XH, NMNV, dh = k0.shape
    XI = XH * dh
    ks = jnp.zeros((n_layer, NMNV, b, XI), jnp.bfloat16)
    vs = jnp.zeros((n_layer, NMNV, b, XI), jnp.bfloat16)
    for key, (k, v) in xattn_kv.items():
        l = int(key)
        ks = ks.at[l].set(
            k.transpose(2, 0, 1, 3).reshape(NMNV, b, XI).astype(jnp.bfloat16))
        vs = vs.at[l].set(
            v.transpose(2, 0, 1, 3).reshape(NMNV, b, XI).astype(jnp.bfloat16))
    return ks, vs


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _grouped_attention(q_bf, stream_k, stream_v, n_chunks, chunk_rows,
                       n_head, dh, scale, valid_fn, B,
                       round_scores: bool = False, group: int = 0):
    """Grouped cross-batch masked attention (the ops/pallas_decode v3 form)
    over chunked (rows, B, D) K/V streams delivered by ``stream_k/v(j)``
    (each returns the j-th (chunk_rows, B, D) bf16 block, blocking).

    q_bf: (B, D) bf16 (pre-scaled per HF convention is NOT applied here —
    ``scale`` multiplies scores post-matmul). valid_fn(j, rows_i, cols_i)
    -> bool (GH, TG) validity for chunk j. Returns (B, D) f32 UNnormalized
    accumulator and (B, n_head) l-sums — caller divides.
    """
    D = q_bf.shape[1]
    if group:
        G = group             # caller-constrained (beam families, r5)
        assert B % G == 0, (B, G)
    else:
        G = max(1, 128 // n_head)
        while B % G:
            G -= 1
    GH, TG = G * n_head, chunk_rows * G
    selT = jnp.where(
        (lax.broadcasted_iota(jnp.int32, (n_head, D), 1) // dh)
        == lax.broadcasted_iota(jnp.int32, (n_head, D), 0),
        1.0, 0.0).astype(jnp.bfloat16)
    rows_i = lax.broadcasted_iota(jnp.int32, (GH, TG), 0)
    cols_i = lax.broadcasted_iota(jnp.int32, (GH, TG), 1)

    n_groups = B // G
    m = [jnp.full((GH, 1), NEG, jnp.float32) for _ in range(n_groups)]
    lsum = [jnp.zeros((GH, 1), jnp.float32) for _ in range(n_groups)]
    acc = [jnp.zeros((GH, D), jnp.float32) for _ in range(n_groups)]

    for j in range(n_chunks):
        kj = stream_k(j)
        vj = stream_v(j)
        for g in range(n_groups):
            sl = slice(g * G, (g + 1) * G)
            qr = (selT[None] * q_bf[sl][:, None, :]).reshape(GH, D)
            kg = kj[:, sl, :].reshape(TG, D)
            vg = vj[:, sl, :].reshape(TG, D)
            s = lax.dot_general(qr, kg, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
            if round_scores:
                # the XLA masked-xattn path casts scores to bf16 before the
                # mask/softmax chain (ops/attention notes) — mirror exactly
                s = s.astype(jnp.bfloat16).astype(jnp.float32)
            valid = valid_fn(j, g, rows_i, cols_i)
            s = jnp.where(valid, s, NEG)
            m_new = jnp.maximum(m[g], jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m[g] - m_new)
            p = jnp.exp(s - m_new)
            lsum[g] = lsum[g] * alpha + jnp.sum(p, axis=1, keepdims=True)
            m[g] = m_new
            bhd = lax.dot_general(p.astype(jnp.bfloat16), vg,
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
            acc[g] = acc[g] * alpha + bhd
    accf = jnp.concatenate(acc, axis=0)          # (B*H, D)
    lf = jnp.concatenate(lsum, axis=0)           # (B*H, 1)
    selTf = selT.astype(jnp.float32)
    out = jnp.sum((accf / jnp.maximum(lf, 1e-30)).reshape(B, n_head, D)
                  * selTf[None], axis=1)          # (B, D) f32
    return out


def _eff_wr(wr: int, nx: int, ragged: bool) -> int:
    """Effective weight-ring depth. Ragged slot parity: trunk chunk local-id
    c occupies slot c % WR whether or not the NX xattn chunks preceded it —
    needs NX % WR == 0."""
    if ragged:
        while nx % wr:
            wr -= 1
    return wr


def _ring_shape(wr: int, wb: int, nc: int, nx: int, ragged: bool):
    """Resolve the weight-stream ring geometry -> (WB, WRB, WROWS).

    ``wb > 1`` groups wb CONTIGUOUS chunks into ONE DMA + ONE semaphore
    wait (the same sync-point-halving lever as KV_BLK on the cache reads,
    which bought ~0.25 ms/step in r5). Block mode requires the runtime-
    gated xattn/trunk boundary and the total count to be block-aligned
    (NX % wb == 0, NC % wb == 0) — otherwise it falls back to wb=1. The
    ragged slot-parity constraint moves to block granularity: the first
    trunk block (NX/wb) must land on slot 0, so (NX/wb) % WRB == 0.
    WROWS is the wbuf scratch row count (WRB ring slots of wb chunks)."""
    if wb > 1 and (nx % wb or nc % wb):
        wb = 1
    if wb == 1:
        wrb = _eff_wr(min(wr, nc), nx, ragged)
        return 1, wrb, wrb
    nb = nc // wb
    wrb = _eff_wr(min(wr, nb), nx // wb, ragged)
    return wb, wrb, wrb * wb


def _build_kernel(*, n_head, xattn_heads, n_visual, kv_limit, layout,
                  B, T, NMNV, act, xact, act_quant=False, wr=2, kr=2,
                  kv_blk=None, kb=1, t_pad=128, wb=1):
    NC = layout["n_chunks"]
    D = layout["D"]
    CW = D                      # chunk width == n_embd (see packing notes)
    Dff = layout["Dff"]
    XI = layout["XI"]
    offs = layout["soffs"]
    woffs = layout["offs"]
    dh = D // n_head
    xdh = XI // xattn_heads
    KV_BLK = kv_blk if kv_blk is not None else _kv_blk(D)
    n_kv_chunks = -(-kv_limit // KV_BLK)
    KR = min(kr, max(n_kv_chunks, 1))  # KV-read ring slots per stream
    RAGGED = bool(layout.get("ragged"))
    NX = layout["NX"]           # xattn chunks per xattn layer (even)
    WB, WR, WROWS = _ring_shape(wr, wb, NC, NX, RAGGED)
    NB = NC // WB               # weight blocks per (uniform) layer

    def kernel(cur_ref, gates_ref, wbase_ref, hasx_ref, npad_ref, tt_ref,
               anc_ref, x_ref, w_ref, small_ref, xk_ref, xv_ref, kc_in,
               vc_in,
               o_ref, kc_out, vc_out,
               xbuf, wbuf, smallb, kvrow, krd, vrd, xkb, xvb,
               wsem, ssem, rowsem, kvsem, xsem):
        l = pl.program_id(0)
        cur = cur_ref[0]
        base_w = wbase_ref[l]
        has_x = hasx_ref[l] > 0
        # local chunk ids are the UNIFORM schedule's (xattn first); ragged
        # layers without xattn hold only the trunk chunks, so their physical
        # index shifts down by NX (never evaluated for locals < NX there)
        shift = jnp.where(has_x, 0, NX) if RAGGED else 0

        @pl.when(l == 0)
        def _():
            xbuf[...] = x_ref[...]
            # sanitize the KV read rings once per step: live-prefix gating
            # skips dead chunks' DMAs, and UNINITIALIZED VMEM can hold NaN
            # bit patterns that poison the masked V dot (0 * NaN). After
            # this, any stale slot content is finite real cache data, which
            # the t<=cur mask zeroes exactly.
            krd[...] = jnp.zeros_like(krd)
            vrd[...] = jnp.zeros_like(vrd)

        # ---- per-layer smalls + first weight chunk ----------------------
        sdma = pltpu.make_async_copy(small_ref.at[l], smallb, ssem)
        sdma.start()

        def wdma(slot, c, n=1):
            # n chunks are contiguous both in HBM (flat packing) and in the
            # wbuf ring (block slots span n rows), so a block is ONE copy
            return pltpu.make_async_copy(
                w_ref.at[pl.ds(base_w + c - shift, n)],
                wbuf.at[pl.ds(slot, n)], wsem.at[slot // WB])

        def wdma_prime(slot, j, n=1):
            # the first consumed chunks are physical base_w + j regardless of
            # has_x (xattn locals j, or trunk locals NX + j shifted by NX) and
            # land in slot j either way (NX % WR == 0; block mode:
            # (NX/WB) % WR == 0 — _ring_shape)
            return pltpu.make_async_copy(
                w_ref.at[pl.ds(base_w + j, n)],
                wbuf.at[pl.ds(slot, n)], wsem.at[slot // WB])

        # prime the weight ring: WR-1 chunk (or WB-chunk block) DMAs in
        # flight before the first consume (a depth-2 ping-pong leaves only
        # ONE outstanding, so every wait eats the DMA grant latency on top
        # of the transfer — the r4 "issue/sync-bound at M=32" signature;
        # deeper rings hide it)
        for j in range(WR - 1):
            wdma_prime(j * WB, j * WB, WB).start()
        # xattn K/V: single-shot DMAs, overlap with the weight stream
        # (skipped entirely on ragged non-xattn layers)
        xkd = pltpu.make_async_copy(xk_ref.at[l], xkb, xsem.at[0])
        xvd = pltpu.make_async_copy(xv_ref.at[l], xvb, xsem.at[1])
        if RAGGED:
            @pl.when(has_x)
            def _():
                xkd.start()
                xvd.start()
        else:
            xkd.start()
            xvd.start()
        sdma.wait()

        state = {"c": 0, "sb": WR - 1}   # c: next chunk; sb: next block start

        def next_chunk():
            c = state["c"]
            if WB == 1:
                slot = c % WR
                if c + WR - 1 < NC:
                    wdma((c + WR - 1) % WR, c + WR - 1).start()
                wdma(slot, c).wait()
                state["c"] = c + 1
                return wbuf[slot]
            # block mode: one DMA + one wait per WB contiguous chunks. The
            # top-up is DEFERRED to the block head (never started between a
            # block's wait and its chunks' dots, so no DMA ever targets rows
            # a pending dot still reads); the bound blk + WR keeps every
            # started block's slot occupant fully consumed (its last chunk
            # index < blk*WB), exactly the WB=1 schedule's capacity.
            blk, off = divmod(c, WB)
            srow = (blk % WR) * WB
            if off == 0:
                while state["sb"] < min(blk + WR, NB):
                    sb = state["sb"]
                    wdma((sb % WR) * WB, sb * WB, WB).start()
                    state["sb"] = sb + 1
                wdma(srow, blk * WB, WB).wait()
            state["c"] = c + 1
            return wbuf[srow + off]

        def sget(name, n):
            return smallb[:, offs[name]:offs[name] + n]     # (1, n) f32

        def wscale(c):
            base = offs["wscale"] + c * CW
            return smallb[:, base:base + CW]                # (1, CW) f32

        def ln(x_bf, sname, bname):
            x32 = x_bf.astype(jnp.float32)
            mean = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
            y = (x32 - mean) * lax.rsqrt(var + 1e-5)
            y = y * sget(sname, D) + sget(bname, D)
            return y.astype(jnp.bfloat16)

        def aquant(x_bf):
            # per-row symmetric absmax int8 quantization of the activation
            # (the w8a8 tier): amax/127 scale, round-to-nearest-even. The
            # int8 x int8 dot accumulates in int32 whose magnitude is bounded
            # by 127*127*1024 = 16.52M < 2^24, so the int32 -> f32 cast below
            # is EXACT — the only numeric loss in the tier is the activation
            # rounding itself.
            x32 = x_bf.astype(jnp.float32)
            amax = jnp.max(jnp.abs(x32), axis=1, keepdims=True)    # (B, 1)
            s = jnp.maximum(amax, 1e-30) * (1.0 / 127.0)
            q = lax.round(x32 * (1.0 / s),
                          lax.RoundingMethod.TO_NEAREST_EVEN)
            return q.astype(jnp.int32).astype(jnp.int8), s

        def wdot_bf16(x_bf, wc8):
            # (B, CW) f32 = x_bf (B, CW) . convert(wc8 (CW, CW) int8).
            # The whole-chunk int8 -> bf16 convert is the kernel's largest
            # SSA temporary (8 MB at OPT-1.3B's (2048, 2048)); r4 strip-
            # looped wide chunks to fit Mosaic's DEFAULT 16 MB scoped-VMEM
            # stack, but the chip's real VMEM is >=120 MB (r5) and the
            # limit is raised via CompilerParams, so every production width
            # takes the single dot (fewer serialized MXU issues at tiny B).
            if CW <= 2048:
                return lax.dot_general(x_bf, wc8.astype(jnp.bfloat16),
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            RS = 1024
            acc = jnp.zeros((B, CW), jnp.float32)
            for r0 in range(0, CW, RS):
                acc = acc + lax.dot_general(
                    x_bf[:, r0:r0 + RS],
                    wc8[r0:r0 + RS].astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            return acc

        def mm_cols(x_bf, name, n, bias_name=None, bias_width=None):
            outs = []
            base = woffs[name]
            if act_quant:
                xq, xs = aquant(x_bf)
            for c in range(n):
                wc8 = next_chunk()
                if act_quant:
                    # int8 MXU path: no per-chunk weight convert, 2x MXU rate
                    y = lax.dot_general(xq, wc8, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                    y = y.astype(jnp.float32) * xs * wscale(base + c)
                else:
                    y = wdot_bf16(x_bf, wc8) * wscale(base + c)
                y = y.astype(jnp.bfloat16)
                if bias_name is not None:
                    bw = bias_width if bias_width is not None else n * CW
                    b = sget(bias_name, bw)[:, c * CW:(c + 1) * CW]
                    y = y + b.astype(jnp.bfloat16)
                outs.append(y)
            return outs

        def mm_rows(h_list, name, n, bias_name=None):
            base = woffs[name]
            acc = jnp.zeros((B, CW), jnp.float32)
            for r in range(n):
                wc8 = next_chunk()
                if act_quant:
                    # each row chunk quantizes its own activation slice (its
                    # own per-row scale) and contributes a scaled f32 partial
                    hq, hsr = aquant(h_list[r])
                    p = lax.dot_general(hq, wc8, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                    acc = acc + p.astype(jnp.float32) * hsr
                else:
                    acc = acc + wdot_bf16(h_list[r], wc8)
            y = (acc * wscale(base)).astype(jnp.bfloat16)
            if bias_name is not None:
                y = y + sget(bias_name, CW).astype(jnp.bfloat16)
            return y

        tt = tt_ref[:, :1]                                    # (B, 1) int32

        def x_valid(j, g, rows_i, cols_i):
            G = rows_i.shape[0] // xattn_heads
            sl = slice(g * G, (g + 1) * G)
            same_b = (rows_i // xattn_heads) == (cols_i % G)
            latent = cols_i // G                              # latent index
            media_time = latent // n_visual + 1
            ttg = jnp.broadcast_to(
                tt[sl][:, None, :], (G, xattn_heads, 1)).reshape(
                    G * xattn_heads, 1)
            return same_b & (media_time == ttg)

        # ================= gated xattn block =============================
        # Runtime-gated on ragged schedules (xattn_every > 1): non-xattn
        # layers skip the whole phase — its NX weight chunks, the xattn K/V
        # DMAs AND the compute — instead of streaming zero chunks (r4).
        def xattn_block():
            x = xbuf[...]                                     # (B, D) bf16
            y_n = ln(x, "xn_s", "xn_b")
            q = mm_cols(y_n, "xq", 1)[0]                      # (B, CW) bf16
            # used columns: [0, XI); the rest are zero-padded weights -> 0
            q = q * jnp.asarray(xdh ** -0.5, jnp.bfloat16)    # pre-score
            xkd.wait()
            xvd.wait()
            # q columns beyond XI are zero but would still get uniform
            # softmax weight over masked-NEG rows... they are killed because
            # the heads only span [0, XI): the attention runs on XI lanes:
            xat = _grouped_attention(
                q[:, :XI] if XI != CW else q, lambda j: xkb[...],
                lambda j: xvb[...], 1, NMNV, xattn_heads, xdh, 1.0,
                x_valid, B, round_scores=True)                # (B, XI) f32
            # no-media rows: post-softmax zeroing (tt == 0)
            xat_z = jnp.where(tt > 0, xat, 0.0)
            if XI != CW:
                xat_z = jnp.concatenate(
                    [xat_z, jnp.zeros((B, CW - XI), jnp.float32)], axis=1)
            xo = mm_rows([xat_z.astype(jnp.bfloat16)], "xo", 1)  # (B, D)
            # gate multiplies ride f32 (Mosaic can't broadcast a (1,1) bf16
            # over both sublanes and lanes); the gate is rounded to bf16
            # first so the f32 product rounded back to bf16 is bit-identical
            # to the XLA path's bf16 x bf16 multiply
            g_attn = gates_ref[l, 0]                          # SMEM scalar
            x = x + (g_attn * xo.astype(jnp.float32)).astype(jnp.bfloat16)
            # gated FFW: LN -> fc1 -> xattn_act -> fc2 (ops.layers.
            # feed_forward; NB the xattn FFW act is config.xattn_act, NOT
            # the trunk's — OPT's relu trunk exposed the difference, and
            # gelu vs gelu_new matters for GPT-2 bitwise parity too)
            h = ln(x, "xfn_s", "xfn_b")
            hs = mm_cols(h, "xf1", Dff // CW)
            hs = [xact(p) for p in hs]
            xf = mm_rows(hs, "xf2", Dff // CW)
            g_ffw = gates_ref[l, 1]                           # SMEM scalar
            x = x + (g_ffw * xf.astype(jnp.float32)).astype(jnp.bfloat16)
            xbuf[...] = x

        if RAGGED:
            pl.when(has_x)(xattn_block)
        else:
            xattn_block()
        x = xbuf[...]

        # ================= GPT-2 block ===================================
        h1 = ln(x, "ln1_s", "ln1_b")
        qkv = mm_cols(h1, "qkv", 3, bias_name="b_qkv")        # [q, k, v]
        ql, kl, vl = qkv

        # cache write at cur, then chunked attention reads it back
        kvrow[0, 0] = kl
        kvrow[1, 0] = vl
        wk = pltpu.make_async_copy(kvrow.at[0], kc_out.at[l].at[pl.ds(cur, 1)],
                                   rowsem.at[0])
        wv = pltpu.make_async_copy(kvrow.at[1], vc_out.at[l].at[pl.ds(cur, 1)],
                                   rowsem.at[1])
        wk.start()
        wv.start()
        wk.wait()
        wv.wait()

        def kv_dma(buf, src, slot, j, sem_base):
            return pltpu.make_async_copy(
                src.at[l].at[pl.ds(j * KV_BLK, KV_BLK)],
                buf.at[slot], kvsem.at[sem_base + slot])

        # live-prefix chunk gating (r5): within a prefix_block segment, cur
        # trails kv_limit by up to a block, so chunks past cur would stream
        # dead rows (~17 % of KV bytes on average). Gate each chunk's DMA
        # on (j*KV_BLK <= cur) — the gate is identical at start and wait
        # time, so every started DMA is waited; the attention compute still
        # runs over the (stale) buffer and its entries mask to exact 0.
        def kv_live(j):
            return j * KV_BLK <= cur

        # prime both KV-read rings (KR-1 chunk DMAs in flight per stream)
        for j in range(min(KR - 1, n_kv_chunks)):
            @pl.when(kv_live(j))
            def _(j=j):
                kv_dma(krd, kc_out, j, j, 0).start()
                kv_dma(vrd, vc_out, j, j, KR).start()
        if KR == 1:
            kv_dma(krd, kc_out, 0, 0, 0).start()
            kv_dma(vrd, vc_out, 0, 0, KR).start()
        npad = npad_ref[:, :1]                                # (B, 1) int32

        def stream(buf, src, sem_base):
            def get(j):
                slot = j % KR
                nxt = j + KR - 1
                if nxt < n_kv_chunks and KR > 1:
                    @pl.when(kv_live(nxt))
                    def _():
                        kv_dma(buf, src, nxt % KR, nxt, sem_base).start()
                if j == 0 and KR > 1:
                    kv_dma(buf, src, 0, 0, sem_base).wait()
                else:
                    @pl.when(kv_live(j))
                    def _():
                        kv_dma(buf, src, slot, j, sem_base).wait()
                return buf[slot]
            return get

        def a_valid(j, g, rows_i, cols_i):
            G = rows_i.shape[0] // n_head
            sl = slice(g * G, (g + 1) * G)
            t_pos = j * KV_BLK + cols_i // G
            npg = jnp.broadcast_to(
                npad[sl][:, None, :], (G, n_head, 1)).reshape(G * n_head, 1)
            bounds = (t_pos >= npg) & (t_pos <= cur)
            if kb == 1:
                same_b = (rows_i // n_head) == (cols_i % G)
                return same_b & bounds
            # lazy-beam ancestry (r5): logical beam row r attends physical
            # row c of its kb-family at position t iff anc[r, t] == c % kb.
            # The per-element lookup anc[r, t(c)] is computed EXACTLY on
            # the MXU via a 0/1 selection matrix (see
            # ops/pallas_decode._decode_kernel_beam — anc values are tiny
            # integers, one 1.0 per column).
            GH, TG = rows_i.shape
            fam_ok = ((rows_i // n_head) // kb) == ((cols_i % G) // kb)
            a_gh = jnp.broadcast_to(
                anc_ref[sl][:, None, :].astype(jnp.bfloat16),
                (G, n_head, t_pad)).reshape(GH, t_pad)
            w_rows = lax.broadcasted_iota(jnp.int32, (t_pad, TG), 0)
            w_cols = lax.broadcasted_iota(jnp.int32, (t_pad, TG), 1)
            W2 = jnp.where(w_rows == j * KV_BLK + w_cols // G,
                           1.0, 0.0).astype(jnp.bfloat16)
            anc_elem = lax.dot_general(a_gh, W2, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            col_beam = ((cols_i % G) % kb).astype(jnp.float32)
            return fam_ok & (anc_elem == col_beam) & bounds

        if kb > 1:
            # beam families must not straddle groups, and Mosaic slices the
            # cache's sublane (batch) dim only at 8-multiples
            import math
            a_group = (8 * kb) // math.gcd(8, kb)
        else:
            a_group = 0
        att = _grouped_attention(
            ql, stream(krd, kc_out, 0), stream(vrd, vc_out, KR),
            n_kv_chunks, KV_BLK, n_head, dh, dh ** -0.5, a_valid, B,
            group=a_group)
        ao = mm_cols(att.astype(jnp.bfloat16), "o", 1, bias_name="b_o",
                     bias_width=CW)[0]
        x = x + ao
        h2 = ln(x, "ln2_s", "ln2_b")
        hs = mm_cols(h2, "fc", Dff // CW, bias_name="b_fc")
        hs = [act(p) for p in hs]
        mo = mm_rows(hs, "pr", Dff // CW, bias_name="b_pr")
        x = x + mo

        xbuf[...] = x

        @pl.when(l == pl.num_programs(0) - 1)
        def _():
            o_ref[...] = x

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "n_head", "xattn_heads", "n_visual", "kv_limit", "layout_key", "act_name",
    "xact_name", "act_quant", "interpret", "wr", "kr", "kv_blk", "kb",
    "wb"))
def _mega_call(cur, gates, wbase, hasx, npad, text_time, anc, x, w8, small,
               xk, xv, kc, vc, *,
               n_head, xattn_heads, n_visual, kv_limit, layout_key, act_name,
               xact_name, act_quant, interpret, wr=2, kr=2, kv_blk=None,
               kb=1, wb=1):
    layout = dict(layout_key)
    layout["offs"] = dict(layout["offs"])
    layout["soffs"] = dict(layout["soffs"])
    L, T, B, D = kc.shape
    NMNV = xk.shape[1]
    SMALL = layout["SMALL"]
    NC = layout["n_chunks"]
    from . import layers as _layers

    def _gelu_erf_mosaic(x):
        # Exact-erf GELU via the Abramowitz-Stegun 7.1.26 rational erf
        # approximation (|err| <= 1.5e-7 ~ 1/10^4 of a bf16 ulp at |x|~1):
        # Mosaic has no erf/erfc primitive (KernelType.TC NotImplemented),
        # and XLA's own TPU erf is a polynomial of the same class. Used in
        # interpret mode too, so CPU tests validate exactly what TPU runs.
        x32 = x.astype(jnp.float32)
        z = x32 * (2.0 ** -0.5)
        s = jnp.sign(z)
        a = jnp.abs(z)
        t = 1.0 / (1.0 + 0.3275911 * a)
        poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                    + t * (-1.453152027 + t * 1.061405429))))
        erf = s * (1.0 - poly * jnp.exp(-a * a))
        return (0.5 * x32 * (1.0 + erf)).astype(x.dtype)

    def _kernel_act(name):
        if name in ("gelu", "gelu_erf"):
            return _gelu_erf_mosaic
        return _layers.get_activation(name)

    act = _kernel_act(act_name)
    xact = _kernel_act(xact_name)

    t_pad = -(-T // 128) * 128 if kb > 1 else 128
    kern = _build_kernel(n_head=n_head, xattn_heads=xattn_heads,
                         n_visual=n_visual, kv_limit=kv_limit, layout=layout,
                         B=B, T=T, NMNV=NMNV, act=act, xact=xact,
                         act_quant=act_quant, wr=wr, kr=kr, kv_blk=kv_blk,
                         kb=kb, t_pad=t_pad, wb=wb)
    if kb > 1:
        bq = B // kb
        anc_v = jnp.pad(anc.reshape(B, anc.shape[-1]).astype(jnp.int32),
                        ((0, 0), (0, max(0, t_pad - anc.shape[-1]))))
        anc_v = anc_v[:, :t_pad]
        del bq
    else:
        anc_v = jnp.zeros((B, 128), jnp.int32)
    KV_BLK = kv_blk if kv_blk is not None else _kv_blk(D)
    _, WR, WROWS = _ring_shape(wr, wb, NC, layout["NX"],
                               bool(layout.get("ragged")))
    n_kv_chunks = -(-min(kv_limit, T) // KV_BLK)
    KR = min(kr, max(n_kv_chunks, 1))
    npad_v = jnp.broadcast_to(npad.astype(jnp.int32)[:, None], (B, 128))
    tt_v = jnp.broadcast_to(text_time.astype(jnp.int32).reshape(B)[:, None],
                            (B, 128))
    # Scoped-VMEM limit: Mosaic's default is 16 MB but the chip's physical
    # VMEM is far larger (measured ≥120 MB on this v5e — r5 probe). Budget =
    # scratch buffers + an 8 MB allowance for SSA temps (the int8→bf16 chunk
    # convert alone is 2·D² bytes) so deep DMA rings compile.
    XIb = layout["XI"]
    scratch_bytes = (B * D * 2 + WROWS * D * D + SMALL * 4 + 2 * B * D * 2
                     + 2 * KR * KV_BLK * B * D * 2 + 2 * NMNV * B * XIb * 2
                     + 4 * B * 128 * 4 + 2 * B * D * 2)
    # temp allowance: the compiler's live SSA stack holds several chunk-
    # convert-sized (2*D^2 bf16) values at once around the wide dots
    # (measured demand at D=2048: 52 MB against scratch ~11.5 MB — r5 log),
    # plus a 12 MB floor for attention/LN intermediates at small D
    vmem_limit = min(max(scratch_bytes + 10 * D * D + (12 << 20), 16 << 20),
                     110 << 20)
    out, kc2, vc2 = pl.pallas_call(
        kern,
        grid=(L,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),   # gates
            pl.BlockSpec(memory_space=pltpu.SMEM),   # wbase (ragged offsets)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # hasx
            pl.BlockSpec(memory_space=pltpu.VMEM),   # npad
            pl.BlockSpec(memory_space=pltpu.VMEM),   # text_time
            pl.BlockSpec(memory_space=pltpu.VMEM),   # anc (beam ancestry)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x
            pl.BlockSpec(memory_space=pltpu.HBM),    # w8
            pl.BlockSpec(memory_space=pltpu.HBM),    # small (ANY could
            # choose VMEM, whose dim-0 slices must be tile-aligned)
            pl.BlockSpec(memory_space=pltpu.HBM),    # xk
            pl.BlockSpec(memory_space=pltpu.HBM),    # xv
            pl.BlockSpec(memory_space=pltpu.HBM),    # kc
            pl.BlockSpec(memory_space=pltpu.HBM),    # vc
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, D), jnp.bfloat16),
            jax.ShapeDtypeStruct(kc.shape, kc.dtype),
            jax.ShapeDtypeStruct(vc.shape, vc.dtype),
        ],
        input_output_aliases={12: 1, 13: 2},
        scratch_shapes=[
            pltpu.VMEM((B, D), jnp.bfloat16),              # xbuf
            pltpu.VMEM((WROWS, D, D), jnp.int8),           # wbuf ring
            pltpu.VMEM((1, SMALL), jnp.float32),           # smallb
            pltpu.VMEM((2, 1, B, D), jnp.bfloat16),        # kvrow (k, v)
            pltpu.VMEM((KR, KV_BLK, B, D), jnp.bfloat16),  # krd
            pltpu.VMEM((KR, KV_BLK, B, D), jnp.bfloat16),  # vrd
            pltpu.VMEM((NMNV, B, layout["XI"]), jnp.bfloat16),  # xkb
            pltpu.VMEM((NMNV, B, layout["XI"]), jnp.bfloat16),  # xvb
            pltpu.SemaphoreType.DMA((WR,)),                # wsem
            pltpu.SemaphoreType.DMA(()),                   # ssem
            pltpu.SemaphoreType.DMA((2,)),                 # rowsem
            pltpu.SemaphoreType.DMA((2 * KR,)),            # kvsem
            pltpu.SemaphoreType.DMA((2,)),                 # xsem
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(jnp.reshape(cur, (1,)).astype(jnp.int32), gates, wbase, hasx,
      npad_v, tt_v, anc_v, x, w8, small, xk, xv, kc, vc)
    return out, kc2, vc2


def hashable_layout(layout: dict):
    return (("offs", tuple(sorted(layout["offs"].items()))),
            ("soffs", tuple(sorted(layout["soffs"].items()))),
            ("n_chunks", layout["n_chunks"]), ("SMALL", layout["SMALL"]),
            ("D", layout["D"]), ("Dff", layout["Dff"]), ("XI", layout["XI"]),
            ("ragged", bool(layout.get("ragged"))), ("NX", layout["NX"]))


def _ring_defaults(D: int, B: int):
    """DMA-ring depths + cache-read block (r5, VERDICT #1). Measured on the
    headline shape (BENCH.md r5 ladder): the depth-2 ping-pongs were NOT
    the main bottleneck (rings of 2/3/4/8 all read within a few % once the
    cache-read block grew), the KV sync-point count was — KV_BLK 8 -> 16
    is the whole 1.86 -> ~1.6 ms/step win, and 4+-deep rings just spend
    VMEM. The weight ring default is 3: a paired idle-host A/B read
    WR=3 >= WR=2 in every comparison (pooled ~+2 captions/s, one extra
    in-flight chunk DMA for +D*D bytes of VMEM); KR deeper than 2 never
    paid. Env overrides FLAMINGO_MEGA_WR / _KR / _KVBLK remain for A/B.

    FLAMINGO_MEGA_WB (r5, experimental): weight-block size — WB contiguous
    chunks per DMA + semaphore wait (sync-point halving at WB=2, the KV_BLK
    lever applied to the weight stream). Default 1 until measured."""
    import os
    wr = int(os.environ.get("FLAMINGO_MEGA_WR", "0")) or 3
    kr = int(os.environ.get("FLAMINGO_MEGA_KR", "0")) or 2
    kv_blk = int(os.environ.get("FLAMINGO_MEGA_KVBLK", "0")) or None
    wb = int(os.environ.get("FLAMINGO_MEGA_WB", "0")) or 1
    return wr, kr, kv_blk, wb


def decode_step_megakernel(packed, xk, xv, kc, vc, x_emb, npad, text_time,
                           cur, *, config, kv_limit, act_quant=False,
                           interpret=None, beam_anc=None):
    """One decode step through the megakernel. Returns (hidden (b, D) bf16,
    new kc, new vc). Caches are donated/aliased. ``act_quant`` switches the
    trunk linears to the w8a8 tier (per-row int8 activations, int8 MXU).

    ``beam_anc`` ((b, kb, max_len) int32, r5): lazy-beam decode — rows come
    in kb-sized families and the self-attention applies the ancestry table
    as an in-kernel mask over the family's unmoved cache rows (the
    engine-side permutation never touches HBM). Requires lcm(8, kb) | B."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    arch = config.lm_arch
    _D, _Dff, _L, n_head = trunk_dims(arch)
    kv_limit = min(kv_limit if kv_limit is not None else kc.shape[1],
                   kc.shape[1])
    wr, kr, kv_blk, wb = _ring_defaults(_D, kc.shape[2])
    kb = 1 if beam_anc is None else int(beam_anc.shape[1])
    anc = (jnp.zeros((kc.shape[2], 128), jnp.int32) if beam_anc is None
           else beam_anc)
    return _mega_call(
        cur, packed["gates"], packed["wbase"], packed["hasx"], npad,
        text_time, anc, x_emb, packed["w8"],
        packed["small"], xk, xv,
        kc, vc, n_head=n_head, xattn_heads=config.xattn_heads,
        n_visual=config.resampler_num_latents, kv_limit=kv_limit,
        layout_key=hashable_layout(packed["layout"]),
        act_name=arch.activation, xact_name=config.xattn_act,
        act_quant=act_quant, interpret=interpret, wr=wr, kr=kr,
        kv_blk=kv_blk, kb=kb, wb=wb)

"""jit-compiled beam search, semantics-matched to HF transformers' vectorized
``GenerationMixin._beam_search`` (the algorithm the reference drives through
HF ``generate(num_beams>1)``; /root/reference/flamingo_mini/modeling_flamingo.py:464-548).

Algorithm (per step, filling sequence position ``cur``):
* accumulate ``log_softmax`` into running beam scores; flatten (k*V) and take
  the top ``2k`` candidates;
* a candidate "hits stopping criteria" if its token is EOS or the sequence
  reaches ``max_length``; such candidates are excluded from the running
  refill, and those ranked < k enter the finished pool with score
  ``sum_logprobs / gen_len**length_penalty`` (EOS kept IN the sequence);
* the finished pool keeps the best k of (pool ∪ new finishers) by a merged
  top-k; pool updates are blocked once a row's pool is all-finished
  (early_stopping=True) or the one-way improvement heuristic trips;
* halt when no row can improve, every pool is full (early stopping), or all
  continuations hit stopping criteria (max_length).

TPU design: beams fold into the batch axis for model calls; prefill runs ONCE
per batch row — the reference replicates the prompt per beam and pays ``k``x
the prefill + vision compute (modeling_flamingo.py:485-510). The per-step
beam reorder (the reference pays a host-side per-tensor ``index_select``,
modeling_flamingo.py:536-547) has two modes (``DecodeConfig.beam_reorder``):

* ``"gather"`` — physically permute the KV cache's leading axis with
  ``take_along_axis`` (full live-prefix HBM read + write-back per step);
* ``"lazy"`` (default) — ancestor-indexed reorder: cache rows never move.
  A (b, k, max_len) int32 ancestry table records which physical row owns
  each logical beam's position; the permutation is applied as a mask inside
  the attention read (ops/attention.attend_beam_lazy), so the only per-step
  reorder cost is permuting the tiny table. Decode-step HBM traffic drops
  from read+write of the cache to the read attention already pays.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .configuration_flamingo import FlamingoConfig
from .models import flamingo
from .ops.layers import Policy

NEG = jnp.float32(-1.0e9)


def _tile_beams(x, k: int):
    """(b, ...) -> (b*k, ...) repeating each row."""
    return jnp.repeat(x, k, axis=0)


def _gather_beams(x, parent, b: int, k: int):
    """Reorder the (b*k, ...) leading axis by per-row parent indices (b, k)."""
    xr = x.reshape((b, k) + x.shape[1:])
    out = jnp.take_along_axis(
        xr, parent.reshape((b, k) + (1,) * (x.ndim - 1)), axis=1)
    return out.reshape((b * k,) + x.shape[1:])


@partial(jax.jit, static_argnames=("config", "dc", "policy"))
def _beam_impl(params, config: FlamingoConfig, dc, policy: Policy,
               input_ids, media_locations, attention_mask, visual_features,
               pixel_values=None, rng=None):
    from .generation import _prefill  # shared prompt/prefill machinery

    if rng is None:
        rng = jax.random.PRNGKey(0)

    if pixel_values is not None:
        visual_features = flamingo.encode_resample_visuals(
            params, config, policy.cast(pixel_values), policy=policy)

    b, L = input_ids.shape
    k = dc.num_beams
    k2 = 2 * k
    max_len = dc.max_length
    # HF max_new_tokens: hypotheses stop at M (= max_length when unset);
    # buffers stay max_length-sized
    M = max_len if dc.max_new_tokens is None else \
        min(max_len, L + dc.max_new_tokens)
    lm = params["lm"]
    for key in ("wte", "embed_tokens"):
        if key in lm:
            vocab = lm[key].shape[0]
            break
        if key + "_q" in lm:
            vocab = lm[key + "_q"]["w8"].shape[0]
            break
    lp_pow = dc.length_penalty
    early = bool(dc.early_stopping)

    # Flat T-major cache + ancestry-masked Pallas beam kernel (r5, VERDICT
    # #4): lazy reorder over unmoved cache rows, streamed at the flat
    # kernel's rate instead of the XLA head-layout einsums. The per-layer
    # kernel needs the lazy table (the gather mode physically permutes
    # rows) and bf16/f32 K/V.
    flat_beam = (dc.flat_kv_cache and dc.beam_reorder == "lazy"
                 and not dc.int8_kv_cache)
    next_logits, xattn_kv, st = _prefill(
        params, config, dc, policy, input_ids, media_locations,
        attention_mask, visual_features, flat=flat_beam)

    # flat cache leaves are T-major (max_len, b, D): beams tile the ROW dim
    tile_cache = ((lambda x: jnp.repeat(x, k, axis=1)) if flat_beam
                  else (lambda x: _tile_beams(x, k)))
    cache = jax.tree_util.tree_map(tile_cache, st["cache"])
    xattn_kv = jax.tree_util.tree_map(lambda x: _tile_beams(x, k), xattn_kv)
    tokens = _tile_beams(st["tokens"], k)            # (b*k, max_len) running
    mask_buf = _tile_beams(st["mask"], k)
    pos_next = _tile_beams(st["pos_next"], k)
    media_count = _tile_beams(st["media_count"], k)

    # Whole-step megakernel for beams (r5): the flat-kernel beam attention
    # only recovered ~7 % because the per-step cost had moved to the
    # un-kernelized trunk (XLA linears re-streaming 0.5 GB of weights per
    # step) — so run the SAME single-launch trunk the greedy path uses,
    # with the ancestry mask applied inside its self-attention
    # (ops/pallas_megadecode.py kb > 1). Full logits still come from the
    # XLA head (beams consume the whole distribution).
    use_mega = False
    if dc.megakernel and flat_beam:
        from .ops import pallas_megadecode as mega
        from .ops.pallas_decode import beam_kernel_group
        n_head_lm = mega.trunk_dims(config.lm_arch)[3]
        use_mega = (mega.supports_arch(config.lm_arch)
                    and ("wte_q" in lm or "embed_tokens_q" in lm)
                    and beam_kernel_group(b * k, k, n_head_lm) > 0
                    and (b * k) % 2 == 0)
    if use_mega:
        from .configuration_flamingo import GPT2Arch
        from .models import gpt2 as _gpt2
        from .models import opt as _opt
        from .ops.layers import layer_norm as _layer_norm
        from .ops.quant import embed_lookup
        packed = mega.pack_decode_weights(params, config)
        n_layer = mega.trunk_dims(config.lm_arch)[2]
        xkf, xvf = mega.pack_xattn_kv_flat(xattn_kv, n_layer)
        cache = {"kc": jnp.stack([c["kf"] for c in cache]),
                 "vc": jnp.stack([c["vf"] for c in cache])}
        npad0 = jnp.argmax(mask_buf, axis=-1).astype(jnp.int32)
        decode_hook = None
        arch = config.lm_arch

        def mega_forward(tokens, mask_buf, cache, anc, cur, lim):
            prev_tok = lax.dynamic_slice_in_dim(tokens, cur - 1, 1, axis=1)
            pos = pos_next + (cur - 1 - L)
            if isinstance(arch, GPT2Arch):
                emb = embed_lookup(lm["wte_q"], prev_tok, policy.dtype)
                x = (emb + lm["wpe"].astype(policy.dtype)[pos])[:, 0]
            else:
                emb = embed_lookup(lm["embed_tokens_q"], prev_tok,
                                   policy.dtype)
                x = (emb + lm["embed_positions"].astype(
                    policy.dtype)[pos + _opt.POS_OFFSET])[:, 0]
            hidden, kc, vc = mega.decode_step_megakernel(
                packed, xkf, xvf, cache["kc"], cache["vc"], x, npad0,
                media_count, cur - 1, config=config, kv_limit=lim,
                act_quant=dc.w8a8, beam_anc=anc)
            if isinstance(arch, GPT2Arch):
                h = _layer_norm(hidden[:, None, :], lm["ln_f"],
                                arch.layer_norm_epsilon)
                logits = _gpt2.lm_head(lm, h, policy)
            else:
                h = _layer_norm(hidden[:, None, :], lm["final_ln"],
                                arch.layer_norm_epsilon)
                logits = _opt.lm_head(lm, h, policy)
            return logits, {"kc": kc, "vc": vc}
    else:
        decode_hook = flamingo.make_layer_hook(
            params, config, xattn_kv, media_count, policy=policy)

    run_scores = jnp.full((b, k), NEG).at[:, 0].set(0.0)
    fin_seq = jnp.full((b, k, max_len), dc.pad_token_id, jnp.int32)
    fin_scores = jnp.full((b, k), NEG)
    fin_flags = jnp.zeros((b, k), bool)
    heur_unsat = jnp.ones((b,), bool)
    top_mask = jnp.arange(k2) < k                    # rank < k
    lazy = dc.beam_reorder == "lazy"
    # ancestor-indexed (lazy) reorder: anc[b, i, t] = physical cache row that
    # holds logical beam i's K/V for position t. After prefill+tiling every
    # logical beam owns its own row; decode writes position cur-1 into row i
    # (prev_tok comes from the gathered ``tokens``), so anc[:, i, cur-1] = i
    # always holds and only the ancestry of EARLIER positions is permuted.
    anc = jnp.tile(jnp.arange(k, dtype=jnp.int32)[None, :, None],
                   (b, 1, max_len))
    own_row = jnp.arange(k, dtype=jnp.int32)[None, :]

    def step_update(state, logp_bkV, cur, lim=None):
        """Fill position ``cur`` from per-beam log-probs (b, k, V).

        ``lim`` (static): only cache slots [0, lim) can have been written so
        far, so the per-step beam reorder gathers just that prefix and leaves
        the (all-zero, beam-identical) tail in place — with ``prefix_block``
        segmentation this cuts the dominant beam cost, the full-cache
        gather, to the live prefix. With ``beam_reorder="lazy"`` the cache is
        never touched at all: only the (b, k, max_len) int32 ancestry table
        is permuted, and the attention read applies it as a mask
        (ops/attention.attend_beam_lazy)."""
        (tokens, mask_buf, cache, run_scores,
         fin_seq, fin_scores, fin_flags, heur_unsat, anc) = state

        flat = (run_scores[:, :, None] + logp_bkV).reshape(b, k * vocab)
        if dc.do_sample:
            # HF beam-sample: multinomial WITHOUT replacement over the flat
            # accumulated distribution == Gumbel-top-k; candidate scores stay
            # the ORIGINAL accumulated log-probs (HF gathers, not the noisy
            # values)
            key = jax.random.fold_in(rng, cur)
            g = -jnp.log(-jnp.log(
                jax.random.uniform(key, flat.shape, minval=1e-20, maxval=1.0)))
            _, top_idx = lax.top_k(flat + g, k2)
            top_lp = jnp.take_along_axis(flat, top_idx, axis=1)
        else:
            # NB: measured on TPU v5e — plain lax.top_k beats the blockwise
            # exact decomposition (ops/topk.py) at beam*vocab ~ 150k lanes
            # (17.9 vs 22.6 ms/step); keep the utility for wider rows only
            top_lp, top_idx = lax.top_k(flat, k2)              # (b, 2k) desc
        parent = (top_idx // vocab).astype(jnp.int32)
        tok = (top_idx % vocab).astype(jnp.int32)

        hits = (tok == dc.eos_token_id) | (cur + 1 >= M)        # (b, 2k)

        # candidate sequences: parent rows with the new token at cur
        rows = tokens.reshape(b, k, max_len)
        cand_seq = jnp.take_along_axis(rows, parent[:, :, None], axis=1)
        iota = jax.lax.broadcasted_iota(jnp.int32, (b, k2, max_len), 2)
        cand_seq = jnp.where(iota == cur, tok[:, :, None], cand_seq)

        # running refill: best k candidates that did NOT finish
        run_lp = top_lp + hits.astype(jnp.float32) * NEG
        new_run_scores, run_idx = lax.top_k(run_lp, k)
        run_parent = jnp.take_along_axis(parent, run_idx, axis=1)
        run_tok = jnp.take_along_axis(tok, run_idx, axis=1)

        tokens = _gather_beams(tokens, run_parent, b, k)

        if lazy:
            # permute only the ancestry table (tiny int32); cache rows stay
            # put. Position cur's K/V will be written into each beam's OWN
            # row at the next forward (prev_tok reads the gathered tokens).
            anc_new = jnp.take_along_axis(anc, run_parent[:, :, None], axis=1)
            anc_new = anc_new.at[:, :, cur].set(own_row)
            cache_new = cache
        else:
            anc_new = anc

            def gather_cache_leaf(x):
                if lim is None or lim >= x.shape[2]:
                    return _gather_beams(x, run_parent, b, k)
                head = _gather_beams(x[:, :, :lim], run_parent, b, k)
                return lax.dynamic_update_slice(x, head, (0, 0, 0, 0))

            cache_new = jax.tree_util.tree_map(gather_cache_leaf, cache)
        tokens = tokens.reshape(b, k, max_len).at[:, :, cur].set(run_tok)\
                       .reshape(b * k, max_len)
        mask_buf = mask_buf.at[:, cur].set(1)

        # finished pool update (HF _update_finished_beams)
        just_finished = hits & top_mask[None, :]
        gen_len = (cur + 1 - L).astype(jnp.float32)
        pen_lp = top_lp / (gen_len ** lp_pow)
        pool_full = jnp.all(fin_flags, axis=-1, keepdims=True) & early
        pen_lp = pen_lp + pool_full.astype(jnp.float32) * NEG
        pen_lp = pen_lp + (~heur_unsat[:, None]).astype(jnp.float32) * NEG
        pen_lp = pen_lp + (~just_finished).astype(jnp.float32) * NEG

        merged_seq = jnp.concatenate([fin_seq, cand_seq], axis=1)      # (b, 3k, max)
        merged_sc = jnp.concatenate([fin_scores, pen_lp], axis=1)
        merged_fl = jnp.concatenate([fin_flags, just_finished], axis=1)
        best_sc, best_idx = lax.top_k(merged_sc, k)
        fin_seq = jnp.take_along_axis(merged_seq, best_idx[:, :, None], axis=1)
        fin_scores = best_sc
        fin_flags = jnp.take_along_axis(merged_fl, best_idx, axis=1)

        # one-way early-stop heuristic (HF _check_early_stop_heuristic);
        # denominator uses the post-increment generated length
        best_possible = new_run_scores[:, :1] / (gen_len ** lp_pow)
        worst_fin = jnp.where(fin_flags,
                              jnp.min(fin_scores, axis=1, keepdims=True), NEG)
        heur_unsat = heur_unsat & jnp.any(best_possible > worst_fin, axis=-1)

        state = (tokens, mask_buf, cache_new, new_run_scores,
                 fin_seq, fin_scores, fin_flags, heur_unsat, anc_new)
        return state, hits

    def _logp(logits_2d):
        """Per-row log-probs (HF _beam_search log_softmaxes first)."""
        return jax.nn.log_softmax(logits_2d.astype(jnp.float32), axis=-1)

    def _warp(scores_2d):
        """Beam-sampling warper chain, HF-merged-chain semantics
        (transformers _beam_search with do_sample=True): the warpers run on
        the POST-log_softmax, post-processor scores, before beam scores are
        added, and the warped (un-renormalized) values are what accumulate
        into the running beam scores — so beam pruning under temperature != 1
        matches HF exactly (advisor r3: warping raw logits pre-log_softmax
        gave the same filtered sets but divergent cumulative scores)."""
        if dc.do_sample and (dc.temperature != 1.0 or dc.top_k > 0
                             or dc.top_p < 1.0 or dc.min_p > 0.0
                             or dc.typical_p < 1.0 or dc.epsilon_cutoff > 0.0
                             or dc.eta_cutoff > 0.0):
            from .generation import apply_logit_filters
            scores_2d = apply_logit_filters(
                scores_2d, temperature=dc.temperature, top_k=dc.top_k,
                top_p=dc.top_p, min_p=dc.min_p, typical_p=dc.typical_p,
                epsilon_cutoff=dc.epsilon_cutoff, eta_cutoff=dc.eta_cutoff)
        return scores_2d

    # ---- fill position L from the (shared) prefill logits ------------------
    from .generation import process_logits
    pb = dc.prefix_block
    seg_ends = ([M] if pb <= 0 else
                sorted(set(list(range(L + 1 + pb, M, pb)) + [M])))
    logp0 = _warp(process_logits(_logp(next_logits), dc, st["tokens"],
                                 st["mask"], jnp.asarray(L, jnp.int32), L))
    logp0 = jnp.broadcast_to(logp0[:, None, :], (b, k, vocab))
    state = (tokens, mask_buf, cache, run_scores,
             fin_seq, fin_scores, fin_flags, heur_unsat, anc)
    state, hits = step_update(state, logp0, jnp.asarray(L, jnp.int32),
                              None if pb <= 0 else seg_ends[0])

    def make_cond(seg_end):
        def cond(carry):
            state, hits, cur = carry
            fin_flags, heur_unsat = state[6], state[7]
            improvement_possible = jnp.any(heur_unsat)
            exists_open = ~(jnp.all(fin_flags) & early)
            valid_cont = ~jnp.all(hits)
            alive = improvement_possible & exists_open & valid_cont
            return alive if seg_end is None else alive & (cur < seg_end)
        return cond

    def make_body(lim):
        def body(carry):
            state, _hits, cur = carry
            tokens, mask_buf, cache = state[0], state[1], state[2]
            if use_mega:
                logits, cache = mega_forward(tokens, mask_buf, cache,
                                             state[8], cur, lim)
            else:
                prev_tok = lax.dynamic_slice_in_dim(tokens, cur - 1, 1,
                                                    axis=1)
                logits, cache = flamingo.apply_lm(
                    params, config, prev_tok, policy=policy,
                    layer_hook=decode_hook, attention_mask=mask_buf,
                    position_ids=pos_next + (cur - 1 - L),
                    cache=cache, cache_index=cur - 1, kv_limit=lim,
                    beam_anc=state[8] if lazy else None)
            # HF beam mode applies the processor chain to the POST-log_softmax
            # scores (generation/utils.py _beam_search), unlike greedy/sample
            # mode where it runs on raw logits — match that exactly; the
            # sampling warpers follow the processors (merged HF chain)
            from .generation import process_logits
            logp = _warp(process_logits(_logp(logits[:, -1]), dc, tokens,
                                        mask_buf, cur, L))
            state = (tokens, mask_buf, cache) + state[3:]
            state, hits = step_update(state, logp.reshape(b, k, vocab), cur,
                                      lim)
            return state, hits, cur + 1
        return body

    carry = (state, hits, jnp.asarray(L + 1, jnp.int32))
    if pb <= 0:
        carry = lax.while_loop(make_cond(None), make_body(None), carry)
    else:
        # live-prefix segmented decode (mirrors generation._generate_impl):
        # static segment bounds; early stopping exits all remaining segments
        for seg_end in seg_ends:
            carry = lax.while_loop(make_cond(seg_end),
                                   make_body(min(seg_end, max_len)), carry)
    state, hits, cur = carry
    fin_seq, fin_scores = state[4], state[5]

    # finished pool per row, sorted desc by score (slot 0 = best). Rows that
    # never finished anything keep -1e9 scores but slot 0 still holds the
    # best candidate absorbed at the max_length step.
    return fin_seq, fin_scores


@partial(jax.jit, static_argnames=("config", "dc", "policy"))
def _group_beam_impl(params, config: FlamingoConfig, dc, policy: Policy,
                     input_ids, media_locations, attention_mask,
                     visual_features, pixel_values=None):
    """Diverse (group) beam search, semantics-matched to HF's
    ``BeamSearchScorer(num_beam_groups>1)`` + ``HammingDiversityLogitsProcessor``
    (the classic ``_group_beam_search`` loop; the reference reaches it through
    HF ``generate(num_beam_groups=..., diversity_penalty=...)``,
    /root/reference/flamingo_mini/modeling_flamingo.py:464-548).

    Per step, the ``G`` groups (each ``kg = k/G`` beams) are processed
    sequentially: group ``g``'s log-probs are penalized by
    ``diversity_penalty * count(token chosen by groups < g this step)``
    (Hamming diversity runs FIRST in the HF chain), then a standard
    2*kg-candidate beam update runs per group with its own finished pool of
    size kg. A group freezes once done (pool full under early_stopping, or
    the is_done heuristic); frozen groups emit pads, which — exactly as in
    HF — still enter later groups' diversity counts. At the end, non-done
    groups absorb their running beams (``BeamSearchScorer.finalize``), and
    the per-row result is the merged pools sorted by score.

    The model forward still runs ONCE per step over all b*k beams (as HF
    does); only the score bookkeeping is per-group. Returns
    ``(fin_seq (b, k, max_len), fin_scores (b, k))`` sorted desc like
    ``_beam_impl``.
    """
    from .generation import _prefill, process_logits

    if pixel_values is not None:
        visual_features = flamingo.encode_resample_visuals(
            params, config, policy.cast(pixel_values), policy=policy)

    b, L = input_ids.shape
    k = dc.num_beams
    G = dc.num_beam_groups
    kg = k // G
    max_len = dc.max_length
    M = max_len if dc.max_new_tokens is None else \
        min(max_len, L + dc.max_new_tokens)
    lm = params["lm"]
    for key in ("wte", "embed_tokens"):
        if key in lm:
            vocab = lm[key].shape[0]
            break
        if key + "_q" in lm:
            vocab = lm[key + "_q"]["w8"].shape[0]
            break
    lp_pow = dc.length_penalty
    early = bool(dc.early_stopping)
    dp = dc.diversity_penalty

    # flat T-major cache + Pallas beam kernel when lazy (see _beam_impl)
    flat_beam = (dc.flat_kv_cache and dc.beam_reorder == "lazy"
                 and not dc.int8_kv_cache)
    next_logits, xattn_kv, st = _prefill(
        params, config, dc, policy, input_ids, media_locations,
        attention_mask, visual_features, flat=flat_beam)

    tile_cache = ((lambda x: jnp.repeat(x, k, axis=1)) if flat_beam
                  else (lambda x: _tile_beams(x, k)))
    cache = jax.tree_util.tree_map(tile_cache, st["cache"])
    xattn_kv = jax.tree_util.tree_map(lambda x: _tile_beams(x, k), xattn_kv)
    tokens = _tile_beams(st["tokens"], k)            # (b*k, max_len)
    mask_buf = _tile_beams(st["mask"], k)
    pos_next = _tile_beams(st["pos_next"], k)
    media_count = _tile_beams(st["media_count"], k)
    decode_hook = flamingo.make_layer_hook(
        params, config, xattn_kv, media_count, policy=policy)

    # slot 0 of EVERY group starts live (HF: beam_scores[:, ::group_size]=0)
    run_scores = jnp.full((b, G, kg), NEG).at[:, :, 0].set(0.0)
    fin_seq = jnp.full((b, G, kg, max_len), dc.pad_token_id, jnp.int32)
    fin_scores = jnp.full((b, G, kg), NEG)
    fin_flags = jnp.zeros((b, G, kg), bool)
    done = jnp.zeros((b, G), bool)
    rank2 = jnp.arange(2 * kg) < kg                  # candidate rank < kg
    rows_b = jnp.arange(b)[:, None]
    lazy = dc.beam_reorder == "lazy"
    # ancestor-indexed reorder across ALL k beams (groups share the physical
    # cache; parent_global already indexes the full beam axis) — see
    # _beam_impl / ops.attention.attend_beam_lazy
    anc = jnp.tile(jnp.arange(k, dtype=jnp.int32)[None, :, None],
                   (b, 1, max_len))
    own_row = jnp.arange(k, dtype=jnp.int32)[None, :]

    def step(state, logp_bkV, cur, lim=None):
        """Fill position ``cur`` from (b, k, V) log-probs, group by group.
        ``lim`` (static): live-prefix bound — the non-lazy cache gather only
        permutes slots [0, lim) (see _beam_impl.step_update)."""
        (tokens, mask_buf, cache, run_scores,
         fin_seq, fin_scores, fin_flags, done, anc) = state
        rows4 = tokens.reshape(b, G, kg, max_len)
        mask4 = mask_buf.reshape(b, G, kg, max_len)
        counts = jnp.zeros((b, vocab), jnp.float32)
        parts = []
        new_rs_g, new_fseq_g, new_fsc_g, new_ffl_g, new_done_g = \
            [], [], [], [], []
        gen_len = (cur + 1 - L).astype(jnp.float32)
        for g in range(G):
            done_g = done[:, g]                                    # (b,)
            # Hamming diversity FIRST (HF appends it at the chain head),
            # then the shared processor chain on the group's rows
            s = logp_bkV[:, g * kg:(g + 1) * kg, :] - dp * counts[:, None, :]
            s = process_logits(
                s.reshape(b * kg, vocab), dc,
                rows4[:, g].reshape(b * kg, max_len),
                mask4[:, g].reshape(b * kg, max_len), cur, L
            ).reshape(b, kg, vocab)
            flat = (run_scores[:, g, :, None] + s).reshape(b, kg * vocab)
            top_lp, top_idx = lax.top_k(flat, 2 * kg)              # (b, 2kg)
            parent = (top_idx // vocab).astype(jnp.int32)
            tok = (top_idx % vocab).astype(jnp.int32)
            eos_cand = tok == dc.eos_token_id

            # running refill: best kg non-eos candidates (rank order)
            run_lp = top_lp + eos_cand.astype(jnp.float32) * NEG
            new_rs, run_idx = lax.top_k(run_lp, kg)
            run_parent = jnp.take_along_axis(parent, run_idx, axis=1)
            run_tok = jnp.take_along_axis(tok, run_idx, axis=1)
            # frozen groups emit pads from beam 0 with score 0 (HF pads the
            # batch for done groups; content no longer matters)
            run_parent = jnp.where(done_g[:, None], 0, run_parent)
            run_tok = jnp.where(done_g[:, None],
                                jnp.asarray(dc.pad_token_id, jnp.int32),
                                run_tok)
            new_rs = jnp.where(done_g[:, None], 0.0, new_rs)

            # finished pool: eos candidates ranked < kg, unless group done
            just_fin = eos_cand & rank2[None, :] & ~done_g[:, None]
            pen_lp = top_lp / (gen_len ** lp_pow) \
                + (~just_fin).astype(jnp.float32) * NEG
            cand_seq = jnp.take_along_axis(rows4[:, g], parent[:, :, None],
                                           axis=1)                 # (b,2kg,max)
            iota = lax.broadcasted_iota(jnp.int32, (b, 2 * kg, max_len), 2)
            cand_seq = jnp.where(iota == cur, tok[:, :, None], cand_seq)
            merged_seq = jnp.concatenate([fin_seq[:, g], cand_seq], axis=1)
            merged_sc = jnp.concatenate([fin_scores[:, g], pen_lp], axis=1)
            merged_fl = jnp.concatenate([fin_flags[:, g], just_fin], axis=1)
            best_sc, best_idx = lax.top_k(merged_sc, kg)
            fseq = jnp.take_along_axis(merged_seq, best_idx[:, :, None],
                                       axis=1)
            ffl = jnp.take_along_axis(merged_fl, best_idx, axis=1)

            # HF BeamHypotheses.is_done(next_scores.max(), cur_len)
            pool_full = jnp.all(ffl, axis=-1)
            if early:
                done_new = done_g | pool_full
            else:
                worst = jnp.min(best_sc, axis=-1)
                highest = top_lp[:, 0] / (gen_len ** lp_pow)
                done_new = done_g | (pool_full & (worst >= highest))

            # this group's chosen tokens (pads when frozen) enter the
            # diversity counts of every LATER group — HF's current_tokens
            counts = counts.at[rows_b, run_tok].add(1.0)
            parts.append((g * kg + run_parent, run_tok))
            new_rs_g.append(new_rs)
            new_fseq_g.append(fseq)
            new_fsc_g.append(best_sc)
            new_ffl_g.append(ffl)
            new_done_g.append(done_new)

        parent_global = jnp.concatenate([p for p, _ in parts], axis=1)  # (b,k)
        tok_global = jnp.concatenate([t for _, t in parts], axis=1)
        tokens = _gather_beams(tokens, parent_global, b, k)
        tokens = tokens.reshape(b, k, max_len).at[:, :, cur].set(tok_global)\
                       .reshape(b * k, max_len)
        mask_buf = mask_buf.at[:, cur].set(1)
        if lazy:
            anc = jnp.take_along_axis(anc, parent_global[:, :, None], axis=1)
            anc = anc.at[:, :, cur].set(own_row)
        else:
            def gather_cache_leaf(x):
                if lim is None or lim >= x.shape[2]:
                    return _gather_beams(x, parent_global, b, k)
                head = _gather_beams(x[:, :, :lim], parent_global, b, k)
                return lax.dynamic_update_slice(x, head, (0, 0, 0, 0))
            cache = jax.tree_util.tree_map(gather_cache_leaf, cache)
        return (tokens, mask_buf, cache, jnp.stack(new_rs_g, axis=1),
                jnp.stack(new_fseq_g, axis=1), jnp.stack(new_fsc_g, axis=1),
                jnp.stack(new_ffl_g, axis=1), jnp.stack(new_done_g, axis=1),
                anc)

    def _logp_rows(logits_2d):
        return jax.nn.log_softmax(logits_2d.astype(jnp.float32), axis=-1)

    # ---- position L from the shared prefill logits -----------------------
    pb = dc.prefix_block
    seg_ends = ([M] if pb <= 0 else
                sorted(set(list(range(L + 1 + pb, M, pb)) + [M])))
    logp0 = jnp.broadcast_to(_logp_rows(next_logits)[:, None, :],
                             (b, k, vocab))
    state = (tokens, mask_buf, cache, run_scores,
             fin_seq, fin_scores, fin_flags, done, anc)
    state = step(state, logp0, jnp.asarray(L, jnp.int32),
                 None if pb <= 0 else seg_ends[0])

    def make_cond(seg_end):
        def cond(carry):
            state, cur = carry
            alive = (cur < M) & ~jnp.all(state[7])
            return alive if seg_end is None else alive & (cur < seg_end)
        return cond

    def make_body(lim):
        def body(carry):
            state, cur = carry
            tokens, mask_buf, cache = state[0], state[1], state[2]
            prev_tok = lax.dynamic_slice_in_dim(tokens, cur - 1, 1, axis=1)
            logits, cache = flamingo.apply_lm(
                params, config, prev_tok, policy=policy,
                layer_hook=decode_hook, attention_mask=mask_buf,
                position_ids=pos_next + (cur - 1 - L),
                cache=cache, cache_index=cur - 1, kv_limit=lim,
                beam_anc=state[8] if lazy else None)
            state = (tokens, mask_buf, cache) + state[3:]
            logp = _logp_rows(logits[:, -1]).reshape(b, k, vocab)
            state = step(state, logp, cur, lim)
            return state, cur + 1
        return body

    carry = (state, jnp.asarray(L + 1, jnp.int32))
    if pb <= 0:
        carry = lax.while_loop(make_cond(None), make_body(None), carry)
    else:
        # live-prefix segmented decode (mirrors _beam_impl): static segment
        # bounds; all-groups-done exits every remaining segment immediately
        for seg_end in seg_ends:
            carry = lax.while_loop(make_cond(seg_end),
                                   make_body(min(seg_end, max_len)), carry)
    state, cur = carry
    (tokens, _mask, _cache, run_scores,
     fin_seq, fin_scores, fin_flags, done, _anc) = state

    # ---- finalize (BeamSearchScorer.finalize): non-done groups absorb
    # their kg running beams, penalized by the final generated length ------
    run_pen = run_scores / ((cur - L).astype(jnp.float32) ** lp_pow) \
        + done[:, :, None].astype(jnp.float32) * NEG
    rows4 = tokens.reshape(b, G, kg, max_len)
    merged_seq = jnp.concatenate([fin_seq, rows4], axis=2)     # (b, G, 2kg, .)
    merged_sc = jnp.concatenate([fin_scores, run_pen], axis=2)
    best_sc, best_idx = lax.top_k(merged_sc, kg)
    fin_seq = jnp.take_along_axis(merged_seq, best_idx[..., None], axis=2)
    fin_scores = best_sc

    # ---- cross-group selection: per row, ALL groups' pools merged, sorted
    # desc (HF finalize sorts the concatenated candidate_beams) ------------
    all_sc = fin_scores.reshape(b, G * kg)
    all_seq = fin_seq.reshape(b, G * kg, max_len)
    best_sc, best_idx = lax.top_k(all_sc, k)
    return jnp.take_along_axis(all_seq, best_idx[:, :, None], axis=1), best_sc


def beam_generate(params, config, dc, policy, input_ids, media_locations,
                  attention_mask, visual_features, pixel_values=None,
                  rng=None):
    """Beam-search decode (``dc.do_sample`` = HF beam-sample via
    Gumbel-top-k). Returns token ids: prompt + best hypothesis (EOS kept
    in-sequence) + pads — HF decoded layout. With
    ``dc.num_return_sequences=n`` the top n hypotheses per row are returned
    interleaved, shape (b*n, max_length), matching HF ``generate``."""
    nrs = dc.num_return_sequences
    if nrs > dc.num_beams:
        raise ValueError(
            f"num_return_sequences ({nrs}) must be <= num_beams "
            f"({dc.num_beams}) for beam search (HF semantics)")
    if dc.num_beam_groups > 1:
        fin_seq, scores = _group_beam_impl(
            params, config, dc, policy, input_ids, media_locations,
            attention_mask, visual_features, pixel_values)
    else:
        fin_seq, scores = _beam_impl(params, config, dc, policy, input_ids,
                                     media_locations, attention_mask,
                                     visual_features, pixel_values, rng)
    if nrs > 1:
        b, _k, max_len = fin_seq.shape
        seqs = fin_seq[:, :nrs].reshape(b * nrs, max_len)
        if dc.return_scores:
            return seqs, scores[:, :nrs].reshape(b * nrs)
        return seqs
    if dc.return_scores:
        # HF sequences_scores: length-penalized pool score of the returned
        # hypothesis (BeamSearchScorer.finalize best_scores)
        return fin_seq[:, 0], scores[:, 0]
    return fin_seq[:, 0]


def beam_generate_with_scores(params, config, dc, policy, input_ids,
                              media_locations, attention_mask, visual_features,
                              pixel_values=None, rng=None):
    """Like beam_generate but also returns the length-penalized sequence
    scores (HF's ``sequences_scores``). ``rng`` seeds beam-sampling
    (``dc.do_sample``); None keeps the deterministic default key."""
    fin_seq, fin_scores = _beam_impl(
        params, config, dc, policy, input_ids, media_locations,
        attention_mask, visual_features, pixel_values, rng)
    return fin_seq[:, 0], fin_scores[:, 0]

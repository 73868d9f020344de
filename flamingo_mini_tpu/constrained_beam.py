"""jit-compiled constrained beam search (HF ``force_words_ids``), semantics-
matched to transformers' ``ConstrainedBeamSearchScorer`` + the classic
``_constrained_beam_search`` driver (the algorithm the reference reaches via
HF ``generate(force_words_ids=...)``;
/root/reference/flamingo_mini/modeling_flamingo.py:464-548, reference dep
``transformers>=4.25.1`` ships the scorer).

Algorithm per step (HF ``process`` + ``step_sentence_constraint``):

* standard top-2k candidate selection from the flat accumulated log-probs;
  EOS candidates ranked < k enter the finished pool ONLY if their parent
  beam's constraint state is complete; non-EOS candidates refill k running
  slots ("topk" candidates);
* ADVANCE candidates are added: for every pre-step beam whose constraints
  are incomplete, one candidate per constraint-advancing token (the next
  trie edge of the in-progress constraint, or the first token of every
  pending constraint), scored from the same accumulated score matrix;
  duplicates (same parent sequence + same token) are dropped, first kept;
* all candidates are sorted into BANKS (completed-constraint progress:
  ``n_complete * max_seqlen + in-progress depth``) and the new k beams are
  picked round-robin across banks in descending bank order, best-scoring
  first within a bank (HF's ``zipped = banks * 100 + scores`` key, then a
  stable argsort of within-bank ranks — reproduced bit-for-bit, including
  the <-100-score quirk of the 100x bank weighting);
* at the end, running beams enter the pool only if their constraints are
  complete; if fewer than ``num_return_sequences`` hypotheses were
  collected, the highest-scoring incomplete beams fill the remainder
  (HF ``finalize`` fallback).

TPU design: constraint automata are STATIC tables built from the (hashable)
``force_words_ids`` spec at trace time — one merged trie per constraint,
edges flattened into (node, token, next, constraint) arrays; the dynamic
per-beam state is three int32s (completed bitmask, in-progress constraint,
in-progress trie node) carried through the ``lax.while_loop``. Transitions
and advance-candidate enumeration are vectorized comparisons over the
static edge arrays ((b, k, E) ops — E is the total trie edge count, tiny).
The KV cache uses the same ancestor-indexed lazy reorder as plain beam
search (cache rows never move; ops/attention.attend_beam_lazy).

Deviation from HF (documented): after an in-progress constraint is broken
(reset), HF moves it to the END of its pending-scan order; this
implementation scans pending constraints in their ORIGINAL index order.
The two differ only when two incomplete constraints can both advance on
the same token after a reset — and then only in which one advances first.
"""
from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .configuration_flamingo import FlamingoConfig
from .models import flamingo
from .ops.layers import Policy

NEG = jnp.float32(-1.0e9)


# ---------------------------------------------------------------------------
# static constraint tables
# ---------------------------------------------------------------------------


def normalize_force_words(force_words_ids) -> Tuple[Tuple[Tuple[int, ...], ...], ...]:
    """Normalize HF's ``force_words_ids`` (``List[List[int]]`` for phrasal
    constraints, ``List[List[List[int]]]`` for disjunctive ones, mixed) to a
    hashable tuple-of-constraints; each constraint is a tuple of alternative
    phrases."""
    out = []
    for w in force_words_ids:
        if len(w) == 0:
            raise ValueError("force_words_ids entries must be non-empty")
        if isinstance(w[0], (list, tuple)):
            alts = tuple(tuple(int(t) for t in alt) for alt in w)
        else:
            alts = (tuple(int(t) for t in w),)
        for alt in alts:
            if len(alt) == 0 or any(t < 0 for t in alt):
                raise ValueError(
                    f"force_words_ids phrases must be non-empty positive "
                    f"token ids, got {w}")
        # HF DisjunctiveTrie(no_subsets=True): one alternative being a strict
        # subset (prefix-closed leaf) of another makes completion ambiguous
        for a in alts:
            for c in alts:
                if a is not c and len(a) <= len(c) and c[:len(a)] == a:
                    raise ValueError(
                        f"force_words_ids disjunctive set {w} has an "
                        f"alternative that is a subset of another (HF "
                        f"DisjunctiveTrie no_subsets error)")
        out.append(alts)
    return tuple(out)


class ConstraintTables:
    """Merged-trie automaton tables for a static constraint spec.

    Nodes are globally numbered; node 0..n_constraints-1 are the roots.
    ``edges``: (node, token, next_node, constraint_idx, next_is_leaf).
    ``node_bank[n]``: HF ``get_bank`` contribution of being at node n =
    max_seqlen - seqlen(constraint) + depth(n). ``full_mask``: all
    constraints completed.
    """

    def __init__(self, spec: Tuple[Tuple[Tuple[int, ...], ...], ...]):
        self.spec = spec
        n_c = len(spec)
        assert n_c <= 31, "at most 31 constraints (int32 bitmask)"
        seqlens = [max(len(a) for a in alts) for alts in spec]
        self.max_seqlen = max(seqlens)
        edges: List[Tuple[int, int, int, int, int]] = []
        node_bank = []
        roots = []
        next_node = 0

        for cidx, alts in enumerate(spec):
            root = next_node
            roots.append(root)
            next_node += 1
            node_bank.append(self.max_seqlen - seqlens[cidx] + 0)
            # merged trie: children[node] -> {token: node}
            children = {root: {}}
            for alt in alts:
                cur = root
                for depth, tok in enumerate(alt):
                    is_last = depth == len(alt) - 1
                    if tok in children.setdefault(cur, {}):
                        cur = children[cur][tok]
                        if is_last:
                            # no_subsets validated in normalize; reaching an
                            # existing node as leaf can't happen
                            pass
                    else:
                        nid = next_node
                        next_node += 1
                        children[cur][tok] = nid
                        node_bank.append(
                            self.max_seqlen - seqlens[cidx] + depth + 1)
                        cur = nid
            # flatten edges in (constraint, node, insertion) order — the
            # scan order HF's pending loop and trie iteration follow
            leaf_nodes = {n for n in range(root, next_node)
                          if n not in children or not children[n]}
            for node in range(root, next_node):
                for tok, nxt in children.get(node, {}).items():
                    edges.append((node, tok, nxt, cidx,
                                  1 if nxt in leaf_nodes else 0))

        self.n_constraints = n_c
        self.n_nodes = next_node
        self.full_mask = (1 << n_c) - 1
        self.roots = np.asarray(roots, np.int32)
        e = np.asarray(edges, np.int32).reshape(-1, 5)
        self.edge_node = e[:, 0]
        self.edge_tok = e[:, 1]
        self.edge_next = e[:, 2]
        self.edge_cidx = e[:, 3]
        self.edge_leaf = e[:, 4]
        self.edge_is_root = np.isin(self.edge_node, self.roots)
        self.node_bank = np.asarray(node_bank, np.int32)
        self.n_edges = len(edges)


def _state_add_token(tab: ConstraintTables, mask, cidx, node, tok):
    """Vectorized ``ConstraintListState.add(tok)`` over (...,) state arrays.

    Returns (mask', cidx', node'). Mirrors HF: an in-progress constraint
    either steps/completes on a matching trie edge or RESETS (the breaking
    token is not retried against other constraints); with no in-progress
    constraint, the first pending constraint whose root advances on ``tok``
    steps (original index order — see module docstring).
    """
    en = jnp.asarray(tab.edge_node)
    et = jnp.asarray(tab.edge_tok)
    ex = jnp.asarray(tab.edge_next)
    ec = jnp.asarray(tab.edge_cidx)
    el = jnp.asarray(tab.edge_leaf)
    er = jnp.asarray(tab.edge_is_root)

    full = mask == tab.full_mask
    tokx = tok[..., None]
    # in-progress: match children of `node`
    m_prog = (en[None] == node[..., None]) & (et[None] == tokx)
    any_prog = jnp.any(m_prog, axis=-1)
    e_prog = jnp.argmax(m_prog, axis=-1)
    # pending scan: root edges of not-yet-completed constraints
    pending_ok = (jnp.right_shift(mask[..., None], ec[None]) & 1) == 0
    m_pend = er[None] & (et[None] == tokx) & pending_ok
    any_pend = jnp.any(m_pend, axis=-1)
    e_pend = jnp.argmax(m_pend, axis=-1)

    inprog = cidx >= 0
    e_sel = jnp.where(inprog, e_prog, e_pend)
    stepped = jnp.where(inprog, any_prog, any_pend)
    leaf = el[e_sel] == 1
    new_bit = jnp.left_shift(jnp.int32(1), ec[e_sel])

    mask_n = jnp.where(~full & stepped & leaf, mask | new_bit, mask)
    cidx_n = jnp.where(
        full, cidx,
        jnp.where(stepped & ~leaf, ec[e_sel],
                  jnp.where(inprog | stepped, -1, cidx)))
    node_n = jnp.where(
        full, node,
        jnp.where(stepped & ~leaf, ex[e_sel],
                  jnp.where(inprog | stepped, -1, node)))
    return mask_n, cidx_n, node_n


def _popcount(x):
    c = jnp.zeros_like(x)
    for i in range(31):
        c = c + (jnp.right_shift(x, i) & 1)
    return c


def _state_bank(tab: ConstraintTables, mask, cidx, node):
    """HF ``ConstraintListState.get_bank``."""
    nb = jnp.asarray(tab.node_bank)
    base = _popcount(mask) * tab.max_seqlen
    add = jnp.where(cidx >= 0, nb[jnp.maximum(node, 0)], 0)
    return base + add


# ---------------------------------------------------------------------------
# the decode loop
# ---------------------------------------------------------------------------


def _tile_beams(x, k):
    return jnp.repeat(x, k, axis=0)


def _gather_beams(x, parent, b, k):
    xr = x.reshape((b, k) + x.shape[1:])
    out = jnp.take_along_axis(
        xr, parent.reshape((b, k) + (1,) * (x.ndim - 1)), axis=1)
    return out.reshape((b * k,) + x.shape[1:])


@partial(jax.jit, static_argnames=("config", "dc", "policy", "spec"))
def _constrained_beam_impl(params, config: FlamingoConfig, dc, policy: Policy,
                           spec, input_ids, media_locations, attention_mask,
                           visual_features, pixel_values=None):
    from .generation import _prefill, process_logits

    tab = ConstraintTables(spec)
    E = tab.n_edges

    if pixel_values is not None:
        visual_features = flamingo.encode_resample_visuals(
            params, config, policy.cast(pixel_values), policy=policy)

    b, L = input_ids.shape
    k = dc.num_beams
    k2 = 2 * k
    C = k + k * E                        # candidate slots per batch row
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

    next_logits, xattn_kv, st = _prefill(
        params, config, dc, policy, input_ids, media_locations,
        attention_mask, visual_features)

    cache = jax.tree_util.tree_map(lambda x: _tile_beams(x, k), st["cache"])
    xattn_kv = jax.tree_util.tree_map(lambda x: _tile_beams(x, k), xattn_kv)
    tokens = _tile_beams(st["tokens"], k)
    mask_buf = _tile_beams(st["mask"], k)
    pos_next = _tile_beams(st["pos_next"], k)
    media_count = _tile_beams(st["media_count"], k)
    decode_hook = flamingo.make_layer_hook(
        params, config, xattn_kv, media_count, policy=policy)

    run_scores = jnp.full((b, k), NEG).at[:, 0].set(0.0)
    fin_seq = jnp.full((b, k, max_len), dc.pad_token_id, jnp.int32)
    fin_scores = jnp.full((b, k), NEG)
    fin_flags = jnp.zeros((b, k), bool)
    heur_unsat = jnp.ones((b,), bool)
    top_mask = jnp.arange(k2) < k
    # constraint state per beam: the prompt does not advance constraints
    # (HF initializes fresh states at decoding start)
    c_mask = jnp.zeros((b, k), jnp.int32)
    c_cidx = jnp.full((b, k), -1, jnp.int32)
    c_node = jnp.full((b, k), -1, jnp.int32)
    anc = jnp.tile(jnp.arange(k, dtype=jnp.int32)[None, :, None],
                   (b, 1, max_len))
    own_row = jnp.arange(k, dtype=jnp.int32)[None, :]

    edge_tok = jnp.asarray(tab.edge_tok)
    edge_node = jnp.asarray(tab.edge_node)
    edge_cidx = jnp.asarray(tab.edge_cidx)
    edge_is_root = jnp.asarray(tab.edge_is_root)

    def step_update(state, logp_bkV, cur, lim=None):
        """Fill position ``cur``: top-2k + advance candidates, banked
        round-robin refill (HF process + step_sentence_constraint)."""
        (tokens, mask_buf, cache, run_scores, fin_seq, fin_scores,
         fin_flags, heur_unsat, anc, c_mask, c_cidx, c_node) = state

        flat = (run_scores[:, :, None] + logp_bkV).reshape(b, k * vocab)
        top_lp, top_idx = lax.top_k(flat, k2)                  # (b, 2k)
        parent = (top_idx // vocab).astype(jnp.int32)
        tok = (top_idx % vocab).astype(jnp.int32)
        hits = tok == dc.eos_token_id

        # parent states gathered per candidate
        def g(x, idx):
            return jnp.take_along_axis(x, idx, axis=1)

        par_mask2 = g(c_mask, parent)
        par_completed = par_mask2 == tab.full_mask

        # ---- finished pool: EOS candidates ranked < k whose parent
        # completed every constraint (HF check_completes_constraints on the
        # sequence WITHOUT the EOS token) -------------------------------
        rows = tokens.reshape(b, k, max_len)
        cand_seq = jnp.take_along_axis(rows, parent[:, :, None], axis=1)
        iota = lax.broadcasted_iota(jnp.int32, (b, k2, max_len), 2)
        cand_seq = jnp.where(iota == cur, tok[:, :, None], cand_seq)

        just_finished = hits & top_mask[None, :] & par_completed
        gen_len = (cur + 1 - L).astype(jnp.float32)
        pen_lp = top_lp / (gen_len ** lp_pow)
        pool_full = jnp.all(fin_flags, axis=-1, keepdims=True) & early
        pen_lp = pen_lp + pool_full.astype(jnp.float32) * NEG
        pen_lp = pen_lp + (~heur_unsat[:, None]).astype(jnp.float32) * NEG
        pen_lp = pen_lp + (~just_finished).astype(jnp.float32) * NEG

        merged_seq = jnp.concatenate([fin_seq, cand_seq], axis=1)
        merged_sc = jnp.concatenate([fin_scores, pen_lp], axis=1)
        merged_fl = jnp.concatenate([fin_flags, just_finished], axis=1)
        best_sc, best_idx = lax.top_k(merged_sc, k)
        fin_seq_n = jnp.take_along_axis(merged_seq, best_idx[:, :, None],
                                        axis=1)
        fin_scores_n = best_sc
        fin_flags_n = jnp.take_along_axis(merged_fl, best_idx, axis=1)

        # ---- running refill: k best non-EOS candidates ("topk") --------
        run_lp = top_lp + hits.astype(jnp.float32) * NEG
        topk_sc, run_idx = lax.top_k(run_lp, k)
        topk_parent = g(parent, run_idx)
        topk_tok = g(tok, run_idx)
        topk_valid = topk_sc > NEG / 2

        # topk candidate states: parent state advanced by the chosen token
        tm, tc, tn = _state_add_token(
            tab, g(c_mask, topk_parent), g(c_cidx, topk_parent),
            g(c_node, topk_parent), topk_tok)

        # ---- advance candidates: (pre-step beam i, trie edge e) --------
        # valid iff the edge continues beam i's in-progress node, or roots a
        # pending constraint when nothing is in progress
        inprog = c_cidx >= 0                                    # (b, k)
        e_ok_prog = edge_node[None, None] == c_node[:, :, None]
        pending_ok = (jnp.right_shift(c_mask[:, :, None],
                                      edge_cidx[None, None]) & 1) == 0
        e_ok_pend = edge_is_root[None, None] & pending_ok
        adv_valid = jnp.where(inprog[:, :, None], e_ok_prog, e_ok_pend)
        adv_valid = adv_valid & (c_mask != tab.full_mask)[:, :, None]
        # dedup within a beam: edges with equal tokens, keep the first
        # (b, k, E, E) is tiny (E ~ phrase tokens)
        same_tok = edge_tok[None, :] == edge_tok[:, None]       # (E, E)
        earlier = jnp.tril(jnp.ones((E, E), bool), k=-1)
        dup_prev = jnp.einsum("bke,ef->bkf", adv_valid.astype(jnp.float32),
                              (same_tok & earlier).astype(jnp.float32)) > 0
        adv_valid = adv_valid & ~dup_prev
        # dedup across beams: same parent SEQUENCE + same token. Sequence
        # equality across beams (degenerate early beams are copies):
        row_eq = jnp.all(rows[:, :, None, :] == rows[:, None, :, :], axis=-1)
        strictly_earlier = jnp.tril(jnp.ones((k, k), bool), k=-1)
        dup_beam = jnp.einsum(
            "bij,bje->bie", (row_eq & strictly_earlier).astype(jnp.float32),
            adv_valid.astype(jnp.float32)) > 0
        # only a duplicate if the earlier beam carries the SAME edge-validity
        # for that token — approximated by same edge being valid there; the
        # einsum above checks exactly that (edge e valid on an earlier equal
        # beam)
        adv_valid = adv_valid & ~dup_beam
        # dedup against topk candidates: advance (i, e) duplicates topk slot
        # j iff parent rows equal and the tokens match
        topk_row_eq = jnp.all(
            rows[:, :, None, :] == jnp.take_along_axis(
                rows, topk_parent[:, :, None], axis=1)[:, None, :, :],
            axis=-1)                                            # (b, k_i, k_j)
        tok_eq = edge_tok[None, None, :, None] == \
            topk_tok[:, None, None, :]                          # (b,1,E,k)
        dup_topk = jnp.any(topk_row_eq[:, :, None, :] & tok_eq
                           & topk_valid[:, None, None, :], axis=-1)
        adv_valid = adv_valid & ~dup_topk

        # advance scores from the same accumulated matrix; state via the
        # static edge transition
        flat3 = flat.reshape(b, k, vocab)
        adv_sc = jnp.take_along_axis(
            flat3, jnp.broadcast_to(edge_tok[None, None], (b, k, E)), axis=2)
        adv_sc = jnp.where(adv_valid, adv_sc, NEG)
        am, ac, an = _state_add_token(
            tab, jnp.broadcast_to(c_mask[:, :, None], (b, k, E)),
            jnp.broadcast_to(c_cidx[:, :, None], (b, k, E)),
            jnp.broadcast_to(c_node[:, :, None], (b, k, E)),
            jnp.broadcast_to(edge_tok[None, None], (b, k, E)))

        # ---- merged candidate list (C = k + k*E slots) ------------------
        cand_sc = jnp.concatenate([topk_sc, adv_sc.reshape(b, k * E)], 1)
        cand_tok = jnp.concatenate(
            [topk_tok, jnp.broadcast_to(edge_tok[None, None],
                                        (b, k, E)).reshape(b, k * E)], 1)
        cand_parent = jnp.concatenate(
            [topk_parent, jnp.broadcast_to(
                jnp.arange(k, dtype=jnp.int32)[None, :, None],
                (b, k, E)).reshape(b, k * E)], 1)
        cand_m = jnp.concatenate([tm, am.reshape(b, k * E)], 1)
        cand_c = jnp.concatenate([tc, ac.reshape(b, k * E)], 1)
        cand_n = jnp.concatenate([tn, an.reshape(b, k * E)], 1)
        cand_valid = jnp.concatenate(
            [topk_valid, adv_valid.reshape(b, k * E)], 1)

        banks = _state_bank(tab, cand_m, cand_c, cand_n)        # (b, C)
        # HF: zipped = banks * 100 + scores, sorted desc; then a stable sort
        # by within-bank rank => round-robin across banks
        zipped = jnp.where(cand_valid,
                           banks.astype(jnp.float32) * 100.0 + cand_sc, NEG)
        order = jnp.argsort(-zipped, axis=1, stable=True)       # (b, C) desc
        sorted_banks = jnp.take_along_axis(
            jnp.where(cand_valid, banks, -1), order, axis=1)
        # increments: rank within its bank among the sorted list
        same_bank = sorted_banks[:, :, None] == sorted_banks[:, None, :]
        pos = jnp.arange(C)
        before = pos[None, :] < pos[:, None]                    # (C, C)
        increments = jnp.sum(same_bank & before[None], axis=2)  # (b, C)
        sorted_valid = jnp.take_along_axis(cand_valid, order, axis=1)
        increments = jnp.where(sorted_valid, increments, C + pos[None, :])
        rearr = jnp.argsort(increments, axis=1, stable=True)
        pick = jnp.take_along_axis(order, rearr, axis=1)[:, :k]  # (b, k)

        new_run_scores = jnp.take_along_axis(cand_sc, pick, axis=1)
        run_parent = jnp.take_along_axis(cand_parent, pick, axis=1)
        run_tok = jnp.take_along_axis(cand_tok, pick, axis=1)
        c_mask_n = jnp.take_along_axis(cand_m, pick, axis=1)
        c_cidx_n = jnp.take_along_axis(cand_c, pick, axis=1)
        c_node_n = jnp.take_along_axis(cand_n, pick, axis=1)

        tokens_n = _gather_beams(tokens, run_parent, b, k)
        tokens_n = tokens_n.reshape(b, k, max_len).at[:, :, cur]\
            .set(run_tok).reshape(b * k, max_len)
        mask_buf_n = mask_buf.at[:, cur].set(1)
        anc_n = jnp.take_along_axis(anc, run_parent[:, :, None], axis=1)
        anc_n = anc_n.at[:, :, cur].set(own_row)

        # one-way early-stop heuristic (shared with _beam_impl)
        best_possible = new_run_scores[:, :1] / (gen_len ** lp_pow)
        worst_fin = jnp.where(fin_flags_n,
                              jnp.min(fin_scores_n, axis=1, keepdims=True),
                              NEG)
        heur_unsat_n = heur_unsat & jnp.any(best_possible > worst_fin,
                                            axis=-1)

        state = (tokens_n, mask_buf_n, cache, new_run_scores, fin_seq_n,
                 fin_scores_n, fin_flags_n, heur_unsat_n, anc_n,
                 c_mask_n, c_cidx_n, c_node_n)
        return state, hits

    def _logp(logits_2d):
        return jax.nn.log_softmax(logits_2d.astype(jnp.float32), axis=-1)

    # ---- position L from the shared prefill logits ------------------------
    pb = dc.prefix_block
    seg_ends = ([M] if pb <= 0 else
                sorted(set(list(range(L + 1 + pb, M, pb)) + [M])))
    logp0 = process_logits(_logp(next_logits), dc, st["tokens"], st["mask"],
                           jnp.asarray(L, jnp.int32), L)
    logp0 = jnp.broadcast_to(logp0[:, None, :], (b, k, vocab))
    state = (tokens, mask_buf, cache, run_scores, fin_seq, fin_scores,
             fin_flags, heur_unsat, anc, c_mask, c_cidx, c_node)
    state, hits = step_update(state, logp0, jnp.asarray(L, jnp.int32),
                              None if pb <= 0 else seg_ends[0])

    def make_cond(seg_end):
        def cond(carry):
            state, hits, cur = carry
            fin_flags, heur_unsat = state[6], state[7]
            alive = (jnp.any(heur_unsat)
                     & ~(jnp.all(fin_flags) & early)
                     & ~jnp.all(hits)
                     & (cur < M))
            return alive if seg_end is None else alive & (cur < seg_end)
        return cond

    def make_body(lim):
        def body(carry):
            state, _hits, cur = carry
            from .generation import process_logits
            tokens, mask_buf, cache = state[0], state[1], state[2]
            prev_tok = lax.dynamic_slice_in_dim(tokens, cur - 1, 1, axis=1)
            logits, cache = flamingo.apply_lm(
                params, config, prev_tok, policy=policy,
                layer_hook=decode_hook, attention_mask=mask_buf,
                position_ids=pos_next + (cur - 1 - L),
                cache=cache, cache_index=cur - 1, kv_limit=lim,
                beam_anc=state[8])
            logp = process_logits(_logp(logits[:, -1]), dc, tokens,
                                  mask_buf, cur, L)
            state = (tokens, mask_buf, cache) + state[3:]
            state, hits = step_update(state, logp.reshape(b, k, vocab), cur,
                                      lim)
            return state, hits, cur + 1
        return body

    carry = (state, hits, jnp.asarray(L + 1, jnp.int32))
    if pb <= 0:
        carry = lax.while_loop(make_cond(None), make_body(None), carry)
    else:
        for seg_end in seg_ends:
            carry = lax.while_loop(make_cond(seg_end),
                                   make_body(min(seg_end, max_len)), carry)
    state, hits, cur = carry
    (tokens, _mb, _cache, run_scores, fin_seq, fin_scores, fin_flags,
     _heur, _anc, c_mask, _cc, _cn) = state

    # ---- finalize: running beams enter the pool iff complete; if fewer
    # than num_return_sequences collected, highest-scoring incomplete
    # beams fill the remainder (HF finalize fallback) -----------------------
    gen_len = (cur - L).astype(jnp.float32)
    run_pen = run_scores / (gen_len ** lp_pow)
    run_complete = c_mask == tab.full_mask
    rows = tokens.reshape(b, k, max_len)

    merged_seq = jnp.concatenate([fin_seq, rows], axis=1)       # (b, 2k, .)
    merged_fl = jnp.concatenate([fin_flags, run_complete], axis=1)
    main_sc = jnp.concatenate(
        [fin_scores, jnp.where(run_complete, run_pen, NEG)], axis=1)
    n_valid = jnp.sum((main_sc > NEG / 2).astype(jnp.int32), axis=1,
                      keepdims=True)
    nrs = max(dc.num_return_sequences, 1)
    # fallback entries: incomplete running beams, ranked after every genuine
    # hypothesis via a large offset (engaged only when the pool is short)
    fb_sc = jnp.where(run_complete, NEG, run_pen - 1.0e7)
    fb_sc = jnp.where(n_valid >= nrs, NEG,
                      jnp.concatenate([jnp.full((b, k), NEG), fb_sc], 1))
    merged_sc = jnp.maximum(main_sc, fb_sc)
    best_sc, best_idx = lax.top_k(merged_sc, k)
    out_seq = jnp.take_along_axis(merged_seq, best_idx[:, :, None], axis=1)
    out_fl = jnp.take_along_axis(merged_fl, best_idx, axis=1)
    # report true (unoffset) scores for fallback picks
    true_sc = jnp.concatenate([fin_scores, run_pen], axis=1)
    best_true = jnp.take_along_axis(true_sc, best_idx, axis=1)
    best_sc = jnp.where(best_sc <= NEG / 2, best_sc, best_true)
    return out_seq, best_sc, out_fl


def constrained_beam_generate(params, config, dc, policy, input_ids,
                              media_locations, attention_mask,
                              visual_features, pixel_values=None):
    """HF ``generate(force_words_ids=...)`` equivalent. Returns token ids
    shaped like ``beam_generate`` (top hypothesis per row, or top
    ``num_return_sequences`` interleaved); with ``dc.return_scores`` also
    the length-penalized sequence scores."""
    spec = normalize_force_words(dc.force_words_ids)
    fin_seq, scores, _fl = _constrained_beam_impl(
        params, config, dc, policy, spec, input_ids, media_locations,
        attention_mask, visual_features, pixel_values)
    nrs = dc.num_return_sequences
    if nrs > 1:
        b, _k, max_len = fin_seq.shape
        seqs = fin_seq[:, :nrs].reshape(b * nrs, max_len)
        if dc.return_scores:
            return seqs, scores[:, :nrs].reshape(b * nrs)
        return seqs
    if dc.return_scores:
        return fin_seq[:, 0], scores[:, 0]
    return fin_seq[:, 0]

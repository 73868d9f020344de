"""Contrastive search (degeneration-penalty decoding).

The reference inherits contrastive search from HF ``generate``
(``penalty_alpha`` + ``top_k``; /root/reference/flamingo_mini/
modeling_flamingo.py:464-548 passes kwargs straight through) — the
strategy of "A Contrastive Framework for Neural Text Generation" (Su et
al., 2022): at each step take the ``k`` most probable candidates, penalize
each by its maximum cosine similarity to every previous context token's
final-layer hidden state, and emit

    score = (1 - alpha) * p(candidate) - alpha * max_t cos(h_cand, h_t)

NOTE on oracle coverage: transformers >= 4.50 removed contrastive search
from core (this environment ships 4.57), so unlike the rest of the decode
surface there is no importable HF oracle to test against; the
implementation follows the published algorithm / the 4.2x-era HF loop
(candidate probabilities from the processed logits, penalty over ALL
context positions including pads, next-step logits reused from the
candidate forward) and is covered by invariant tests
(tests/test_contrastive.py): alpha=0 == greedy for k>=1, determinism,
penalty actually changing the argmax, eos/pad layout.

TPU design: the KV cache is tiled to ``b*k`` rows once at prefill and
NEVER gathered — the same ancestor-indexed machinery as lazy beam search
(ops/attention.attend_beam_lazy) carries a (b, max_len) "which candidate
row owns position t" table; each step's k candidates write position
``cur`` into their own row, attention reads history through the shared
ancestry, and selection just records the winner's row index. The per-step
hidden-state history (b, max_len, D) lives in a preallocated buffer.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .configuration_flamingo import FlamingoConfig
from .generation import DecodeConfig, _prefill, process_logits
from .models import flamingo
from .ops.layers import Policy


@partial(jax.jit, static_argnames=("config", "dc", "policy"))
def _contrastive_impl(params, config: FlamingoConfig, dc: DecodeConfig,
                      policy: Policy, input_ids, media_locations,
                      attention_mask, visual_features, pixel_values=None):
    if pixel_values is not None:
        visual_features = flamingo.encode_resample_visuals(
            params, config, policy.cast(pixel_values), policy=policy)

    from .beam_search import _tile_beams

    b, L = input_ids.shape
    k = dc.top_k
    alpha = dc.penalty_alpha
    max_len = dc.max_length
    M = max_len if dc.max_new_tokens is None else \
        min(max_len, L + dc.max_new_tokens)

    next_logits, xattn_kv, st = _prefill(
        params, config, dc, policy, input_ids, media_locations,
        attention_mask, visual_features, with_hidden=True)

    D = st["prompt_hidden"].shape[-1]
    hist = jnp.zeros((b, max_len, D), policy.dtype)
    hist = lax.dynamic_update_slice(
        hist, st["prompt_hidden"].astype(policy.dtype), (0, 0, 0))

    # candidate rows: cache/xattn/mask tiled to b*k ONCE; never gathered
    cache = jax.tree_util.tree_map(lambda x: _tile_beams(x, k), st["cache"])
    xattn_kv = jax.tree_util.tree_map(lambda x: _tile_beams(x, k), xattn_kv)
    maskk = _tile_beams(st["mask"], k)                   # (b*k, max_len)
    pos_next = _tile_beams(st["pos_next"], k)            # (b*k, 1)
    media_count = _tile_beams(st["media_count"], k)
    decode_hook = flamingo.make_layer_hook(
        params, config, xattn_kv, media_count, policy=policy)

    tokens = st["tokens"]
    mask1 = st["mask"]
    anc = jnp.zeros((b, max_len), jnp.int32)     # all rows identical so far
    own_row = jnp.arange(k, dtype=jnp.int32)[None, :]
    eos = dc.eos_token_id
    pad = dc.pad_token_id

    # first candidates from the prefill logits (HF: processors -> softmax
    # -> top-k; candidate prob is the PROCESSED probability)
    lp0 = process_logits(next_logits.astype(jnp.float32), dc, tokens, mask1,
                         jnp.asarray(L, jnp.int32), L)
    cand_p, cand_tok = lax.top_k(jax.nn.softmax(lp0, axis=-1), k)
    finished = jnp.zeros((b,), bool)

    def cond(carry):
        cur = carry[-1]
        finished = carry[-2]
        return (cur < M) & ~jnp.all(finished)

    def body(carry):
        (tokens, mask1, maskk, cache, hist, anc, cand_tok, cand_p,
         finished, cur) = carry
        # ---- forward all k candidates at position cur -------------------
        rows_tok = cand_tok.astype(jnp.int32).reshape(b * k, 1)
        maskk_cur = maskk.at[:, cur].set(1)
        anc_full = jnp.broadcast_to(anc[:, None, :], (b, k, max_len))
        anc_full = anc_full.at[:, :, cur].set(own_row)
        logits, cache, hidden = flamingo.apply_lm(
            params, config, rows_tok, policy=policy, layer_hook=decode_hook,
            attention_mask=maskk_cur, position_ids=pos_next + (cur - L),
            cache=cache, cache_index=cur, beam_anc=anc_full,
            with_hidden=True)
        h_cand = hidden[:, -1].reshape(b, k, D)

        # ---- degeneration penalty: max cosine sim vs ALL context states
        # (HF computes it over every previous position, pads included) ----
        hn = h_cand.astype(jnp.float32)
        hn = hn / jnp.maximum(jnp.linalg.norm(hn, axis=-1, keepdims=True),
                              1e-12)
        Hn = hist.astype(jnp.float32)
        Hn = Hn / jnp.maximum(jnp.linalg.norm(Hn, axis=-1, keepdims=True),
                              1e-12)
        cos = jnp.einsum("bkd,btd->bkt", hn, Hn)
        seen = jnp.arange(max_len, dtype=jnp.int32)[None, None, :] < cur
        pen = jnp.max(jnp.where(seen, cos, -1.0), axis=-1)     # (b, k)

        score = (1.0 - alpha) * cand_p - alpha * pen
        c = jnp.argmax(score, axis=-1).astype(jnp.int32)       # (b,)

        tok_sel = jnp.take_along_axis(cand_tok, c[:, None], axis=1)[:, 0]
        tok_sel = jnp.where(finished, jnp.asarray(pad, jnp.int32),
                            tok_sel.astype(jnp.int32))
        tokens = tokens.at[:, cur].set(tok_sel)
        mask1 = mask1.at[:, cur].set(1)
        hist = hist.at[:, cur].set(
            jnp.take_along_axis(h_cand, c[:, None, None], axis=1)[:, 0]
            .astype(policy.dtype))
        anc = anc.at[:, cur].set(c)
        finished = finished | (tok_sel == eos)

        # ---- next-step candidates from the WINNER's logits (already
        # computed by the candidate forward; no extra model call) ---------
        nl = logits[:, -1].reshape(b, k, -1)
        sel_logits = jnp.take_along_axis(
            nl, c[:, None, None], axis=1)[:, 0].astype(jnp.float32)
        lp = process_logits(sel_logits, dc, tokens, mask1, cur + 1, L)
        cand_p, cand_tok = lax.top_k(jax.nn.softmax(lp, axis=-1), k)
        return (tokens, mask1, maskk_cur, cache, hist, anc, cand_tok,
                cand_p, finished, cur + 1)

    carry = (tokens, mask1, maskk, cache, hist, anc, cand_tok, cand_p,
             finished, jnp.asarray(L, jnp.int32))
    carry = lax.while_loop(cond, body, carry)
    return carry[0]


def contrastive_generate(params, config, dc, policy, input_ids,
                         media_locations, attention_mask, visual_features,
                         pixel_values=None):
    """HF-layout output: prompt + tokens (EOS in-sequence) + pads."""
    return _contrastive_impl(params, config, dc, policy, input_ids,
                             media_locations, attention_mask,
                             visual_features, pixel_values)

"""jit-compiled batched text generation with KV caching.

Replaces the reference's use of HF ``generate()`` (the external Python decode
loop; /root/reference/flamingo_mini/modeling_flamingo.py:464-605) with a
fully-compiled, static-shape decode:

* prefill: one forward over the (padded) prompt fills the preallocated LM KV
  cache and produces the first next-token logits. The xattn K/V are computed
  once here and stay constant for all steps (two-part cache, reference
  modeling_flamingo.py:282-285).
* decode: a ``lax.while_loop`` steps one token at a time, with early exit
  when every row has emitted EOS (the reference's ``early_stopping=True``).
* ``text_time`` for generated tokens is the total media count of the prompt —
  exactly what the reference's cached-path slicing computes
  (gated_cross_attention.py:97-104: cumsum over the unchanged prompt
  media_locations, sliced to the last column).

Batching convention: prompts must be UNPADDED-equal-length or LEFT-padded
(pads at the start, attention_mask 0 there). Left padding is the correct
decoder-only convention and keeps every row's write index identical — which
is what makes the loop a static-shape TPU program.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .configuration_flamingo import FlamingoConfig, GPT2Arch
from .models import flamingo, gpt2, opt
from .ops.layers import Policy

Params = Dict[str, Any]


@dataclass(frozen=True)
class DecodeConfig:
    """Static decode hyperparameters (hashable -> usable as jit static arg)."""

    max_length: int = 150
    # HF max_new_tokens: stop after this many generated tokens even if the
    # (static) buffers extend to max_length; None = fill to max_length
    max_new_tokens: Optional[int] = None
    eos_token_id: int = 50256
    pad_token_id: int = 50256
    do_sample: bool = False
    top_k: int = 0            # 0 = disabled
    top_p: float = 1.0        # 1.0 = disabled
    temperature: float = 1.0
    # further HF sampling warpers (chain order matches
    # GenerationMixin._get_logits_processor; see apply_logit_filters)
    min_p: float = 0.0        # 0.0 = disabled (MinPLogitsWarper)
    typical_p: float = 1.0    # 1.0 = disabled (TypicalLogitsWarper)
    epsilon_cutoff: float = 0.0   # 0.0 = disabled (EpsilonLogitsWarper)
    eta_cutoff: float = 0.0       # 0.0 = disabled (EtaLogitsWarper)
    # contrastive search (HF: penalty_alpha > 0 with top_k > 1 candidates;
    # see contrastive.py)
    penalty_alpha: float = 0.0
    # HF SequenceBiasLogitsProcessor: tuple of ((token ids...), bias) pairs
    # (hashable; FlamingoModel.generate normalizes dicts/lists)
    sequence_bias: Optional[tuple] = None
    # HF ExponentialDecayLengthPenalty: (start_index, decay_factor)
    exponential_decay_length_penalty: Optional[tuple] = None
    repetition_penalty: float = 1.0   # HF RepetitionPenaltyLogitsProcessor
    num_beams: int = 1
    length_penalty: float = 1.0
    early_stopping: bool = True
    min_length: int = 0               # HF MinLengthLogitsProcessor
    min_new_tokens: int = 0           # HF MinNewTokensLengthLogitsProcessor
    no_repeat_ngram_size: int = 0     # HF NoRepeatNGramLogitsProcessor
    # HF NoBadWordsLogitsProcessor: tuple of token-id tuples (hashable so the
    # config stays a valid jit static arg); lists are normalized by
    # FlamingoModel.generate
    bad_words_ids: Optional[tuple] = None
    # HF constrained beam search (generate(force_words_ids=...)): tuple of
    # constraints, each a tuple of alternative phrases (tuples of ids) —
    # phrasal = one alternative, disjunctive = several; normalized from HF's
    # nested lists by FlamingoModel.generate. See constrained_beam.py.
    force_words_ids: Optional[tuple] = None
    num_return_sequences: int = 1     # HF: expand batch (sample) / top-n (beam)
    # HF diverse/group beam search (HammingDiversityLogitsProcessor +
    # BeamSearchScorer(num_beam_groups)): beams split into groups decoded
    # sequentially per step, later groups penalized for reusing tokens the
    # earlier groups just chose
    num_beam_groups: int = 1
    diversity_penalty: float = 0.0
    # HF ForcedBOS/ForcedEOSTokenLogitsProcessor + Suppress processors
    forced_bos_token_id: Optional[int] = None
    forced_eos_token_id: Optional[int] = None
    suppress_tokens: Optional[tuple] = None        # banned at every step
    begin_suppress_tokens: Optional[tuple] = None  # banned at the first step
    # TPU decode-performance knobs (both preserve greedy quality in practice;
    # see BENCH.md): int8 K/V storage halves the per-step cache HBM stream;
    # prefix_block > 0 splits the decode loop into segments that attend only
    # the live cache prefix (rounded up to the block) instead of max_length.
    int8_kv_cache: bool = False
    prefix_block: int = 0
    # Fused int8 lm_head + greedy argmax Pallas kernel (ops/pallas_lmhead):
    # auto-engages on plain-greedy int8 decode paths (identity processor
    # chain, no scores). Token-exact at the measured deployment shapes
    # (+-1 bf16 ulp matmul-association envelope elsewhere — see the kernel
    # module docstring); False forces the XLA lm_head + argmax.
    fused_head: bool = True
    # Flat (b, max_len, d_model) KV cache + Pallas streaming decode attention
    # (ops/pallas_decode.py): the head layout's 64-wide minor dim is
    # physically ~1.6x padded in HBM and the XLA decode fusion streams it at
    # 250-290 GB/s; the flat layout is unpadded and the Pallas kernel
    # streams at the chip's ~700 GB/s (BENCH.md r4). Greedy/sample only —
    # beam/contrastive decode keeps the head layout.
    flat_kv_cache: bool = True
    # Whole-decode-step Pallas megakernel (ops/pallas_megadecode.py): all
    # gated-xattn + GPT-2 layers in ONE launch per token, weights + KV
    # streamed back-to-back. Greedy/sample fast path; requires the flat
    # cache, int8 LM+xattn weights, GPT-2 trunk with n_embd % 128 == 0,
    # bf16 xattn K/V, single device. Falls back (ValueError) otherwise.
    megakernel: bool = False
    # w8a8 tier (requires megakernel): the trunk linears quantize their
    # activations per row (symmetric absmax int8) and run int8 x int8 MXU
    # dots — no per-chunk weight convert, 2x MXU rate. This CHANGES the
    # numerics from weight-only to weight+activation quantization; fidelity
    # is measured in BENCH.md (tools/int8_fidelity.py --w8a8). Attention
    # (KV streams) stays bf16.
    w8a8: bool = False
    # Return sequence scores alongside token ids (HF return_dict_in_generate/
    # output_scores surface): greedy/sample accumulate the chosen token's
    # log-prob under the post-processor (and, when sampling, post-warper)
    # step distribution — HF compute_transition_scores(normalize_logits=True)
    # summed over generated tokens (EOS included, post-EOS pads excluded);
    # beam returns HF sequences_scores (length-penalized pool scores).
    return_scores: bool = False
    # Per-step transition-score arrays (HF output_scores surface, r5): a
    # (b, max_length) f32 buffer holding each generated token's log-prob
    # under the step distribution at its absolute position (prompt slots and
    # post-EOS pads are 0.0) — elementwise what HF
    # compute_transition_scores(normalize_logits=True) reports per step
    # (the reference reaches it via HF generate(output_scores=True),
    # /root/reference/flamingo_mini/modeling_flamingo.py:464-548).
    # Greedy/sample only; beams keep the summed sequences_scores surface.
    output_scores: bool = False
    # Beam-search cache reorder strategy. "gather" physically permutes the KV
    # cache by parent index every step (full-cache HBM read+write);
    # "lazy" (ancestor-indexed) leaves cache rows in place and carries a tiny
    # (b, k, max_len) ancestry table folded into the attention read as a mask
    # — same HF semantics, no per-step cache write-back (BENCH.md beam-step
    # decomposition: the gather was 12.6 of 17.7 ms/step at beam-3 bs=32).
    beam_reorder: str = "lazy"

    def __post_init__(self):
        # the decode loop always emits at least one token (the prefill pick
        # is written unconditionally), so max_new_tokens=0 cannot be honored
        # — reject it instead of silently generating one (advisor r2)
        if self.max_new_tokens is not None and self.max_new_tokens < 1:
            raise ValueError(
                f"max_new_tokens must be >= 1, got {self.max_new_tokens}")
        if self.max_length < 2:
            raise ValueError(f"max_length must be >= 2, got {self.max_length}")
        if self.output_scores and (self.num_beams > 1
                                   or self.penalty_alpha > 0.0
                                   or self.force_words_ids is not None):
            raise ValueError(
                "output_scores (per-step arrays) is greedy/sample only; "
                "beam variants return the summed sequences_scores surface "
                "(return_scores=True)")
        if self.num_beam_groups > 1:
            if self.num_beams % self.num_beam_groups != 0:
                raise ValueError(
                    f"num_beams ({self.num_beams}) must be divisible by "
                    f"num_beam_groups ({self.num_beam_groups}) (HF semantics)")
            if self.do_sample:
                raise ValueError(
                    "diverse/group beam search is deterministic; "
                    "do_sample=True is not supported (HF semantics)")
        if self.diversity_penalty != 0.0 and self.num_beam_groups <= 1:
            raise ValueError(
                "diversity_penalty requires num_beam_groups > 1 (HF semantics)")
        if self.exponential_decay_length_penalty is not None:
            # factor <= 0 would turn the log/exp EOS boost into NaN logits
            # instead of an error (advisor r3)
            _start, _factor = self.exponential_decay_length_penalty
            if not _factor > 0.0:
                raise ValueError(
                    "exponential_decay_length_penalty decay factor must be "
                    f"> 0, got {_factor}")
        if self.w8a8 and not self.megakernel:
            raise ValueError("w8a8 (int8 activation quantization) is a "
                             "megakernel tier — set megakernel=True")
        if self.beam_reorder not in ("gather", "lazy"):
            raise ValueError(
                f"beam_reorder must be 'gather' or 'lazy', "
                f"got {self.beam_reorder!r}")
        if self.force_words_ids is not None:
            # HF semantics: constrained decoding is a beam-only, sampling-
            # free, group-free generation mode
            if self.num_beams <= 1:
                raise ValueError(
                    "force_words_ids (constrained beam search) requires "
                    "num_beams > 1 (HF semantics)")
            if self.do_sample:
                raise ValueError(
                    "force_words_ids is incompatible with do_sample=True "
                    "(HF semantics)")
            if self.num_beam_groups > 1:
                raise ValueError(
                    "force_words_ids is incompatible with "
                    "num_beam_groups > 1 (HF semantics)")
        if self.penalty_alpha > 0.0:
            if self.top_k <= 1:
                raise ValueError(
                    "contrastive search (penalty_alpha > 0) needs top_k > 1 "
                    "candidate tokens (HF semantics)")
            if self.do_sample or self.num_beams > 1:
                raise ValueError(
                    "contrastive search is a deterministic single-beam "
                    "strategy; do_sample/num_beams are incompatible "
                    "(HF semantics)")


def _init_lm_cache(config: FlamingoConfig, batch: int, max_len: int, dtype,
                   int8: bool = False, flat: bool = False):
    arch = config.lm_arch
    if isinstance(arch, GPT2Arch):
        return gpt2.init_cache(arch, batch, max_len, dtype, int8=int8,
                               flat=flat)
    return opt.init_cache(arch, batch, max_len, dtype, int8=int8, flat=flat)


def _prefill(params, config: FlamingoConfig, dc: DecodeConfig, policy: Policy,
             input_ids, media_locations, attention_mask, visual_features,
             with_hidden: bool = False, flat: bool = False):
    """Run the prompt through the model, filling the LM cache.

    Returns (next_logits, lm_cache, xattn_kv, state dict of per-row values);
    with ``with_hidden`` the state dict gains "prompt_hidden" (b, L, D) —
    the final-LN trunk states contrastive search's penalty runs against.
    """
    b, L = input_ids.shape
    max_len = dc.max_length

    # full-length buffers
    mask_buf = jnp.zeros((b, max_len), jnp.int32)
    mask_buf = lax.dynamic_update_slice(mask_buf, attention_mask.astype(jnp.int32), (0, 0))
    tokens = jnp.full((b, max_len), dc.pad_token_id, jnp.int32)
    tokens = lax.dynamic_update_slice(tokens, input_ids.astype(jnp.int32), (0, 0))

    text_time = jnp.cumsum(media_locations.astype(jnp.int32), axis=-1)
    xattn_kv = flamingo.compute_xattn_kv(params, config,
                                         policy.cast(visual_features), policy=policy)
    if dc.int8_kv_cache:
        # decode re-reads the xattn K/V every step; int8 halves that stream
        from .ops.quant import quantize_kv_pair
        xattn_kv = {idx: quantize_kv_pair(kv) for idx, kv in xattn_kv.items()}
    hook = flamingo.make_layer_hook(params, config, xattn_kv, text_time, policy=policy)

    cache = _init_lm_cache(config, b, max_len, policy.dtype,
                           int8=dc.int8_kv_cache, flat=flat)
    # position ids from the attention mask (pads don't advance positions),
    # matching HF generate's prepare for decoder-only models
    pos = jnp.clip(jnp.cumsum(attention_mask.astype(jnp.int32), axis=-1) - 1, 0)
    out = flamingo.apply_lm(
        params, config, input_ids, policy=policy, layer_hook=hook,
        attention_mask=mask_buf, position_ids=pos,
        cache=cache, cache_index=jnp.asarray(0, jnp.int32),
        with_hidden=with_hidden)
    logits, cache = out[0], out[1]

    next_logits = logits[:, -1]  # left-padded: last slot is the newest token
    state = {
        "tokens": tokens,
        "mask": mask_buf,
        "cache": cache,
        "media_count": text_time[:, -1:],                      # (b, 1)
        "pos_next": attention_mask.astype(jnp.int32).sum(-1, keepdims=True),  # (b, 1)
    }
    if with_hidden:
        state["prompt_hidden"] = out[2]
    return next_logits, xattn_kv, state


def apply_logit_filters(logits: jnp.ndarray, *, temperature: float = 1.0,
                        top_k: int = 0, top_p: float = 1.0,
                        min_p: float = 0.0, typical_p: float = 1.0,
                        epsilon_cutoff: float = 0.0,
                        eta_cutoff: float = 0.0) -> jnp.ndarray:
    """Sampling warper chain with exact HF semantics and HF's chain order
    (GenerationMixin._get_logits_processor): Temperature -> TopK -> TopP ->
    MinP -> Typical -> Epsilon -> Eta; all with min_tokens_to_keep=1.

    Top-p (HF): sort ascending, remove tokens whose ascending cumulative
    softmax <= 1 - top_p, always keeping at least the best token.
    """
    logits = logits.astype(jnp.float32)
    neg = jnp.finfo(jnp.float32).min
    if temperature != 1.0:
        logits = logits / temperature
    if top_k > 0:
        top_k = min(top_k, logits.shape[-1])  # HF clamps to vocab size
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < kth, neg, logits)
    if top_p < 1.0:
        sorted_idx = jnp.argsort(logits, axis=-1)               # ascending
        sorted_logits = jnp.take_along_axis(logits, sorted_idx, axis=-1)
        cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        remove_sorted = cum <= (1.0 - top_p)
        remove_sorted = remove_sorted.at[:, -1].set(False)      # keep >= 1
        inv = jnp.argsort(sorted_idx, axis=-1)
        remove = jnp.take_along_axis(remove_sorted, inv, axis=-1)
        logits = jnp.where(remove, neg, logits)
    if min_p > 0.0:
        # HF MinPLogitsWarper: threshold scales with the top probability
        probs = jax.nn.softmax(logits, axis=-1)
        thresh = min_p * jnp.max(probs, axis=-1, keepdims=True)
        remove = probs < thresh
        best = jnp.argmax(logits, axis=-1)                      # keep >= 1
        remove = remove.at[jnp.arange(logits.shape[0]), best].set(False)
        logits = jnp.where(remove, neg, logits)
    if typical_p < 1.0:
        # HF TypicalLogitsWarper: keep the smallest "locally typical" set —
        # tokens sorted by |(-log p) - entropy| ascending — whose cumulative
        # probability reaches the mass
        normalized = jax.nn.log_softmax(logits, axis=-1)
        p = jnp.exp(normalized)
        plogp = jnp.where(p > 0, normalized * p, 0.0)           # nansum
        ent = -jnp.sum(plogp, axis=-1, keepdims=True)
        shifted = jnp.abs((-normalized) - ent)
        order = jnp.argsort(shifted, axis=-1)                   # ascending
        sorted_shifted = jnp.take_along_axis(shifted, order, axis=-1)
        sorted_logits = jnp.take_along_axis(logits, order, axis=-1)
        cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        last_ind = jnp.minimum(jnp.sum(cum < typical_p, axis=-1),
                               logits.shape[-1] - 1)
        cutoff = jnp.take_along_axis(sorted_shifted, last_ind[:, None],
                                     axis=-1)
        remove_sorted = sorted_shifted > cutoff
        remove_sorted = remove_sorted.at[:, 0].set(False)       # keep >= 1
        inv = jnp.argsort(order, axis=-1)
        remove = jnp.take_along_axis(remove_sorted, inv, axis=-1)
        logits = jnp.where(remove, neg, logits)
    if epsilon_cutoff > 0.0:
        # HF EpsilonLogitsWarper: drop tokens with probability < epsilon,
        # always keeping the best token
        probs = jax.nn.softmax(logits, axis=-1)
        remove = (probs < epsilon_cutoff) & \
            (logits < jnp.max(logits, axis=-1, keepdims=True))
        logits = jnp.where(remove, neg, logits)
    if eta_cutoff > 0.0:
        # HF EtaLogitsWarper: entropy-adaptive cutoff
        # eta = min(epsilon, sqrt(epsilon) * exp(-H))
        probs = jax.nn.softmax(logits, axis=-1)
        normalized = jax.nn.log_softmax(logits, axis=-1)
        plogp = jnp.where(probs > 0, normalized * probs, 0.0)
        ent = -jnp.sum(plogp, axis=-1, keepdims=True)
        eta = jnp.minimum(eta_cutoff,
                          jnp.sqrt(jnp.float32(eta_cutoff)) * jnp.exp(-ent))
        remove = (probs < eta) & \
            (logits < jnp.max(logits, axis=-1, keepdims=True))
        logits = jnp.where(remove, neg, logits)
    return logits


def _repetition_penalty(logits, tokens, mask, penalty: float):
    """HF RepetitionPenaltyLogitsProcessor: for every token already present
    in the (real) sequence, divide positive logits by ``penalty`` and
    multiply negative ones by it."""
    b, vocab = logits.shape
    seen = jnp.zeros((b, vocab), bool)
    rows = jnp.arange(b)[:, None]
    seen = seen.at[rows, tokens].max(mask.astype(bool))
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def _ban_eos_while_short(logits, dc: DecodeConfig, idx, prompt_len: int):
    """HF Min(NewTokens)LengthLogitsProcessor: EOS is -inf while the sequence
    so far (length ``idx``, prompt included — HF counts pads too) is shorter
    than ``min_length``, or fewer than ``min_new_tokens`` have been generated."""
    neg = jnp.finfo(jnp.float32).min
    too_short = (idx < dc.min_length) | ((idx - prompt_len) < dc.min_new_tokens)
    eos_col = jnp.arange(logits.shape[-1]) == dc.eos_token_id
    return jnp.where(too_short & eos_col[None, :], neg, logits)


def _no_repeat_ngram(logits, tokens, idx, n: int):
    """HF NoRepeatNGramLogitsProcessor: ban every token that would complete
    an n-gram already present in the row. Operates on the raw token buffer
    (prompt pads included), exactly like HF's view of ``input_ids``; slots at
    or beyond ``idx`` (the sequence length so far) are excluded."""
    b, max_len = tokens.shape
    vocab = logits.shape[-1]
    neg = jnp.finfo(jnp.float32).min
    rows = jnp.arange(b)[:, None]
    if n == 1:
        pos_valid = jnp.arange(max_len)[None, :] < idx
        seen = jnp.zeros((b, vocab), bool).at[rows, tokens].max(pos_valid)
        return jnp.where(seen, neg, logits)
    # last n-1 tokens of each row (dynamic_slice clamps a negative start, but
    # then no window passes the j <= idx-n validity test anyway)
    suffix = lax.dynamic_slice(tokens, (jnp.asarray(0, idx.dtype),
                                        idx - (n - 1)), (b, n - 1))
    m = max_len - n + 1
    windows = jnp.stack(
        [lax.slice_in_dim(tokens, i, i + m, axis=1) for i in range(n - 1)], -1)
    next_tok = lax.slice_in_dim(tokens, n - 1, n - 1 + m, axis=1)   # (b, m)
    match = jnp.all(windows == suffix[:, None, :], axis=-1)
    match = match & (jnp.arange(m)[None, :] <= idx - n)
    banned = jnp.zeros((b, vocab), bool).at[rows, next_tok].max(match)
    return jnp.where(banned, neg, logits)


def _sequence_bias(logits, tokens, idx, seq_bias):
    """HF SequenceBiasLogitsProcessor: ``seq_bias`` is a static tuple of
    ``((token ids...), bias)`` pairs. Length-1 sequences bias their token
    unconditionally; longer ones bias the final token when the sequence so
    far ends with the prefix AND the whole sequence fits the current length
    (HF skips entries with ``len(seq) > cur_len``)."""
    b, vocab = logits.shape
    bias = jnp.zeros((b, vocab), jnp.float32)
    for w, bv in seq_bias:
        n = len(w)
        if n == 0 or int(w[-1]) >= vocab:
            continue
        last = int(w[-1])
        if n == 1:
            bias = bias.at[:, last].add(jnp.float32(bv))
            continue
        prefix = jnp.asarray(w[:-1], jnp.int32)[None, :]
        suffix = lax.dynamic_slice(
            tokens, (jnp.asarray(0, idx.dtype), idx - (n - 1)), (b, n - 1))
        match = jnp.all(suffix == prefix, axis=-1) & (idx >= n)
        bias = bias.at[:, last].add(jnp.where(match, jnp.float32(bv), 0.0))
    return logits + bias


def _ban_bad_words(logits, tokens, idx, words):
    """HF NoBadWordsLogitsProcessor: a bad word ``w`` (a token-id sequence)
    bans its final token whenever the sequence so far ends with ``w[:-1]``;
    single-token words are banned unconditionally. ``words`` is a static
    tuple of tuples, so the (small) loop unrolls at trace time."""
    b, _ = tokens.shape
    neg = jnp.finfo(jnp.float32).min
    vocab = logits.shape[-1]
    banned = jnp.zeros((b, vocab), bool)
    for w in words:
        n = len(w)
        if n == 0:
            continue
        last = int(w[-1])
        if last >= vocab:
            continue
        if n == 1:
            banned = banned.at[:, last].set(True)
            continue
        prefix = jnp.asarray(w[:-1], jnp.int32)[None, :]        # (1, n-1)
        suffix = lax.dynamic_slice(
            tokens, (jnp.asarray(0, idx.dtype), idx - (n - 1)), (b, n - 1))
        # HF (SequenceBias base class) skips words longer than the current
        # length — idx >= n, not the n - 1 the prefix match alone needs
        match = jnp.all(suffix == prefix, axis=-1) & (idx >= n)
        banned = banned.at[:, last].max(match)
    return jnp.where(banned, neg, logits)


def _force_token(logits, token_id: int, when):
    """HF Forced{BOS,EOS}TokenLogitsProcessor: when the condition holds, every
    logit is -inf except the forced token, which becomes 0."""
    neg = jnp.finfo(jnp.float32).min
    col = jnp.arange(logits.shape[-1]) == token_id
    forced = jnp.where(col[None, :], jnp.float32(0.0), neg)
    return jnp.where(when, forced, logits)


def _suppress(logits, ids, when=True):
    """HF SuppressTokens(AtBegin)LogitsProcessor: the listed ids are -inf
    (always, or only when the condition holds)."""
    neg = jnp.finfo(jnp.float32).min
    banned = jnp.zeros((logits.shape[-1],), bool)
    banned = banned.at[jnp.asarray(ids, jnp.int32)].set(True)
    return jnp.where(banned[None, :] & when, neg, logits)


def process_logits(logits, dc: DecodeConfig, tokens, mask, idx,
                   prompt_len: int):
    """The HF logits-processor chain in HF's order (sequence-bias ->
    repetition penalty -> no-repeat-ngram -> bad-words -> min-length ->
    forced-bos -> forced-eos -> exponential-decay -> suppress ->
    begin-suppress; transformers generation/utils.py _get_logits_processor),
    applied to (b, V) next-token logits. ``idx`` = length of the sequence so
    far = the position being filled."""
    logits = logits.astype(jnp.float32)
    if dc.sequence_bias:
        logits = _sequence_bias(logits, tokens, idx, dc.sequence_bias)
    if dc.repetition_penalty != 1.0:
        logits = _repetition_penalty(logits, tokens, mask,
                                     dc.repetition_penalty)
    if dc.no_repeat_ngram_size > 0:
        logits = _no_repeat_ngram(logits, tokens, idx,
                                  dc.no_repeat_ngram_size)
    if dc.bad_words_ids:
        logits = _ban_bad_words(logits, tokens, idx, dc.bad_words_ids)
    if dc.min_length > 0 or dc.min_new_tokens > 0:
        logits = _ban_eos_while_short(logits, dc, idx, prompt_len)
    if dc.forced_bos_token_id is not None:
        # HF semantics: forces the token generated at sequence length 1 —
        # only ever triggers with a single-token prompt on decoder-only LMs
        logits = _force_token(logits, dc.forced_bos_token_id, idx == 1)
    if dc.forced_eos_token_id is not None:
        M = dc.max_length if dc.max_new_tokens is None else \
            min(dc.max_length, prompt_len + dc.max_new_tokens)
        logits = _force_token(logits, dc.forced_eos_token_id, idx == M - 1)
    if dc.exponential_decay_length_penalty is not None:
        # HF ExponentialDecayLengthPenalty: past regulation_start, the EOS
        # logit gains |logit| * (factor^(len - start) - 1) per step
        start, factor = dc.exponential_decay_length_penalty
        reg_start = start + prompt_len
        eos_logit = logits[:, dc.eos_token_id]
        steps_past = (idx - reg_start).astype(jnp.float32)
        pen = jnp.abs(eos_logit) * (
            jnp.exp(jnp.log(jnp.float32(factor)) * steps_past) - 1.0)
        logits = logits.at[:, dc.eos_token_id].add(
            jnp.where(idx > reg_start, pen, 0.0))
    if dc.suppress_tokens:
        logits = _suppress(logits, dc.suppress_tokens)
    if dc.begin_suppress_tokens:
        begin = prompt_len if (prompt_len > 1
                               or dc.forced_bos_token_id is None) else \
            prompt_len + 1
        logits = _suppress(logits, dc.begin_suppress_tokens, idx == begin)
    return logits


def _logits_chain_is_identity(dc: DecodeConfig) -> bool:
    """True when process_logits is a no-op for every decode step (all static
    processor knobs at their HF defaults) — the plain-greedy fast path."""
    return (not dc.sequence_bias and dc.repetition_penalty == 1.0
            and dc.no_repeat_ngram_size == 0 and not dc.bad_words_ids
            and dc.min_length == 0 and dc.min_new_tokens == 0
            and dc.forced_bos_token_id is None
            and dc.forced_eos_token_id is None
            and dc.exponential_decay_length_penalty is None
            and not dc.suppress_tokens and not dc.begin_suppress_tokens)


def _select_token(logits, dc: DecodeConfig, key):
    """Greedy or top-k/top-p/temperature sampling over (b, V) logits.

    With ``dc.return_scores`` also returns the chosen token's log-prob under
    the step distribution (post-warpers when sampling) — the per-step value
    HF ``compute_transition_scores(normalize_logits=True)`` reports."""
    logits = logits.astype(jnp.float32)
    if dc.do_sample:
        logits = apply_logit_filters(logits, temperature=dc.temperature,
                                     top_k=dc.top_k, top_p=dc.top_p,
                                     min_p=dc.min_p, typical_p=dc.typical_p,
                                     epsilon_cutoff=dc.epsilon_cutoff,
                                     eta_cutoff=dc.eta_cutoff)
        tok = jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
    else:
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if not (dc.return_scores or dc.output_scores):
        return tok, None
    lp = jax.nn.log_softmax(logits, axis=-1)
    return tok, jnp.take_along_axis(lp, tok[:, None], axis=1)[:, 0]


@partial(jax.jit, static_argnames=("config", "dc", "policy"))
def _generate_impl(params, config: FlamingoConfig, dc: DecodeConfig,
                   policy: Policy, input_ids, media_locations, attention_mask,
                   visual_features, pixel_values, rng):
    b, L = input_ids.shape
    if pixel_values is not None:
        # vision encode + resample INSIDE the jitted program — one fused
        # device program instead of hundreds of eager dispatches
        visual_features = flamingo.encode_resample_visuals(
            params, config, policy.cast(pixel_values), policy=policy)
    next_logits, xattn_kv, st = _prefill(
        params, config, dc, policy, input_ids, media_locations,
        attention_mask, visual_features,
        flat=(dc.flat_kv_cache or dc.megakernel) and not dc.int8_kv_cache)

    hook_decode_time = st["media_count"]  # constant text_time for generated tokens
    decode_hook = flamingo.make_layer_hook(
        params, config, xattn_kv, hook_decode_time, policy=policy)

    # Mosaic DMAs slice the batch dim of the (L, NMNV, b, XI) xattn K/V and
    # the T-major caches on SUBLANES, and bf16 sublane tiling is 2-packed —
    # an odd batch cannot lower ("Slice shape along dimension 2 must be
    # aligned to tiling (2)"). Odd batches (bs=1 latency serving) fall back
    # to the per-layer flat-kernel decode, which handles any batch.
    use_mega = dc.megakernel and b % 2 == 0
    if dc.megakernel:
        from .models import gpt2 as _gpt2
        from .models import opt as _opt
        from .ops import pallas_megadecode as mega
        if not mega.supports_arch(config.lm_arch):
            raise ValueError(
                "megakernel supports GPT-2 and pre-norm OPT trunks with "
                "n_embd % 128 == 0 and Dff % n_embd == 0 only")
        if dc.int8_kv_cache:
            raise ValueError("megakernel needs bf16 KV (int8_kv_cache off)")
    if dc.megakernel and not use_mega:
        from dataclasses import replace as _dc_rep
        dc = _dc_rep(dc, megakernel=False, w8a8=False, flat_kv_cache=True)
    if dc.megakernel:
        packed = mega.pack_decode_weights(params, config)
        n_layer = mega.trunk_dims(config.lm_arch)[2]
        xkf, xvf = mega.pack_xattn_kv_flat(xattn_kv, n_layer)
        st["kc"] = jnp.stack([c["kf"] for c in st["cache"]])
        st["vc"] = jnp.stack([c["vf"] for c in st["cache"]])
        st = {k: v for k, v in st.items() if k != "cache"}
        npad0 = jnp.argmax(st["mask"], axis=-1).astype(jnp.int32)
    # Fused int8 lm_head + greedy argmax (ops/pallas_lmhead): on the
    # plain-greedy path the (B, V) logits are never observed, so the tied
    # head streams its int8 vocab rows through a Pallas kernel and returns
    # the token directly (bitwise-equal argmax semantics; module docstring).
    # Engages on the megakernel AND the per-layer flat-cache decode —
    # dc.flat_kv_cache=True implies no GSPMD mesh (generate() clears it for
    # TP serving; the DP shard_map path runs this whole program per device).
    # Padding the vocab rows to the chunk grid happens once, outside the
    # loop.
    head_fused = None
    # policy gate (advisor r4): the kernel computes its dot in bf16
    # (pallas_lmhead.py casts the hidden row), so under a non-bf16 compute
    # policy it would diverge from the policy-dtype XLA head by more than
    # the documented ±1-ulp bf16 envelope — engage only when the policy is
    # already bf16.
    if (dc.fused_head and (dc.megakernel or dc.flat_kv_cache)
            and not dc.int8_kv_cache
            and not dc.do_sample and not dc.return_scores
            and not dc.output_scores
            and policy.dtype == jnp.bfloat16
            and _logits_chain_is_identity(dc)):
        _hk = ("wte_q" if isinstance(config.lm_arch, GPT2Arch)
               else "embed_tokens_q")
        _hq = params["lm"].get(_hk)
        if _hq is not None:
            from .ops.pallas_lmhead import lm_head_argmax, pad_head_weights
            head_nvalid = min(int(_hq["w8"].shape[0]),
                              config.lm_arch.vocab_size + 1)
            head_fused = pad_head_weights(_hq, 2048)

    next_logits = process_logits(next_logits, dc, st["tokens"], st["mask"],
                                 jnp.asarray(L, jnp.int32), L)
    first_tok, first_lp = _select_token(next_logits, dc,
                                        jax.random.fold_in(rng, L))
    finished0 = first_tok == dc.eos_token_id
    scores0 = first_lp if dc.return_scores else jnp.zeros((b,), jnp.float32)
    # per-step transition log-probs at absolute positions (output_scores);
    # a (b, 1) placeholder keeps the carry structure static when disabled
    if dc.output_scores:
        step_lps0 = jnp.zeros((b, dc.max_length), jnp.float32)
        step_lps0 = step_lps0.at[:, L].set(first_lp)
    else:
        step_lps0 = jnp.zeros((b, 1), jnp.float32)

    def write(st, tok, idx, finished):
        tokens = st["tokens"].at[:, idx].set(jnp.where(
            finished, jnp.asarray(dc.pad_token_id, jnp.int32), tok))
        mask = st["mask"].at[:, idx].set(1)
        return {**st, "tokens": tokens, "mask": mask}

    # the first generated token is always written as-is (HF appends the EOS
    # itself); finished rows emit pad from the NEXT step on
    st = write(st, first_tok, L, jnp.zeros((b,), bool))

    def make_body(kv_limit):
        def body(carry):
            st, cur, finished, tok, rng, scores, step_lps = carry
            if dc.megakernel:
                lm = params["lm"]
                arch = config.lm_arch
                from .ops.layers import layer_norm as _ln
                from .ops.quant import embed_lookup
                if isinstance(arch, GPT2Arch):
                    if "wte_q" in lm:
                        emb = embed_lookup(lm["wte_q"], tok[:, None],
                                           policy.dtype)
                    else:
                        emb = lm["wte"].astype(policy.dtype)[tok[:, None]]
                    x = (emb
                         + lm["wpe"].astype(policy.dtype)[st["pos_next"]])[:, 0]
                else:  # pre-norm OPT (gated by mega.supports_arch)
                    if "embed_tokens_q" in lm:
                        emb = embed_lookup(lm["embed_tokens_q"], tok[:, None],
                                           policy.dtype)
                    else:
                        emb = lm["embed_tokens"].astype(
                            policy.dtype)[tok[:, None]]
                    pos = lm["embed_positions"].astype(
                        policy.dtype)[st["pos_next"] + _opt.POS_OFFSET]
                    x = (emb + pos)[:, 0]
                hidden, kc, vc = mega.decode_step_megakernel(
                    packed, xkf, xvf, st["kc"], st["vc"], x, npad0,
                    st["media_count"], cur, config=config, kv_limit=kv_limit,
                    act_quant=dc.w8a8)
                if isinstance(arch, GPT2Arch):
                    h = _ln(hidden[:, None, :], lm["ln_f"],
                            arch.layer_norm_epsilon)
                else:
                    h = _ln(hidden[:, None, :], lm["final_ln"],
                            arch.layer_norm_epsilon)
                if head_fused is not None:
                    logits = None   # never materialized — argmax in-kernel
                    hrow = h[:, 0]
                elif isinstance(arch, GPT2Arch):
                    logits = _gpt2.lm_head(lm, h, policy)
                else:
                    logits = _opt.lm_head(lm, h, policy)
                st = {**st, "kc": kc, "vc": vc,
                      "pos_next": st["pos_next"] + 1}
            else:
                if head_fused is not None:
                    logits, cache, hid = flamingo.apply_lm(
                        params, config, tok[:, None], policy=policy,
                        layer_hook=decode_hook, attention_mask=st["mask"],
                        position_ids=st["pos_next"],
                        cache=st["cache"], cache_index=cur, kv_limit=kv_limit,
                        with_hidden=True, skip_head=True)
                    hrow = hid[:, -1]
                else:
                    logits, cache = flamingo.apply_lm(
                        params, config, tok[:, None], policy=policy,
                        layer_hook=decode_hook, attention_mask=st["mask"],
                        position_ids=st["pos_next"],
                        cache=st["cache"], cache_index=cur, kv_limit=kv_limit)
                st = {**st, "cache": cache, "pos_next": st["pos_next"] + 1}
            # this step fills position cur+1; sequence-so-far length == cur+1
            if head_fused is not None:
                # plain-greedy fast path: argmax in-kernel over the streamed
                # int8 vocab rows (identity processor chain, no scores)
                nxt = lm_head_argmax(head_fused["w8"], head_fused["scale"],
                                     hrow, n_valid=head_nvalid)
                lp = None
            else:
                step_logits = process_logits(logits[:, -1], dc, st["tokens"],
                                             st["mask"], cur + 1, L)
                # key derived from the absolute position being filled (cur+1)
                # — the prefill pick used fold_in(rng, L) and the loop enters
                # at cur == L, so fold_in(rng, cur) would reuse that key for
                # the second token
                nxt, lp = _select_token(step_logits, dc,
                                        jax.random.fold_in(rng, cur + 1))
            if dc.return_scores:
                # rows already finished emit pads and stop accumulating
                scores = scores + jnp.where(finished, 0.0, lp)
            if dc.output_scores:
                step_lps = step_lps.at[:, cur + 1].set(
                    jnp.where(finished, 0.0, lp))
            new_finished = finished | (nxt == dc.eos_token_id)
            st = write(st, nxt, cur + 1, finished)
            return st, cur + 1, new_finished, nxt, rng, scores, step_lps
        return body

    # effective stop position: HF max_new_tokens bounds the generated count
    # while the static buffers stay max_length-sized (slots beyond M = pads)
    M = dc.max_length if dc.max_new_tokens is None else \
        min(dc.max_length, L + dc.max_new_tokens)

    # Greedy never consumes the rng; carrying the ARGUMENT-origin key
    # through the while_loop forces this platform's executor to treat the
    # whole carry conservatively (argument buffers are pinned immutable for
    # the remote transport), copying per iteration. An internally-created
    # dummy keeps the carry alias-friendly. (Measured: decode floor drops
    # ~2.4 ms/step -> ~0; see BENCH.md ablation notes.)
    carry_rng = rng if dc.do_sample else jax.random.PRNGKey(0)
    carry = (st, jnp.asarray(L, jnp.int32), finished0, first_tok, carry_rng,
             scores0, step_lps0)
    if dc.prefix_block > 0:
        # Live-prefix segmented decode: steps with cur < seg_end only need
        # cache slots [0, seg_end), so each segment's attention statically
        # slices that prefix — average KV traffic drops from max_length to
        # ~(L + generated/2 + block/2) per step. Segment bounds are static;
        # early EOS exits every remaining segment loop immediately.
        seg_ends = sorted(set(
            list(range(L + dc.prefix_block, M - 1, dc.prefix_block))
            + [M - 1]))
        for seg_end in seg_ends:
            def cond_seg(carry, _end=seg_end):
                cur, finished = carry[1], carry[2]
                return (cur < _end) & ~jnp.all(finished)
            carry = lax.while_loop(
                cond_seg, make_body(min(seg_end, dc.max_length)), carry)
    else:
        def cond(carry):
            cur, finished = carry[1], carry[2]
            return (cur < M - 1) & ~jnp.all(finished)
        carry = lax.while_loop(cond, make_body(None), carry)
    st, cur, finished = carry[0], carry[1], carry[2]
    scores, step_lps = carry[5], carry[6]
    return st["tokens"], cur + 1, scores, step_lps


def generate(
    params: Params,
    config: FlamingoConfig,
    input_ids: jnp.ndarray,
    *,
    policy: Policy,
    dc: DecodeConfig,
    media_locations: Optional[jnp.ndarray] = None,
    attention_mask: Optional[jnp.ndarray] = None,
    pixel_values: Optional[jnp.ndarray] = None,
    visual_features: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
    tensor_parallel: bool = False,
) -> jnp.ndarray:
    """Generate token ids (b, max_length); prompt included, pads after EOS.

    ``pixel_values``/``visual_features`` semantics mirror the reference
    forward (modeling_flamingo.py:241-257). Beam search dispatches to
    ``beam_search.beam_generate``.

    ``num_return_sequences > 1`` follows HF semantics: with sampling the
    batch is expanded n-fold (rows i*n..i*n+n-1 are the n samples for prompt
    i); with beams the top-n hypotheses per row are returned; greedy raises.

    ``mesh``: DP-sharded batched serving — inputs are split over the mesh's
    first (data) axis, params replicated; XLA compiles one SPMD decode
    program, so an N-chip mesh serves N× the batch at single-chip latency.

    ``tensor_parallel=True`` (needs a mesh with a 'model' axis of size > 1):
    LM/xattn/resampler weights are Megatron-sharded over the model axis
    (parallel/sharding.param_shardings) instead of replicated, pooling the
    mesh's HBM for a bigger-than-chip LM at serve time; the token embedding
    is zero-padded to a model-axis multiple (pad_vocab_params) so the largest
    tensor shards too, with padded logits masked inside lm_head. XLA inserts
    the per-layer collectives; tokens are identical to the single-device
    program.
    """
    b, L = input_ids.shape
    if attention_mask is None:
        attention_mask = jnp.ones((b, L), jnp.int32)
    if media_locations is None:
        media_locations = jnp.zeros((b, L), jnp.int32)
    if visual_features is None and pixel_values is None:
        visual_features = jnp.zeros(
            (b, 1, config.resampler_num_latents, config.dim_visual),
            policy.dtype)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    nrs = dc.num_return_sequences
    if nrs > 1 and dc.num_beams == 1:
        if not dc.do_sample:
            raise ValueError(
                "num_return_sequences > 1 requires do_sample=True or "
                "num_beams >= num_return_sequences (HF semantics)")
        rep = lambda x: None if x is None else jnp.repeat(x, nrs, axis=0)
        input_ids, media_locations, attention_mask = (
            rep(input_ids), rep(media_locations), rep(attention_mask))
        pixel_values, visual_features = rep(pixel_values), rep(visual_features)

    # Odd-batch megakernel padding (r5, VERDICT #3): bf16 sublane tiling is
    # 2-packed, so the megakernel's batch-dim DMA slices need an even batch
    # — odd batches (bs=1 latency serving) used to fall back to the
    # per-layer kernels. Instead, duplicate the last row (greedy is
    # row-independent and deterministic, so the dead row's trajectory
    # mirrors its source and cannot change the early-EOS exit), run the
    # kernel, and slice the pad off every row-shaped output. Sampling keeps
    # the fallback: a padded batch reshapes the categorical gumbel draw and
    # would change every row's tokens for a given rng.
    mega_pad = 0
    if (dc.megakernel and mesh is None and not dc.do_sample
            and input_ids.shape[0] % 2 == 1):
        mega_pad = 1
        padrow = lambda x: (None if x is None
                            else jnp.concatenate([x, x[-1:]], axis=0))
        input_ids, media_locations, attention_mask = (
            padrow(input_ids), padrow(media_locations),
            padrow(attention_mask))
        pixel_values, visual_features = (padrow(pixel_values),
                                         padrow(visual_features))

    dp_shard_fast = False
    if mesh is not None and len(mesh.devices.flat) > 1:
        if dc.flat_kv_cache or dc.megakernel:
            # Pallas kernels can't run under plain GSPMD (a pallas_call
            # forces replication of its operands — an all-gather of the
            # sharded cache per step). For pure data parallelism the decode
            # is batch-row independent, so the whole single-device program
            # (flat-cache kernels, megakernel included) runs per-shard under
            # shard_map: N-chip DP serving at single-chip kernel throughput.
            # TP/beam/constrained/contrastive paths keep the head-layout
            # XLA attention, which GSPMD shards fine.
            if (not tensor_parallel and dc.num_beams == 1
                    and dc.force_words_ids is None and dc.penalty_alpha == 0.0
                    and input_ids.shape[0] % mesh.devices.shape[0] == 0):
                dp_shard_fast = True
            else:
                from dataclasses import replace as _dc_replace
                dc = _dc_replace(dc, flat_kv_cache=False, megakernel=False,
                                 w8a8=False)
        from jax.sharding import NamedSharding, PartitionSpec as P
        n_data = mesh.devices.shape[0]
        if input_ids.shape[0] % n_data != 0:
            raise ValueError(
                f"batch {input_ids.shape[0]} not divisible by the mesh data "
                f"axis ({n_data})")
        data_s = NamedSharding(mesh, P(mesh.axis_names[0]))
        put = lambda x: None if x is None else jax.device_put(x, data_s)
        input_ids, media_locations, attention_mask = (
            put(input_ids), put(media_locations), put(attention_mask))
        pixel_values, visual_features = put(pixel_values), put(visual_features)
        if tensor_parallel:
            from .parallel.sharding import (pad_vocab_params, param_shardings,
                                            shard_params)
            sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
            n_model = sizes.get("model", 1)
            if n_model <= 1:
                raise ValueError(
                    "tensor_parallel=True needs a mesh with a 'model' axis "
                    f"of size > 1, got axes {sizes}")
            params = pad_vocab_params(params, n_model)
            params = shard_params(
                params, param_shardings(params, mesh, tensor_parallel=True))
        else:
            params = jax.device_put(params, NamedSharding(mesh, P()))
        rng = jax.device_put(rng, NamedSharding(mesh, P()))

    if dc.force_words_ids is not None:
        from .constrained_beam import constrained_beam_generate
        return constrained_beam_generate(params, config, dc, policy,
                                         input_ids, media_locations,
                                         attention_mask, visual_features,
                                         pixel_values=pixel_values)

    if dc.num_beams > 1:
        from .beam_search import beam_generate
        return beam_generate(params, config, dc, policy, input_ids,
                             media_locations, attention_mask, visual_features,
                             pixel_values=pixel_values, rng=rng)

    if dc.penalty_alpha > 0.0:
        if dc.return_scores:
            raise ValueError(
                "return_scores is not supported with contrastive search "
                "(its degeneration-penalized scores are not sequence "
                "log-probs; HF also reports raw processed logits there)")
        from .contrastive import contrastive_generate
        return contrastive_generate(params, config, dc, policy, input_ids,
                                    media_locations, attention_mask,
                                    visual_features,
                                    pixel_values=pixel_values)

    if dp_shard_fast:
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P
        dname = mesh.axis_names[0]
        arrs = {"ids": input_ids, "media": media_locations,
                "mask": attention_mask}
        if visual_features is not None:
            arrs["vf"] = visual_features
        if pixel_values is not None:
            arrs["px"] = pixel_values
        names = tuple(arrs)

        def _dp_fn(ps, r, *vals):
            kw = dict(zip(names, vals))
            # decorrelate the per-shard sampling streams: inside shard_map
            # every shard sees the same key, and categorical() would draw
            # identical gumbel noise for corresponding row indices of every
            # shard (the GSPMD path shards one global (b, V) draw instead).
            # Greedy ignores the rng entirely.
            r = jax.random.fold_in(r, lax.axis_index(dname))
            return _generate_impl(ps, config, dc, policy, kw["ids"],
                                  kw["media"], kw["mask"], kw.get("vf"),
                                  kw.get("px"), r)

        # NB the scalar step-count output is per-shard (early EOS can stop
        # shards at different steps); it is unused here, so the P() spec
        # just picks one shard's value (check_rep=False).
        fn = shard_map(_dp_fn, mesh=mesh,
                       in_specs=(P(), P()) + (P(dname),) * len(names),
                       out_specs=(P(dname), P(), P(dname), P(dname)),
                       check_rep=False)
        tokens, _n, scores, step_lps = jax.jit(fn)(params, rng,
                                                   *arrs.values())
    else:
        tokens, _n, scores, step_lps = _generate_impl(
            params, config, dc, policy, input_ids, media_locations,
            attention_mask, visual_features, pixel_values, rng)
    if mega_pad:
        tokens, scores, step_lps = (tokens[:-mega_pad], scores[:-mega_pad],
                                    step_lps[:-mega_pad])
    if dc.return_scores and dc.output_scores:
        return tokens, scores, step_lps
    if dc.output_scores:
        return tokens, step_lps
    if dc.return_scores:
        return tokens, scores
    return tokens

"""HF-oracle tests for diverse (group) beam search.

The reference reaches group beam search through HF
``generate(num_beam_groups, diversity_penalty)``
(/root/reference/flamingo_mini/modeling_flamingo.py:464-548). transformers
4.57 moved the ``_group_beam_search`` driver loop out of core (to a hub
custom-generate repo, unreachable offline) but kept the classes holding ALL
the tricky semantics — ``BeamSearchScorer`` (per-group hypothesis pools,
done bookkeeping, finalize-across-groups) and
``HammingDiversityLogitsProcessor`` — so the oracle here reconstructs the
classic driver loop around HF's own scorer, keeping HF code as ground truth
for everything that matters.

Same reduction trick as test_beam_search.py: zero xattn gates + no media
make Flamingo exactly its GPT-2 trunk.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from flamingo_mini_tpu.generation import DecodeConfig, generate
from flamingo_mini_tpu.ops.layers import PARITY

from test_generation_tail import TINY_LM, gpt2_pair  # noqa: F401


def hf_group_beam(m, input_ids, *, num_beams, num_beam_groups,
                  diversity_penalty, max_length, eos, pad,
                  length_penalty=1.0, early_stopping=True,
                  num_return_sequences=1):
    """The classic HF ``_group_beam_search`` loop (transformers <= 4.48),
    driven through HF's own BeamSearchScorer + HammingDiversity processor."""
    from transformers.generation.beam_search import BeamSearchScorer
    from transformers.generation.logits_process import (
        HammingDiversityLogitsProcessor)
    batch_size, L = input_ids.shape
    scorer = BeamSearchScorer(
        batch_size=batch_size, num_beams=num_beams,
        device=torch.device("cpu"), length_penalty=length_penalty,
        do_early_stopping=early_stopping,
        num_beam_hyps_to_keep=num_return_sequences,
        num_beam_groups=num_beam_groups, max_length=max_length)
    diversity = HammingDiversityLogitsProcessor(
        diversity_penalty=diversity_penalty, num_beams=num_beams,
        num_beam_groups=num_beam_groups)
    group_size = num_beams // num_beam_groups
    ids = torch.tensor(input_ids, dtype=torch.long).repeat_interleave(
        num_beams, dim=0)
    beam_scores = torch.full((batch_size, num_beams), -1e9)
    beam_scores[:, ::group_size] = 0.0
    beam_scores = beam_scores.view(-1)
    vocab = m.get_output_embeddings().weight.shape[0]
    cur_len = L
    while cur_len < max_length and not scorer.is_done:
        with torch.no_grad():
            logits = m(ids).logits
        current_tokens = torch.zeros(batch_size * num_beams, dtype=torch.long)
        for g in range(num_beam_groups):
            gs = g * group_size
            idxs = [bi * num_beams + gs + i for bi in range(batch_size)
                    for i in range(group_size)]
            group_ids = ids[idxs]
            nts = torch.log_softmax(logits[idxs, -1].float(), dim=-1)
            nts = diversity(group_ids, nts, current_tokens=current_tokens,
                            beam_group_idx=g)
            nts = nts + beam_scores[idxs].unsqueeze(-1)
            nts, ntoks = torch.topk(
                nts.view(batch_size, group_size * vocab), 2 * group_size,
                dim=1)
            nidx = torch.div(ntoks, vocab, rounding_mode="floor")
            ntoks = ntoks % vocab
            out = scorer.process(group_ids, nts, ntoks, nidx,
                                 pad_token_id=pad, eos_token_id=eos,
                                 group_index=g, decoder_prompt_len=L)
            beam_scores[idxs] = out["next_beam_scores"]
            beam_idx = out["next_beam_indices"].long()
            ids[idxs] = group_ids[beam_idx]
            group_ids = torch.cat(
                [group_ids[beam_idx],
                 out["next_beam_tokens"].unsqueeze(-1)], dim=-1)
            current_tokens[idxs] = group_ids[:, -1]
        ids = torch.cat([ids, current_tokens.unsqueeze(-1)], dim=-1)
        cur_len += 1
    zeros = torch.zeros_like(beam_scores, dtype=torch.long)
    out = scorer.finalize(ids, beam_scores, zeros, zeros,
                          max_length=max_length, pad_token_id=pad,
                          eos_token_id=eos, decoder_prompt_len=L)
    return out["sequences"].numpy(), out["sequence_scores"].numpy()


def _jax_group_beam(params, config, input_ids, **dc_kw):
    dc = DecodeConfig(**dc_kw)
    return np.asarray(generate(params, config, jnp.asarray(input_ids),
                               policy=PARITY, dc=dc))


def test_group_beam_matches_hf(gpt2_pair):  # noqa: F811
    m, params, config = gpt2_pair
    b, n, max_length = 2, 4, 16
    rs = np.random.RandomState(23)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)

    want, _ = hf_group_beam(m, input_ids, num_beams=4, num_beam_groups=2,
                            diversity_penalty=1.5, max_length=max_length,
                            eos=128, pad=128)
    got = _jax_group_beam(params, config, input_ids, max_length=max_length,
                          eos_token_id=128, pad_token_id=128, num_beams=4,
                          num_beam_groups=2, diversity_penalty=1.5)
    np.testing.assert_array_equal(got[:, :want.shape[1]], want)


def test_group_beam_matches_hf_with_real_eos(gpt2_pair):  # noqa: F811
    """EOS the model actually emits -> finished pools, group freezing, and
    the finalize merge all get exercised."""
    m, params, config = gpt2_pair
    b, n, max_length = 2, 4, 18
    rs = np.random.RandomState(11)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)
    with torch.no_grad():
        probe = m.generate(torch.tensor(input_ids), max_length=max_length,
                           do_sample=False, pad_token_id=0,
                           eos_token_id=None)
    eos = int(probe[0, n + 2])

    want, _ = hf_group_beam(m, input_ids, num_beams=4, num_beam_groups=2,
                            diversity_penalty=2.0, max_length=max_length,
                            eos=eos, pad=eos)
    got = _jax_group_beam(params, config, input_ids, max_length=max_length,
                          eos_token_id=eos, pad_token_id=eos, num_beams=4,
                          num_beam_groups=2, diversity_penalty=2.0)
    np.testing.assert_array_equal(got[:, :want.shape[1]], want)


def test_group_beam_matches_hf_no_early_stopping(gpt2_pair):  # noqa: F811
    """early_stopping=False exercises the is_done worst-vs-attainable
    heuristic per group."""
    m, params, config = gpt2_pair
    b, n, max_length = 2, 4, 14
    rs = np.random.RandomState(29)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)
    with torch.no_grad():
        probe = m.generate(torch.tensor(input_ids), max_length=max_length,
                           do_sample=False, pad_token_id=0,
                           eos_token_id=None)
    eos = int(probe[0, n + 1])

    want, _ = hf_group_beam(m, input_ids, num_beams=4, num_beam_groups=2,
                            diversity_penalty=1.0, max_length=max_length,
                            eos=eos, pad=eos, early_stopping=False)
    got = _jax_group_beam(params, config, input_ids, max_length=max_length,
                          eos_token_id=eos, pad_token_id=eos, num_beams=4,
                          num_beam_groups=2, diversity_penalty=1.0,
                          early_stopping=False)
    np.testing.assert_array_equal(got[:, :want.shape[1]], want)


def test_group_beam_num_return_sequences_matches_hf(gpt2_pair):  # noqa: F811
    m, params, config = gpt2_pair
    b, n, max_length = 2, 4, 14
    rs = np.random.RandomState(31)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)

    want, _ = hf_group_beam(m, input_ids, num_beams=6, num_beam_groups=3,
                            diversity_penalty=1.5, max_length=max_length,
                            eos=128, pad=128, num_return_sequences=3)
    got = _jax_group_beam(params, config, input_ids, max_length=max_length,
                          eos_token_id=128, pad_token_id=128, num_beams=6,
                          num_beam_groups=3, diversity_penalty=1.5,
                          num_return_sequences=3)
    assert got.shape[0] == b * 3
    np.testing.assert_array_equal(got[:, :want.shape[1]], want)


def test_group_beam_zero_penalty_equals_small_plain_beam(gpt2_pair):  # noqa: F811
    """With diversity_penalty=0 every group runs an INDEPENDENT beam search
    of k/G beams from the same prompt, so the best hypothesis equals plain
    beam search with k/G beams — ties the group engine to the plain engine
    (which is itself HF-oracle-tested)."""
    _, params, config = gpt2_pair
    b, n, max_length = 2, 4, 14
    rs = np.random.RandomState(37)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)

    grouped = _jax_group_beam(params, config, input_ids,
                              max_length=max_length, eos_token_id=128,
                              pad_token_id=128, num_beams=4,
                              num_beam_groups=2, diversity_penalty=0.0)
    plain = _jax_group_beam(params, config, input_ids, max_length=max_length,
                            eos_token_id=128, pad_token_id=128, num_beams=2)
    np.testing.assert_array_equal(grouped, plain)


def test_group_beam_penalty_actually_diversifies(gpt2_pair):  # noqa: F811
    """With a penalty far above any log-prob gap, group 2's first token must
    differ from group 1's (the whole point of diverse beam search)."""
    _, params, config = gpt2_pair
    b, n, max_length = 1, 4, 12
    rs = np.random.RandomState(41)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)

    got = _jax_group_beam(params, config, input_ids, max_length=max_length,
                          eos_token_id=128, pad_token_id=128, num_beams=2,
                          num_beam_groups=2, diversity_penalty=1e4,
                          num_return_sequences=2)
    assert got[0, n] != got[1, n], "groups chose the same first token"


def test_group_beam_validation():
    with pytest.raises(ValueError):
        DecodeConfig(num_beams=4, num_beam_groups=3)   # not divisible
    with pytest.raises(ValueError):
        DecodeConfig(num_beams=4, num_beam_groups=2, do_sample=True)
    with pytest.raises(ValueError):
        DecodeConfig(num_beams=4, diversity_penalty=0.5)  # needs groups


def test_group_beam_lazy_equals_gather(gpt2_pair):  # noqa: F811
    """The ancestor-indexed (lazy) cache reorder must be token-identical to
    the physical gather in diverse/group beam search too (same invariant as
    plain beam, tests/test_beam_search.py)."""
    _, params, config = gpt2_pair
    b, n, max_length = 2, 5, 16
    rs = np.random.RandomState(77)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)
    kw = dict(max_length=max_length, eos_token_id=128, pad_token_id=128,
              num_beams=4, num_beam_groups=2, diversity_penalty=0.7,
              num_return_sequences=4)
    got_lazy = _jax_group_beam(params, config, input_ids,
                               beam_reorder="lazy", **kw)
    got_gather = _jax_group_beam(params, config, input_ids,
                                 beam_reorder="gather", **kw)
    np.testing.assert_array_equal(got_lazy, got_gather)


def test_group_beam_prefix_block_is_exact(gpt2_pair):  # noqa: F811
    """Live-prefix segmented decode (prefix_block) is a bitwise-exact layout
    change for group beam too — both reorder modes (VERDICT r3 #9)."""
    _, params, config = gpt2_pair
    b, n, max_length = 2, 5, 18
    rs = np.random.RandomState(78)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)
    for reorder in ("lazy", "gather"):
        kw = dict(max_length=max_length, eos_token_id=128, pad_token_id=128,
                  num_beams=4, num_beam_groups=2, diversity_penalty=0.7,
                  num_return_sequences=4, beam_reorder=reorder)
        base = _jax_group_beam(params, config, input_ids, **kw)
        seg = _jax_group_beam(params, config, input_ids, prefix_block=4, **kw)
        np.testing.assert_array_equal(base, seg)

"""Constrained beam search (force_words_ids) parity vs HF's
ConstrainedBeamSearchScorer, hand-driven through the classic
_constrained_beam_search loop (transformers moved the driver to a hub
plugin in 4.5x, but the scorer + Constraint classes still ship — we drive
them exactly the way the classic loop did).

With zero xattn gates and no media, Flamingo reduces to its GPT-2 trunk,
so this is a ground-truth oracle for sequences and scores.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from flamingo_mini_tpu.configuration_flamingo import FlamingoConfig
from flamingo_mini_tpu.generation import DecodeConfig, generate
from flamingo_mini_tpu.models.flamingo import init_flamingo
from flamingo_mini_tpu.ops.layers import PARITY
from flamingo_mini_tpu.utils.hf_weights import convert_gpt2, state_dict_to_numpy

TINY_LM = dict(vocab_size=128, n_positions=64, n_embd=32, n_layer=2, n_head=4)


@pytest.fixture(scope="module")
def gpt2_pair():
    from transformers import GPT2Config, GPT2LMHeadModel
    torch.manual_seed(42)
    m = GPT2LMHeadModel(GPT2Config(**TINY_LM, attn_pdrop=0.0, embd_pdrop=0.0,
                                   resid_pdrop=0.0))
    m.resize_token_embeddings(TINY_LM["vocab_size"] + 1)
    m.eval()
    config = FlamingoConfig(
        lm="gpt2", dim=32, dim_visual=32, xattn_every=2, xattn_dim_head=8,
        xattn_heads=4, resampler_depth=1, resampler_dim_head=8,
        resampler_heads=4, resampler_num_latents=4,
        lm_arch_overrides=TINY_LM,
        vision_arch_overrides=dict(hidden_size=32, intermediate_size=64,
                                   num_hidden_layers=1, num_attention_heads=4,
                                   image_size=32, patch_size=8))
    params = init_flamingo(jax.random.PRNGKey(0), config, with_vision=False)
    params["lm"] = convert_gpt2(state_dict_to_numpy(m.state_dict()))
    for blk in params["xattn"].values():
        blk["alpha_attn"] = jnp.zeros_like(blk["alpha_attn"])
        blk["alpha_ffw"] = jnp.zeros_like(blk["alpha_ffw"])
    return m, params, config


def hf_constrained_beam(m, input_ids, *, constraints, num_beams, max_length,
                        eos, pad, length_penalty=1.0, early_stopping=True,
                        num_return_sequences=1):
    """The classic HF _constrained_beam_search loop, driven through HF's own
    ConstrainedBeamSearchScorer."""
    from transformers.generation.beam_search import ConstrainedBeamSearchScorer
    batch_size, L = input_ids.shape
    scorer = ConstrainedBeamSearchScorer(
        batch_size=batch_size, num_beams=num_beams, constraints=constraints,
        device=torch.device("cpu"), length_penalty=length_penalty,
        do_early_stopping=early_stopping,
        num_beam_hyps_to_keep=num_return_sequences, max_length=max_length)
    ids = torch.tensor(input_ids, dtype=torch.long).repeat_interleave(
        num_beams, dim=0)
    beam_scores = torch.full((batch_size, num_beams), -1e9)
    beam_scores[:, 0] = 0.0
    beam_scores = beam_scores.view(-1)
    vocab = m.get_output_embeddings().weight.shape[0]
    cur_len = L
    while cur_len < max_length and not scorer.is_done:
        with torch.no_grad():
            logits = m(ids).logits[:, -1]
        nts = torch.log_softmax(logits.float(), dim=-1)
        nts = nts + beam_scores.unsqueeze(-1)
        scores_for_all_vocab = nts.clone()
        nts, ntoks = torch.topk(nts.view(batch_size, num_beams * vocab),
                                2 * num_beams, dim=1)
        nidx = torch.div(ntoks, vocab, rounding_mode="floor")
        ntoks = ntoks % vocab
        out = scorer.process(ids, nts, ntoks, nidx, scores_for_all_vocab,
                             pad_token_id=pad, eos_token_id=eos,
                             decoder_prompt_len=L)
        beam_scores = out["next_beam_scores"]
        beam_idx = out["next_beam_indices"].long()
        ids = torch.cat(
            [ids[beam_idx], out["next_beam_tokens"].unsqueeze(-1)], dim=-1)
        cur_len += 1
    final = scorer.finalize(ids, beam_scores, None, None,
                            max_length=max_length, pad_token_id=pad,
                            eos_token_id=eos, decoder_prompt_len=L)
    return final["sequences"].numpy(), final["sequence_scores"].numpy()


def _jax_constrained(params, config, input_ids, *, force_words_ids, **dc_kw):
    dc = DecodeConfig(force_words_ids=tuple(
        tuple(tuple(int(t) for t in alt) for alt in w)
        if isinstance(w[0], (list, tuple)) else (tuple(int(t) for t in w),)
        for w in force_words_ids), return_scores=True, **dc_kw)
    seq, sc = generate(params, config, jnp.asarray(input_ids),
                       policy=PARITY, dc=dc)
    return np.asarray(seq), np.asarray(sc)


def _check(got_seq, got_sc, want_seq, want_sc, eos):
    want_len = want_seq.shape[1]
    np.testing.assert_array_equal(got_seq[:, :want_len], want_seq)
    assert np.all(got_seq[:, want_len:] == eos)
    np.testing.assert_allclose(got_sc, want_sc, atol=1e-4, rtol=1e-4)


def test_phrasal_constraint_matches_hf(gpt2_pair):
    from transformers.generation.beam_constraints import PhrasalConstraint
    m, params, config = gpt2_pair
    b, n, max_length = 2, 4, 14
    rs = np.random.RandomState(11)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)
    phrase = [17, 43]
    eos = 128
    want_seq, want_sc = hf_constrained_beam(
        m, input_ids, constraints=[PhrasalConstraint(phrase)],
        num_beams=3, max_length=max_length, eos=eos, pad=eos)
    got_seq, got_sc = _jax_constrained(
        params, config, input_ids, force_words_ids=[phrase],
        num_beams=3, max_length=max_length, eos_token_id=eos,
        pad_token_id=eos)
    # every returned sequence must contain the phrase
    for row in want_seq:
        s = row.tolist()
        assert any(s[i:i + 2] == phrase for i in range(len(s) - 1))
    _check(got_seq, got_sc, want_seq, want_sc, eos)


def test_phrasal_with_reachable_eos(gpt2_pair):
    from transformers.generation.beam_constraints import PhrasalConstraint
    m, params, config = gpt2_pair
    b, n, max_length = 2, 4, 16
    rs = np.random.RandomState(5)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)
    # pick an EOS the model likes so hypotheses finish early
    with torch.no_grad():
        probe = m.generate(torch.tensor(input_ids), max_length=max_length,
                           num_beams=3, early_stopping=True, pad_token_id=0,
                           eos_token_id=None, do_sample=False)
    eos = int(probe[0, n + 3])
    phrase = [int(probe[1, n]), int(probe[1, n + 1])]
    if phrase[0] == eos or phrase[1] == eos:
        phrase = [7, 99]
    want_seq, want_sc = hf_constrained_beam(
        m, input_ids, constraints=[PhrasalConstraint(phrase)],
        num_beams=3, max_length=max_length, eos=eos, pad=eos)
    got_seq, got_sc = _jax_constrained(
        params, config, input_ids, force_words_ids=[phrase],
        num_beams=3, max_length=max_length, eos_token_id=eos,
        pad_token_id=eos)
    _check(got_seq, got_sc, want_seq, want_sc, eos)


def test_disjunctive_constraint_matches_hf(gpt2_pair):
    from transformers.generation.beam_constraints import DisjunctiveConstraint
    m, params, config = gpt2_pair
    b, n, max_length = 2, 4, 14
    rs = np.random.RandomState(23)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)
    alts = [[31, 5], [88]]
    eos = 128
    want_seq, want_sc = hf_constrained_beam(
        m, input_ids, constraints=[DisjunctiveConstraint(alts)],
        num_beams=3, max_length=max_length, eos=eos, pad=eos)
    got_seq, got_sc = _jax_constrained(
        params, config, input_ids, force_words_ids=[alts],
        num_beams=3, max_length=max_length, eos_token_id=eos,
        pad_token_id=eos)
    _check(got_seq, got_sc, want_seq, want_sc, eos)


def test_two_constraints_match_hf(gpt2_pair):
    from transformers.generation.beam_constraints import PhrasalConstraint
    m, params, config = gpt2_pair
    b, n, max_length = 1, 4, 16
    rs = np.random.RandomState(31)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)
    eos = 128
    p1, p2 = [55], [12, 61]
    want_seq, want_sc = hf_constrained_beam(
        m, input_ids,
        constraints=[PhrasalConstraint(p1), PhrasalConstraint(p2)],
        num_beams=4, max_length=max_length, eos=eos, pad=eos)
    got_seq, got_sc = _jax_constrained(
        params, config, input_ids, force_words_ids=[p1, p2],
        num_beams=4, max_length=max_length, eos_token_id=eos,
        pad_token_id=eos)
    _check(got_seq, got_sc, want_seq, want_sc, eos)


def test_validation_errors():
    with pytest.raises(ValueError, match="num_beams > 1"):
        DecodeConfig(force_words_ids=(((5,),),))
    with pytest.raises(ValueError, match="do_sample"):
        DecodeConfig(force_words_ids=(((5,),),), num_beams=3, do_sample=True)
    from flamingo_mini_tpu.constrained_beam import normalize_force_words
    with pytest.raises(ValueError, match="subset"):
        normalize_force_words([[[3, 4], [3]]])
    with pytest.raises(ValueError, match="non-empty"):
        normalize_force_words([[]])

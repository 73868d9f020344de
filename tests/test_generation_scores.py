"""Public generation scores vs HF oracles.

With zero xattn gates and no media, Flamingo reduces to its GPT-2 trunk, so
HF GPT2LMHeadModel.generate with return_dict_in_generate/output_scores is a
ground-truth oracle: beam ``sequences_scores`` must match, and greedy/sample
cumulative log-probs must match ``compute_transition_scores`` summed.
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


def test_beam_sequences_scores_match_hf(gpt2_pair):
    m, params, config = gpt2_pair
    b, n, max_length = 2, 4, 14
    rs = np.random.RandomState(7)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)
    eos = 128

    from transformers import GenerationConfig
    with torch.no_grad():
        out = m.generate(
            torch.tensor(input_ids),
            generation_config=GenerationConfig(
                max_length=max_length, num_beams=3, early_stopping=True,
                do_sample=False, eos_token_id=eos, pad_token_id=eos,
                return_dict_in_generate=True, output_scores=True))
    want_scores = out.sequences_scores.numpy()

    dc = DecodeConfig(max_length=max_length, eos_token_id=eos,
                      pad_token_id=eos, num_beams=3, return_scores=True)
    got_seq, got_scores = generate(params, config, jnp.asarray(input_ids),
                                   policy=PARITY, dc=dc)
    np.testing.assert_array_equal(
        np.asarray(got_seq)[:, :out.sequences.shape[1]],
        out.sequences.numpy())
    np.testing.assert_allclose(np.asarray(got_scores), want_scores,
                               atol=1e-4, rtol=1e-4)


def test_greedy_cumulative_logprobs_match_hf(gpt2_pair):
    m, params, config = gpt2_pair
    b, n, max_length = 2, 4, 12
    rs = np.random.RandomState(3)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)
    eos = 128  # unreachable

    from transformers import GenerationConfig
    with torch.no_grad():
        out = m.generate(
            torch.tensor(input_ids),
            generation_config=GenerationConfig(
                max_length=max_length, do_sample=False, eos_token_id=eos,
                pad_token_id=eos, return_dict_in_generate=True,
                output_scores=True))
        trans = m.compute_transition_scores(
            out.sequences, out.scores, normalize_logits=True)
    want = trans.numpy().sum(axis=1)

    dc = DecodeConfig(max_length=max_length, eos_token_id=eos,
                      pad_token_id=eos, return_scores=True)
    got_seq, got_scores = generate(params, config, jnp.asarray(input_ids),
                                   policy=PARITY, dc=dc)
    np.testing.assert_array_equal(np.asarray(got_seq), out.sequences.numpy())
    np.testing.assert_allclose(np.asarray(got_scores), want,
                               atol=1e-4, rtol=1e-4)


def test_greedy_scores_stop_at_eos(gpt2_pair):
    """Post-EOS pad steps must not accumulate; scores are finite and equal
    between the flat and head cache layouts."""
    m, params, config = gpt2_pair
    ids = np.arange(4)[None] + 10
    with torch.no_grad():
        probe = m.generate(torch.tensor(ids), max_length=16, num_beams=1,
                           pad_token_id=0, eos_token_id=None, do_sample=False)
    eos = int(probe[0, 7])  # forces EOS mid-decode
    outs = []
    for flat in (True, False):
        dc = DecodeConfig(max_length=16, eos_token_id=eos, pad_token_id=0,
                          return_scores=True, flat_kv_cache=flat)
        seq, sc = generate(params, config, jnp.asarray(ids), policy=PARITY,
                           dc=dc)
        outs.append((np.asarray(seq), np.asarray(sc)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_allclose(outs[0][1], outs[1][1], atol=1e-5)
    assert np.isfinite(outs[0][1]).all()


def test_greedy_per_step_scores_match_hf(gpt2_pair):
    """output_scores=True returns the (b, max_length) per-step transition
    log-prob array; each generated position must equal the corresponding HF
    compute_transition_scores(normalize_logits=True) column."""
    m, params, config = gpt2_pair
    b, n, max_length = 2, 4, 12
    rs = np.random.RandomState(11)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)
    eos = 128  # unreachable

    from transformers import GenerationConfig
    with torch.no_grad():
        out = m.generate(
            torch.tensor(input_ids),
            generation_config=GenerationConfig(
                max_length=max_length, do_sample=False, eos_token_id=eos,
                pad_token_id=eos, return_dict_in_generate=True,
                output_scores=True))
        trans = m.compute_transition_scores(
            out.sequences, out.scores, normalize_logits=True).numpy()

    dc = DecodeConfig(max_length=max_length, eos_token_id=eos,
                      pad_token_id=eos, output_scores=True)
    got_seq, got_steps = generate(params, config, jnp.asarray(input_ids),
                                  policy=PARITY, dc=dc)
    got_steps = np.asarray(got_steps)
    assert got_steps.shape == (b, max_length)
    np.testing.assert_array_equal(np.asarray(got_seq), out.sequences.numpy())
    # generated positions n..max_length-1 <-> HF transition columns 0..
    np.testing.assert_allclose(got_steps[:, n:], trans, atol=1e-4, rtol=1e-4)
    # prompt slots hold 0.0
    np.testing.assert_array_equal(got_steps[:, :n], 0.0)


def test_sample_per_step_scores_sum_to_sequence_scores(gpt2_pair):
    """Sampling with both surfaces on: the per-step array must sum to the
    returned sequences_scores, and tokens match the output_scores-off run
    (same rng stream — the extra buffer must not consume randomness)."""
    m, params, config = gpt2_pair
    ids = np.arange(4)[None] + 30
    kw = dict(max_length=12, eos_token_id=128, pad_token_id=0,
              do_sample=True, top_k=8, temperature=1.3)
    rng = jax.random.PRNGKey(5)
    seq0, sum0 = generate(params, config, jnp.asarray(ids), policy=PARITY,
                          dc=DecodeConfig(**kw, return_scores=True), rng=rng)
    seq, ssum, steps = generate(
        params, config, jnp.asarray(ids), policy=PARITY,
        dc=DecodeConfig(**kw, return_scores=True, output_scores=True),
        rng=rng)
    np.testing.assert_array_equal(np.asarray(seq), np.asarray(seq0))
    np.testing.assert_allclose(np.asarray(ssum), np.asarray(sum0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(steps).sum(axis=1),
                               np.asarray(ssum), atol=1e-4, rtol=1e-4)


def test_per_step_scores_zero_after_eos(gpt2_pair):
    m, params, config = gpt2_pair
    ids = np.arange(4)[None] + 10
    with torch.no_grad():
        probe = m.generate(torch.tensor(ids), max_length=16, num_beams=1,
                           pad_token_id=0, eos_token_id=None, do_sample=False)
    eos = int(probe[0, 7])  # forces EOS mid-decode
    dc = DecodeConfig(max_length=16, eos_token_id=eos, pad_token_id=0,
                      output_scores=True)
    seq, steps = generate(params, config, jnp.asarray(ids), policy=PARITY,
                          dc=dc)
    seq, steps = np.asarray(seq), np.asarray(steps)
    eos_pos = int(np.argmax(seq[0] == eos))
    assert 4 <= eos_pos < 15  # EOS fired mid-decode
    # the EOS step itself scores; every pad step after it holds 0.0
    assert steps[0, eos_pos] != 0.0
    np.testing.assert_array_equal(steps[0, eos_pos + 1:], 0.0)


def test_output_scores_rejects_beams(gpt2_pair):
    with pytest.raises(ValueError, match="output_scores"):
        DecodeConfig(max_length=8, eos_token_id=128, pad_token_id=0,
                     num_beams=3, output_scores=True)


def test_sample_scores_match_manual_recompute(gpt2_pair):
    """Sampled scores equal the sum of warped-distribution log-probs of the
    emitted tokens, recomputed step-by-step with teacher forcing."""
    m, params, config = gpt2_pair
    ids = np.arange(4)[None] + 30
    dc = DecodeConfig(max_length=12, eos_token_id=128, pad_token_id=0,
                      do_sample=True, top_k=8, temperature=1.3,
                      return_scores=True)
    seq, sc = generate(params, config, jnp.asarray(ids), policy=PARITY,
                       dc=dc, rng=jax.random.PRNGKey(5))
    seq = np.asarray(seq)

    # teacher-forced recompute through the torch oracle
    from flamingo_mini_tpu.generation import apply_logit_filters
    total = 0.0
    with torch.no_grad():
        logits = m(torch.tensor(seq.astype(np.int64))).logits.numpy()
    for pos in range(4, 12):
        step = apply_logit_filters(jnp.asarray(logits[:, pos - 1]),
                                   temperature=1.3, top_k=8)
        lp = jax.nn.log_softmax(step, axis=-1)
        total += float(lp[0, int(seq[0, pos])])
    np.testing.assert_allclose(float(sc[0]), total, atol=1e-3, rtol=1e-3)

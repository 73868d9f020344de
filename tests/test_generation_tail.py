"""HF-oracle tests for the generation tail features added for reference
parity (the reference inherits the full HF ``generate()`` surface;
/root/reference/flamingo_mini/modeling_flamingo.py:464-548):
min_new_tokens / min_length, no_repeat_ngram_size, num_return_sequences —
plus the sampling-RNG distinctness fix and mesh-sharded DP generation.

Same oracle trick as test_beam_search.py: zero xattn gates and no media make
Flamingo reduce exactly to its GPT-2 trunk, so HF GPT2LMHeadModel.generate
is ground truth.
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


def _hf_generate(m, input_ids, **kw):
    from transformers import GenerationConfig
    # transformers 4.57 resolves length from max_new_tokens (default 20),
    # ignoring GenerationConfig.max_length for greedy — pin it explicitly
    if "max_length" in kw:
        kw.setdefault("max_new_tokens", kw["max_length"] - input_ids.shape[1])
    with torch.no_grad():
        return m.generate(torch.tensor(input_ids),
                          generation_config=GenerationConfig(**kw)).numpy()


def _probe_eos(m, input_ids, max_length):
    """A token the greedy model actually emits early — usable as EOS."""
    with torch.no_grad():
        out = m.generate(torch.tensor(input_ids), max_length=max_length,
                         do_sample=False, pad_token_id=0, eos_token_id=None)
    return int(out[0, input_ids.shape[1] + 1])


def test_no_repeat_ngram_matches_hf(gpt2_pair):
    m, params, config = gpt2_pair
    b, n, max_length = 2, 4, 20
    rs = np.random.RandomState(3)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)

    want = _hf_generate(m, input_ids, max_length=max_length, do_sample=False,
                        no_repeat_ngram_size=2, eos_token_id=128,
                        pad_token_id=128)
    dc = DecodeConfig(max_length=max_length, eos_token_id=128,
                      pad_token_id=128, no_repeat_ngram_size=2)
    got = np.asarray(generate(params, config, jnp.asarray(input_ids),
                              policy=PARITY, dc=dc))
    np.testing.assert_array_equal(got[:, :want.shape[1]], want)
    # sanity: the constraint binds — plain greedy differs on this model
    plain = np.asarray(generate(
        params, config, jnp.asarray(input_ids), policy=PARITY,
        dc=DecodeConfig(max_length=max_length, eos_token_id=128,
                        pad_token_id=128)))
    assert not np.array_equal(plain, got)


def test_bad_words_matches_hf(gpt2_pair):
    m, params, config = gpt2_pair
    b, n, max_length = 2, 4, 20
    rs = np.random.RandomState(3)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)

    # ban the first two greedy continuations: a 1-token word and a 2-token
    # word built from the plain greedy output, so the constraint binds
    plain = _hf_generate(m, input_ids, max_length=max_length, do_sample=False,
                         eos_token_id=128, pad_token_id=128)
    bad = [[int(plain[0, n])], [int(plain[1, n]), int(plain[1, n + 1])]]
    want = _hf_generate(m, input_ids, max_length=max_length, do_sample=False,
                        bad_words_ids=bad, eos_token_id=128, pad_token_id=128)
    dc = DecodeConfig(max_length=max_length, eos_token_id=128,
                      pad_token_id=128,
                      bad_words_ids=tuple(tuple(w) for w in bad))
    got = np.asarray(generate(params, config, jnp.asarray(input_ids),
                              policy=PARITY, dc=dc))
    np.testing.assert_array_equal(got[:, :want.shape[1]], want)
    assert not np.array_equal(plain, want)  # the ban actually changed output


def test_beam_bad_words_matches_hf(gpt2_pair):
    m, params, config = gpt2_pair
    b, n, max_length = 2, 4, 16
    rs = np.random.RandomState(5)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)

    plain = _hf_generate(m, input_ids, max_length=max_length, do_sample=False,
                         num_beams=3, early_stopping=True, eos_token_id=128,
                         pad_token_id=128)
    bad = [[int(plain[0, n])], [int(plain[1, n]), int(plain[1, n + 1])]]
    want = _hf_generate(m, input_ids, max_length=max_length, do_sample=False,
                        num_beams=3, early_stopping=True, bad_words_ids=bad,
                        eos_token_id=128, pad_token_id=128)
    dc = DecodeConfig(max_length=max_length, eos_token_id=128,
                      pad_token_id=128, num_beams=3,
                      bad_words_ids=tuple(tuple(w) for w in bad))
    got = np.asarray(generate(params, config, jnp.asarray(input_ids),
                              policy=PARITY, dc=dc))
    np.testing.assert_array_equal(got[:, :want.shape[1]], want)


def test_min_new_tokens_matches_hf(gpt2_pair):
    m, params, config = gpt2_pair
    b, n, max_length = 2, 4, 18
    rs = np.random.RandomState(11)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)
    eos = _probe_eos(m, input_ids, max_length)

    for min_new in (0, 6):
        want = _hf_generate(m, input_ids, max_length=max_length,
                            do_sample=False, min_new_tokens=min_new,
                            eos_token_id=eos, pad_token_id=eos)
        dc = DecodeConfig(max_length=max_length, eos_token_id=eos,
                          pad_token_id=eos, min_new_tokens=min_new)
        got = np.asarray(generate(params, config, jnp.asarray(input_ids),
                                  policy=PARITY, dc=dc))
        np.testing.assert_array_equal(got[:, :want.shape[1]], want,
                                      err_msg=f"min_new_tokens={min_new}")


def test_max_new_tokens_matches_hf(gpt2_pair):
    """max_new_tokens stops generation early while the static buffers stay
    max_length-sized (slots beyond are pads)."""
    m, params, config = gpt2_pair
    b, n, max_length, mnt = 2, 4, 24, 7
    rs = np.random.RandomState(17)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)

    want = _hf_generate(m, input_ids, max_new_tokens=mnt, do_sample=False,
                        eos_token_id=128, pad_token_id=128)
    dc = DecodeConfig(max_length=max_length, max_new_tokens=mnt,
                      eos_token_id=128, pad_token_id=128)
    got = np.asarray(generate(params, config, jnp.asarray(input_ids),
                              policy=PARITY, dc=dc))
    assert want.shape[1] == n + mnt
    np.testing.assert_array_equal(got[:, :n + mnt], want)
    # beyond the stop position: pads only
    assert (got[:, n + mnt:] == 128).all()
    # segmented path is identical
    dc_seg = DecodeConfig(max_length=max_length, max_new_tokens=mnt,
                          eos_token_id=128, pad_token_id=128, prefix_block=4)
    got_seg = np.asarray(generate(params, config, jnp.asarray(input_ids),
                                  policy=PARITY, dc=dc_seg))
    np.testing.assert_array_equal(got, got_seg)


def test_beam_max_new_tokens_matches_hf(gpt2_pair):
    m, params, config = gpt2_pair
    b, n, max_length, mnt = 2, 4, 24, 8
    rs = np.random.RandomState(19)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)

    want = _hf_generate(m, input_ids, max_new_tokens=mnt, do_sample=False,
                        num_beams=3, early_stopping=True, eos_token_id=128,
                        pad_token_id=128)
    dc = DecodeConfig(max_length=max_length, max_new_tokens=mnt,
                      eos_token_id=128, pad_token_id=128, num_beams=3)
    got = np.asarray(generate(params, config, jnp.asarray(input_ids),
                              policy=PARITY, dc=dc))
    np.testing.assert_array_equal(got[:, :want.shape[1]], want)
    assert (got[:, n + mnt:] == 128).all()


def test_min_length_matches_hf(gpt2_pair):
    m, params, config = gpt2_pair
    b, n, max_length = 2, 4, 18
    rs = np.random.RandomState(11)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)
    eos = _probe_eos(m, input_ids, max_length)

    want = _hf_generate(m, input_ids, max_length=max_length, do_sample=False,
                        min_length=12, eos_token_id=eos, pad_token_id=eos)
    dc = DecodeConfig(max_length=max_length, eos_token_id=eos,
                      pad_token_id=eos, min_length=12)
    got = np.asarray(generate(params, config, jnp.asarray(input_ids),
                              policy=PARITY, dc=dc))
    np.testing.assert_array_equal(got[:, :want.shape[1]], want)


def test_beam_no_repeat_ngram_matches_hf(gpt2_pair):
    m, params, config = gpt2_pair
    b, n, max_length = 2, 4, 16
    rs = np.random.RandomState(5)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)

    want = _hf_generate(m, input_ids, max_length=max_length, do_sample=False,
                        num_beams=3, early_stopping=True,
                        no_repeat_ngram_size=2, eos_token_id=128,
                        pad_token_id=128)
    dc = DecodeConfig(max_length=max_length, eos_token_id=128,
                      pad_token_id=128, num_beams=3, no_repeat_ngram_size=2)
    got = np.asarray(generate(params, config, jnp.asarray(input_ids),
                              policy=PARITY, dc=dc))
    np.testing.assert_array_equal(got[:, :want.shape[1]], want)


def test_beam_num_return_sequences_matches_hf(gpt2_pair):
    m, params, config = gpt2_pair
    b, n, max_length = 2, 4, 14
    rs = np.random.RandomState(7)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)
    eos = _probe_eos(m, input_ids, max_length)

    want = _hf_generate(m, input_ids, max_length=max_length, do_sample=False,
                        num_beams=3, num_return_sequences=3,
                        early_stopping=True, eos_token_id=eos,
                        pad_token_id=eos)
    dc = DecodeConfig(max_length=max_length, eos_token_id=eos,
                      pad_token_id=eos, num_beams=3, num_return_sequences=3)
    got = np.asarray(generate(params, config, jnp.asarray(input_ids),
                              policy=PARITY, dc=dc))
    assert got.shape[0] == b * 3
    np.testing.assert_array_equal(got[:, :want.shape[1]], want)


def test_sample_num_return_sequences_expands_batch(gpt2_pair):
    _, params, config = gpt2_pair
    b, n, max_length, nrs = 2, 4, 14, 4
    rs = np.random.RandomState(1)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)
    dc = DecodeConfig(max_length=max_length, eos_token_id=999,
                      pad_token_id=0, do_sample=True, temperature=2.0,
                      num_return_sequences=nrs)
    got = np.asarray(generate(params, config, jnp.asarray(input_ids),
                              policy=PARITY, dc=dc,
                              rng=jax.random.PRNGKey(5)))
    assert got.shape == (b * nrs, max_length)
    # all rows share the prompt per group; the samples differ between rows
    for i in range(b):
        grp = got[i * nrs:(i + 1) * nrs]
        np.testing.assert_array_equal(grp[:, :n],
                                      np.tile(input_ids[i], (nrs, 1)))
        assert len({tuple(r) for r in grp}) > 1, "samples are identical"


def test_greedy_num_return_sequences_raises(gpt2_pair):
    _, params, config = gpt2_pair
    dc = DecodeConfig(max_length=10, eos_token_id=999, pad_token_id=0,
                      num_return_sequences=2)
    with pytest.raises(ValueError):
        generate(params, config, jnp.zeros((1, 4), jnp.int32),
                 policy=PARITY, dc=dc)


def test_sampling_steps_use_distinct_keys(gpt2_pair):
    """Regression for the fold_in(rng, L) == fold_in(rng, cur@L) key reuse:
    with ALL-ZERO LM weights the next-token logits are constant, so with the
    bug tokens 1 and 2 of every sampled decode came from the SAME key applied
    to the SAME distribution -> always identical. Fixed: iid uniform."""
    _, params, config = gpt2_pair
    zero_lm = jax.tree_util.tree_map(jnp.zeros_like, params["lm"])
    p = dict(params, lm=zero_lm)
    b, n = 4, 4
    input_ids = jnp.ones((b, n), jnp.int32)
    dc = DecodeConfig(max_length=n + 4, eos_token_id=999, pad_token_id=0,
                      do_sample=True)
    diffs = 0
    for seed in range(8):
        out = np.asarray(generate(p, config, input_ids, policy=PARITY, dc=dc,
                                  rng=jax.random.PRNGKey(seed)))
        diffs += int(np.any(out[:, n] != out[:, n + 1]))
    # vocab=129 uniform: P(all 8*4 pairs collide) ~ (1/129)^32 ~ 0
    assert diffs >= 7, f"tokens 1 and 2 correlated: {diffs}/8 seeds differ"


def test_generate_dp_mesh_matches_single(gpt2_pair):
    """DP-sharded batched serving: greedy tokens on an 8-device mesh equal
    the single-device result (VERDICT r1 weak #3)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from flamingo_mini_tpu.parallel import create_mesh
    _, params, config = gpt2_pair
    b, n, max_length = 8, 4, 14
    rs = np.random.RandomState(13)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)
    dc = DecodeConfig(max_length=max_length, eos_token_id=128, pad_token_id=128)

    single = np.asarray(generate(params, config, jnp.asarray(input_ids),
                                 policy=PARITY, dc=dc))
    mesh = create_mesh((8, 1))
    sharded = np.asarray(generate(params, config, jnp.asarray(input_ids),
                                  policy=PARITY, dc=dc, mesh=mesh))
    np.testing.assert_array_equal(single, sharded)
    # batch not divisible by the data axis -> explicit error
    with pytest.raises(ValueError):
        generate(params, config, jnp.asarray(input_ids[:6]), policy=PARITY,
                 dc=dc, mesh=mesh)


def test_suppress_tokens_matches_hf(gpt2_pair):
    m, params, config = gpt2_pair
    b, n, max_length = 2, 4, 16
    rs = np.random.RandomState(43)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)

    plain = _hf_generate(m, input_ids, max_length=max_length, do_sample=False,
                         eos_token_id=128, pad_token_id=128)
    sup = sorted({int(plain[i, n + j]) for i in range(b) for j in range(2)})
    want = _hf_generate(m, input_ids, max_length=max_length, do_sample=False,
                        suppress_tokens=sup, eos_token_id=128,
                        pad_token_id=128)
    dc = DecodeConfig(max_length=max_length, eos_token_id=128,
                      pad_token_id=128, suppress_tokens=tuple(sup))
    got = np.asarray(generate(params, config, jnp.asarray(input_ids),
                              policy=PARITY, dc=dc))
    np.testing.assert_array_equal(got[:, :want.shape[1]], want)
    assert not np.array_equal(want, plain)  # the suppression binds


def test_begin_suppress_tokens_matches_hf(gpt2_pair):
    m, params, config = gpt2_pair
    b, n, max_length = 2, 4, 16
    rs = np.random.RandomState(47)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)

    plain = _hf_generate(m, input_ids, max_length=max_length, do_sample=False,
                         eos_token_id=128, pad_token_id=128)
    sup = sorted({int(plain[i, n]) for i in range(b)})  # first generated toks
    want = _hf_generate(m, input_ids, max_length=max_length, do_sample=False,
                        begin_suppress_tokens=sup, eos_token_id=128,
                        pad_token_id=128)
    dc = DecodeConfig(max_length=max_length, eos_token_id=128,
                      pad_token_id=128, begin_suppress_tokens=tuple(sup))
    got = np.asarray(generate(params, config, jnp.asarray(input_ids),
                              policy=PARITY, dc=dc))
    np.testing.assert_array_equal(got[:, :want.shape[1]], want)
    # only the FIRST step is constrained: banned tokens may appear later
    assert not np.array_equal(want, plain)


def test_forced_eos_matches_hf(gpt2_pair):
    m, params, config = gpt2_pair
    b, n, max_length = 2, 4, 12
    rs = np.random.RandomState(53)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)

    want = _hf_generate(m, input_ids, max_length=max_length, do_sample=False,
                        forced_eos_token_id=77, eos_token_id=128,
                        pad_token_id=128)
    dc = DecodeConfig(max_length=max_length, eos_token_id=128,
                      pad_token_id=128, forced_eos_token_id=77)
    got = np.asarray(generate(params, config, jnp.asarray(input_ids),
                              policy=PARITY, dc=dc))
    np.testing.assert_array_equal(got[:, :want.shape[1]], want)
    assert (want[:, -1] == 77).all()


def test_forced_bos_matches_hf(gpt2_pair):
    """HF semantics: ForcedBOS fires at sequence length 1, i.e. only with a
    single-token prompt on a decoder-only LM."""
    m, params, config = gpt2_pair
    input_ids = np.asarray([[5], [17]], dtype=np.int64)
    max_length = 10

    want = _hf_generate(m, input_ids, max_length=max_length, do_sample=False,
                        forced_bos_token_id=33, eos_token_id=128,
                        pad_token_id=128)
    dc = DecodeConfig(max_length=max_length, eos_token_id=128,
                      pad_token_id=128, forced_bos_token_id=33)
    got = np.asarray(generate(params, config, jnp.asarray(input_ids),
                              policy=PARITY, dc=dc))
    np.testing.assert_array_equal(got[:, :want.shape[1]], want)
    assert (want[:, 1] == 33).all()


def test_beam_suppress_tokens_matches_hf(gpt2_pair):
    m, params, config = gpt2_pair
    b, n, max_length = 2, 4, 14
    rs = np.random.RandomState(59)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)

    plain = _hf_generate(m, input_ids, max_length=max_length, do_sample=False,
                         num_beams=3, early_stopping=True, eos_token_id=128,
                         pad_token_id=128)
    sup = sorted({int(plain[i, n]) for i in range(b)})
    want = _hf_generate(m, input_ids, max_length=max_length, do_sample=False,
                        num_beams=3, early_stopping=True, suppress_tokens=sup,
                        eos_token_id=128, pad_token_id=128)
    dc = DecodeConfig(max_length=max_length, eos_token_id=128,
                      pad_token_id=128, num_beams=3,
                      suppress_tokens=tuple(sup))
    got = np.asarray(generate(params, config, jnp.asarray(input_ids),
                              policy=PARITY, dc=dc))
    np.testing.assert_array_equal(got[:, :want.shape[1]], want)


def test_max_new_tokens_zero_raises():
    with pytest.raises(ValueError):
        DecodeConfig(max_new_tokens=0)
    with pytest.raises(ValueError):
        DecodeConfig(max_new_tokens=-3)


def test_bad_words_eos_entry_dropped(gpt2_pair):
    """HF's NoBadWordsLogitsProcessor drops a bad word equal to [eos] (EOS
    must stay reachable); the model-API normalization must do the same."""
    from flamingo_mini_tpu.modeling_flamingo import FlamingoModel
    _, params, config = gpt2_pair
    model = FlamingoModel(config, params=params)
    ids = np.asarray([[5, 9, 12, 3]], dtype=np.int32)
    plain = np.asarray(model.generate(ids, max_length=12, eos_token_id=128,
                                      pad_token_id=128))
    banned = np.asarray(model.generate(ids, max_length=12, eos_token_id=128,
                                       pad_token_id=128,
                                       bad_words_ids=[[128]]))
    np.testing.assert_array_equal(plain, banned)


def test_top_k_clamped_to_vocab(gpt2_pair):
    """top_k > vocab must not crash (HF clamps to vocab size)."""
    _, params, config = gpt2_pair
    dc = DecodeConfig(max_length=8, eos_token_id=999, pad_token_id=0,
                      do_sample=True, top_k=10_000)
    out = generate(params, config, jnp.ones((1, 4), jnp.int32),
                   policy=PARITY, dc=dc, rng=jax.random.PRNGKey(0))
    assert out.shape == (1, 8)


def test_sequence_bias_matches_hf(gpt2_pair):
    """HF SequenceBiasLogitsProcessor: single- and multi-token sequences,
    positive and negative biases, greedy decode equality."""
    m, params, config = gpt2_pair
    b, n, max_length = 2, 5, 20
    rs = np.random.RandomState(13)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)

    # bias a unigram up, a bigram completion down, another bigram up
    greedy = _hf_generate(m, input_ids, max_length=max_length,
                          do_sample=False, eos_token_id=128, pad_token_id=128)
    t1 = int(greedy[0, n + 1])
    t2 = int(greedy[0, n + 2])
    bias = {(t1,): -4.0, (t1, t2): -7.5, (int(greedy[1, n]), 17): 3.0}

    from transformers import GenerationConfig
    with torch.no_grad():
        want = m.generate(
            torch.tensor(input_ids),
            generation_config=GenerationConfig(
                max_new_tokens=max_length - n, do_sample=False,
                eos_token_id=128, pad_token_id=128,
                sequence_bias={k: v for k, v in bias.items()})).numpy()

    dc = DecodeConfig(max_length=max_length, eos_token_id=128,
                      pad_token_id=128,
                      sequence_bias=tuple((tuple(k), v)
                                          for k, v in bias.items()))
    got = np.asarray(generate(params, config, jnp.asarray(input_ids),
                              policy=PARITY, dc=dc))
    np.testing.assert_array_equal(got[:, :want.shape[1]], want)


def test_exponential_decay_length_penalty_matches_hf(gpt2_pair):
    """HF ExponentialDecayLengthPenalty pushes EOS after the start index."""
    m, params, config = gpt2_pair
    b, n, max_length = 2, 4, 24
    rs = np.random.RandomState(17)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)
    eos = _probe_eos(m, input_ids, max_length)

    from transformers import GenerationConfig
    with torch.no_grad():
        want = m.generate(
            torch.tensor(input_ids),
            generation_config=GenerationConfig(
                max_new_tokens=max_length - n, do_sample=False,
                eos_token_id=eos, pad_token_id=128,
                exponential_decay_length_penalty=(4, 1.5))).numpy()

    dc = DecodeConfig(max_length=max_length, eos_token_id=eos,
                      pad_token_id=128,
                      exponential_decay_length_penalty=(4, 1.5))
    got = np.asarray(generate(params, config, jnp.asarray(input_ids),
                              policy=PARITY, dc=dc))
    L = want.shape[1]
    np.testing.assert_array_equal(got[:, :L], want)
    assert bool(np.all(got[:, L:] == 128) | np.all(got[:, L:] == eos)) or \
        got.shape[1] == L


def test_bad_words_boundary_matches_hf(gpt2_pair):
    """A multi-token bad word whose prefix IS the whole 1-token prompt: HF
    skips words longer than the current length, so the word CAN complete at
    the first generated position — we must match that quirk exactly."""
    m, params, config = gpt2_pair
    input_ids = np.asarray([[7]], dtype=np.int64)
    greedy = _hf_generate(m, input_ids, max_length=8, do_sample=False,
                          eos_token_id=128, pad_token_id=128)
    bad = [[7, int(greedy[0, 1])]]   # prompt token + first greedy token

    want = _hf_generate(m, input_ids, max_length=8, do_sample=False,
                        eos_token_id=128, pad_token_id=128,
                        bad_words_ids=bad)
    dc = DecodeConfig(max_length=8, eos_token_id=128, pad_token_id=128,
                      bad_words_ids=tuple(tuple(w) for w in bad))
    got = np.asarray(generate(params, config, jnp.asarray(input_ids),
                              policy=PARITY, dc=dc))
    np.testing.assert_array_equal(got[:, :want.shape[1]], want)

"""Beam search parity vs HF generate + internal consistency.

With zero xattn gates and no media, Flamingo reduces exactly to its GPT-2
trunk, so HF's GPT2LMHeadModel.generate(num_beams=k) is a ground-truth oracle
for our beam implementation.
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
    """(torch GPT2LMHeadModel, our flamingo params with that trunk, config)."""
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
    # zero gates are the init default, but be explicit: xattn must be identity
    for blk in params["xattn"].values():
        blk["alpha_attn"] = jnp.zeros_like(blk["alpha_attn"])
        blk["alpha_ffw"] = jnp.zeros_like(blk["alpha_ffw"])
    return m, params, config


@pytest.mark.parametrize("eos_mode", ["unreachable", "reachable"])
@pytest.mark.parametrize("num_beams", [3])
def test_beam_parity_vs_hf(gpt2_pair, eos_mode, num_beams):
    m, params, config = gpt2_pair
    b, n, max_length = 2, 4, 14
    rs = np.random.RandomState(7)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)

    if eos_mode == "unreachable":
        eos = 128  # the <EOC> row: never argmax-competitive for this seed
    else:
        # pick a token the model actually likes so hypotheses finish early
        with torch.no_grad():
            probe = m.generate(torch.tensor(input_ids), max_length=max_length,
                               num_beams=num_beams, early_stopping=True,
                               pad_token_id=0, eos_token_id=None,
                               do_sample=False)
        eos = int(probe[0, n + 2])

    from transformers import GenerationConfig
    with torch.no_grad():
        want = m.generate(
            torch.tensor(input_ids),
            generation_config=GenerationConfig(
                max_length=max_length, num_beams=num_beams,
                early_stopping=True, do_sample=False,
                eos_token_id=eos, pad_token_id=eos),
        ).numpy()

    dc = DecodeConfig(max_length=max_length, eos_token_id=eos,
                      pad_token_id=eos, num_beams=num_beams)
    got = np.asarray(generate(params, config, jnp.asarray(input_ids),
                              policy=PARITY, dc=dc))
    want_len = want.shape[1]
    np.testing.assert_array_equal(got[:, :want_len], want)
    assert np.all(got[:, want_len:] == eos)


def test_beam_flat_cache_matches_head_layout(gpt2_pair):
    """The flat T-major beam path (ancestry-masked Pallas/XLA read over
    unmoved cache rows, r5) is a layout change only: tokens and scores must
    equal the head-layout lazy path bit-for-bit in PARITY mode."""
    _, params, config = gpt2_pair
    rs = np.random.RandomState(13)
    input_ids = rs.randint(0, 100, (2, 4)).astype(np.int64)
    outs = []
    for flat in (True, False):
        dc = DecodeConfig(max_length=14, eos_token_id=128, pad_token_id=128,
                          num_beams=3, return_scores=True,
                          flat_kv_cache=flat)
        seq, sc = generate(params, config, jnp.asarray(input_ids),
                           policy=PARITY, dc=dc)
        outs.append((np.asarray(seq), np.asarray(sc)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_allclose(outs[0][1], outs[1][1], atol=1e-5)


def test_beam_lazy_matches_gather(gpt2_pair):
    """Ancestor-indexed (lazy) reorder is a layout change only: tokens must
    equal the physical-gather path (and both equal HF via
    test_beam_parity_vs_hf, which runs through the default 'lazy')."""
    _, params, config = gpt2_pair
    b, n, max_length = 2, 4, 16
    rs = np.random.RandomState(11)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)
    for extra in (dict(), dict(prefix_block=8)):
        outs = {}
        for mode in ("gather", "lazy"):
            dc = DecodeConfig(max_length=max_length, eos_token_id=128,
                              pad_token_id=128, num_beams=3,
                              beam_reorder=mode, **extra)
            outs[mode] = np.asarray(generate(
                params, config, jnp.asarray(input_ids), policy=PARITY, dc=dc))
        np.testing.assert_array_equal(outs["gather"], outs["lazy"],
                                      err_msg=f"extra={extra}")


def test_beam1_matches_greedy(gpt2_pair):
    from flamingo_mini_tpu.beam_search import beam_generate
    _, params, config = gpt2_pair
    b, n, max_length = 2, 4, 12
    rs = np.random.RandomState(9)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)
    vf = jnp.zeros((b, 1, config.resampler_num_latents, config.dim_visual),
                   jnp.float32)

    greedy = np.asarray(generate(
        params, config, jnp.asarray(input_ids), policy=PARITY,
        dc=DecodeConfig(max_length=max_length, eos_token_id=999,
                        pad_token_id=0), visual_features=vf))
    dc1 = DecodeConfig(max_length=max_length, eos_token_id=999,
                       pad_token_id=0, num_beams=1)
    beam1 = np.asarray(beam_generate(
        params, config, dc1, PARITY, jnp.asarray(input_ids),
        jnp.zeros((b, n), jnp.int32), jnp.ones((b, n), jnp.int32), vf))
    np.testing.assert_array_equal(greedy, beam1)

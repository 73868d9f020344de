"""Flat-cache decode (Pallas streaming kernel) vs head-layout decode parity.

The flat (b, max_len, d_model) cache + ops/pallas_decode kernel must produce
the same tokens as the head-layout XLA path for greedy and sampled decode,
with left-padded batches, media, and prefix_block segmentation. On CPU the
kernel runs in interpret mode (identical semantics).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flamingo_mini_tpu import FlamingoConfig, FlamingoModel

TINY_LM = dict(vocab_size=256, n_positions=64, n_embd=32, n_layer=2, n_head=4)
TINY_OPT = dict(vocab_size=256, max_position_embeddings=64, hidden_size=32,
                num_hidden_layers=2, num_attention_heads=4, ffn_dim=64,
                word_embed_proj_dim=32)
TINY_VIT = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=1,
                num_attention_heads=4, image_size=32, patch_size=8)


def tiny_model(lm="gpt2"):
    over = TINY_LM if lm == "gpt2" else TINY_OPT
    cfg = FlamingoConfig(
        lm=lm, dim=32, dim_visual=32, xattn_every=1, xattn_dim_head=8,
        xattn_heads=4, resampler_depth=1, resampler_dim_head=8,
        resampler_heads=4, resampler_num_latents=4,
        lm_arch_overrides=over, vision_arch_overrides=TINY_VIT)
    return FlamingoModel(cfg, rng=jax.random.PRNGKey(0))


def _padded_batch(rs, b=3, L=8):
    ids = rs.randint(5, 200, size=(b, L)).astype(np.int32)
    mask = np.ones((b, L), np.int32)
    for r in range(b):
        npad = r  # rows 0,1,2 left-padded by 0,1,2
        ids[r, :npad] = 0
        mask[r, :npad] = 0
    media = np.zeros((b, L), np.int32)
    media[:, 3] = 1  # a media token mid-prompt
    return ids, media, mask


@pytest.mark.parametrize("lm", ["gpt2", "facebook/opt-125m"])
def test_flat_matches_head_layout_greedy(lm):
    m = tiny_model(lm)
    rs = np.random.RandomState(0)
    ids, media, mask = _padded_batch(rs)
    feats = jnp.asarray(rs.randn(3, 1, 4, 32), jnp.float32)
    kw = dict(media_locations=media, attention_mask=mask,
              visual_features=feats, max_length=24,
              eos_token_id=999, pad_token_id=0)
    base = np.asarray(m.generate(ids, flat_kv_cache=False, **kw))
    flat = np.asarray(m.generate(ids, flat_kv_cache=True, **kw))
    np.testing.assert_array_equal(base, flat)


def test_flat_matches_head_layout_sampling_and_prefix_block():
    m = tiny_model("gpt2")
    rs = np.random.RandomState(1)
    ids, media, mask = _padded_batch(rs)
    kw = dict(media_locations=media, attention_mask=mask, max_length=24,
              eos_token_id=999, pad_token_id=0, do_sample=True, top_k=4,
              temperature=1.3, rng=jax.random.PRNGKey(7))
    base = np.asarray(m.generate(ids, flat_kv_cache=False, **kw))
    flat = np.asarray(m.generate(ids, flat_kv_cache=True, **kw))
    np.testing.assert_array_equal(base, flat)
    seg = np.asarray(m.generate(ids, flat_kv_cache=True, prefix_block=8, **kw))
    np.testing.assert_array_equal(base, seg)


def test_flat_early_eos_stops():
    # EOS emitted mid-decode: finished rows pad, loop exits early
    m = tiny_model("gpt2")
    ids = np.arange(6)[None] + 10
    base = np.asarray(m.generate(ids, max_length=20, pad_token_id=0,
                                 flat_kv_cache=False))
    flat = np.asarray(m.generate(ids, max_length=20, pad_token_id=0,
                                 flat_kv_cache=True))
    np.testing.assert_array_equal(base, flat)


def test_int8_kv_cache_overrides_flat():
    # int8 KV keeps the head layout; flat default must not break it
    m = tiny_model("gpt2")
    ids = np.arange(6)[None] + 10
    out = np.asarray(m.generate(ids, max_length=16, eos_token_id=999,
                                pad_token_id=0, int8_kv_cache=True))
    assert out.shape == (1, 16)

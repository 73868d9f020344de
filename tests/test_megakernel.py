"""Decode-step megakernel (ops/pallas_megadecode.py) token parity.

The megakernel path must produce the same greedy tokens as the regular
engine on an int8-quantized model. D must equal 1024 (the kernel's chunk
width), so the test model is thin-but-wide: 2 layers at n_embd=1024.
Runs in Pallas interpret mode on CPU.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flamingo_mini_tpu import FlamingoConfig, FlamingoModel

WIDE_LM = dict(vocab_size=512, n_positions=128, n_embd=1024, n_layer=2,
               n_head=16)
TINY_VIT = dict(hidden_size=64, intermediate_size=128, num_hidden_layers=1,
                num_attention_heads=4, image_size=32, patch_size=8)


@pytest.fixture(scope="module")
def wide_model():
    cfg = FlamingoConfig(
        lm="gpt2", dim=1024, dim_visual=64, xattn_every=2, xattn_dim_head=64,
        xattn_heads=8, resampler_depth=1, resampler_dim_head=16,
        resampler_heads=4, resampler_num_latents=8,
        compute_dtype="bfloat16",
        lm_arch_overrides=WIDE_LM, vision_arch_overrides=TINY_VIT)
    m = FlamingoModel(cfg, rng=jax.random.PRNGKey(0), with_vision=False)
    from flamingo_mini_tpu.ops.quant import (cast_params_bf16,
                                             quantize_gpt2_lm,
                                             quantize_xattn_blocks)
    m.params["lm"] = quantize_gpt2_lm(m.params["lm"])
    m.params["xattn"] = quantize_xattn_blocks(m.params["xattn"])
    m.params = cast_params_bf16(m.params)
    # non-trivial gates so the xattn phases actually contribute
    for blk in m.params["xattn"].values():
        blk["alpha_attn"] = jnp.full_like(blk["alpha_attn"], 0.5)
        blk["alpha_ffw"] = jnp.full_like(blk["alpha_ffw"], 0.3)
    return m


def _inputs(b=4, L=6, seed=0):
    rs = np.random.RandomState(seed)
    ids = rs.randint(5, 500, size=(b, L)).astype(np.int32)
    mask = np.ones((b, L), np.int32)
    ids[1, :2] = 0
    mask[1, :2] = 0
    media = np.zeros((b, L), np.int32)
    media[:, 0] = 1
    feats = jnp.asarray(rs.randn(b, 1, 8, 64), jnp.float32)
    return ids, media, mask, feats


def test_megakernel_matches_engine_greedy(wide_model):
    m = wide_model
    ids, media, mask, feats = _inputs()
    kw = dict(media_locations=media, attention_mask=mask,
              visual_features=feats, max_length=18, eos_token_id=9999,
              pad_token_id=0)
    base = np.asarray(m.generate(ids, megakernel=False, **kw))
    mega = np.asarray(m.generate(ids, megakernel=True, **kw))
    np.testing.assert_array_equal(base, mega)


def test_megakernel_w8a8(wide_model):
    """The w8a8 tier (per-row int8 activations, int8 MXU dots) decodes
    sane, mostly-agreeing greedy tokens. Activation rounding error is
    ~0.4 % relative per mm input, so random-init argmax near-ties can flip
    — exact parity is NOT expected (the tier's fidelity is measured at
    scale by tools/int8_fidelity.py); catastrophic mis-scaling (wrong
    scale broadcast / chunk index) would produce ~chance agreement
    (1/512 per token) and fails the threshold hard."""
    m = wide_model
    ids, media, mask, feats = _inputs(seed=1)
    kw = dict(media_locations=media, attention_mask=mask,
              visual_features=feats, max_length=18, eos_token_id=9999,
              pad_token_id=0)
    base = np.asarray(m.generate(ids, megakernel=True, **kw))
    w8a8 = np.asarray(m.generate(ids, megakernel=True, w8a8=True, **kw))
    assert w8a8.shape == base.shape
    assert ((0 <= w8a8) & (w8a8 < 512)).all()
    agree = (w8a8 == base).mean()
    assert agree >= 0.5, f"w8a8 token agreement collapsed: {agree:.3f}"


def test_w8a8_requires_megakernel(wide_model):
    ids, media, mask, feats = _inputs()
    with pytest.raises(ValueError, match="megakernel"):
        wide_model.generate(ids, media_locations=media, attention_mask=mask,
                            visual_features=feats, max_length=18,
                            eos_token_id=9999, pad_token_id=0, w8a8=True)


def test_megakernel_dp_mesh(wide_model):
    """DP-mesh serving keeps the megakernel: generate(mesh=...) routes the
    whole single-device program through shard_map (one shard per device),
    and greedy tokens equal the single-device megakernel run."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from flamingo_mini_tpu.parallel import create_mesh
    m = wide_model
    ids, media, mask, feats = _inputs(b=8, seed=9)
    kw = dict(media_locations=media, attention_mask=mask,
              visual_features=feats, max_length=18, eos_token_id=9999,
              pad_token_id=0, megakernel=True)
    single = np.asarray(m.generate(ids, **kw))
    mesh = create_mesh((8, 1))
    dp = np.asarray(m.generate(ids, mesh=mesh, **kw))
    np.testing.assert_array_equal(single, dp)


def test_megakernel_multi_image(wide_model):
    """Interleaved multi-image prompts (few-shot serving shape): the flat
    xattn K/V packing and the in-kernel media_time mask must match the
    engine with n_media > 1."""
    m = wide_model
    ids, media, mask, feats = _inputs(seed=7)
    media[:, 3] = 1                      # second image mid-prompt
    rs = np.random.RandomState(11)
    feats = jnp.asarray(rs.randn(4, 2, 8, 64), jnp.float32)
    kw = dict(media_locations=media, attention_mask=mask,
              visual_features=feats, max_length=18, eos_token_id=9999,
              pad_token_id=0)
    base = np.asarray(m.generate(ids, megakernel=False, **kw))
    mega = np.asarray(m.generate(ids, megakernel=True, **kw))
    np.testing.assert_array_equal(base, mega)


def test_megakernel_768_wide():
    """Chunk width generalizes to n_embd (GPT-2-base geometry: D=768,
    n_head=12, Dff=3072) — the flamingo-tiny serving shape."""
    cfg = FlamingoConfig(
        lm="gpt2", dim=768, dim_visual=64, xattn_every=2, xattn_dim_head=64,
        xattn_heads=8, resampler_depth=1, resampler_dim_head=16,
        resampler_heads=4, resampler_num_latents=8,
        compute_dtype="bfloat16",
        lm_arch_overrides=dict(vocab_size=512, n_positions=128, n_embd=768,
                               n_layer=2, n_head=12),
        vision_arch_overrides=TINY_VIT)
    m = FlamingoModel(cfg, rng=jax.random.PRNGKey(1), with_vision=False)
    from flamingo_mini_tpu.ops.quant import (cast_params_bf16,
                                             quantize_gpt2_lm,
                                             quantize_xattn_blocks)
    m.params["lm"] = quantize_gpt2_lm(m.params["lm"])
    m.params["xattn"] = quantize_xattn_blocks(m.params["xattn"])
    m.params = cast_params_bf16(m.params)
    for blk in m.params["xattn"].values():
        blk["alpha_attn"] = jnp.full_like(blk["alpha_attn"], 0.5)
        blk["alpha_ffw"] = jnp.full_like(blk["alpha_ffw"], 0.3)
    ids, media, mask, feats = _inputs(seed=5)
    kw = dict(media_locations=media, attention_mask=mask,
              visual_features=feats, max_length=16, eos_token_id=9999,
              pad_token_id=0)
    base = np.asarray(m.generate(ids, megakernel=False, **kw))
    mega = np.asarray(m.generate(ids, megakernel=True, **kw))
    np.testing.assert_array_equal(base, mega)


def test_megakernel_prefix_block_and_no_media(wide_model):
    m = wide_model
    ids, media, mask, feats = _inputs(seed=3)
    media[:] = 0  # no media at all: xattn must be an exact no-op
    kw = dict(media_locations=media, attention_mask=mask,
              visual_features=feats, max_length=18, eos_token_id=9999,
              pad_token_id=0)
    base = np.asarray(m.generate(ids, megakernel=False, **kw))
    mega = np.asarray(m.generate(ids, megakernel=True, prefix_block=8, **kw))
    np.testing.assert_array_equal(base, mega)

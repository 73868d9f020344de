"""Fused int8 lm_head + greedy argmax kernel (ops/pallas_lmhead.py).

The kernel must be BITWISE-equal to the XLA path it replaces
(models/gpt2.lm_head cast to bf16, then f32 argmax — first index on ties),
including vocab pad rows (zero scale -> zero logits must never win) and
exact-tie cases within and across vocab chunks. Runs in Pallas interpret
mode on CPU; the end-to-end engagement is pinned by generate() equality
with fused_head on/off.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flamingo_mini_tpu.ops.pallas_lmhead import (lm_head_argmax,
                                                 lm_head_argmax_reference,
                                                 pad_head_weights)


def _mk(V=307, D=128, B=8, seed=0):
    rs = np.random.RandomState(seed)
    w8 = jnp.asarray(rs.randint(-127, 128, (V, D)), jnp.int8)
    scale = jnp.asarray(np.abs(rs.randn(V)) * 0.01 + 1e-4, jnp.float32)
    x = jnp.asarray(rs.randn(B, D) * 0.1, jnp.bfloat16)
    return w8, scale, x


@pytest.mark.parametrize("block_v", [128, 256])
def test_matches_reference(block_v):
    w8, scale, x = _mk()
    V = w8.shape[0]
    p = pad_head_weights({"w8": w8, "scale": scale}, block_v)
    assert p["w8"].shape[0] % block_v == 0
    got = lm_head_argmax(p["w8"], p["scale"], x, n_valid=V, block_v=block_v)
    ref = lm_head_argmax_reference(w8, scale, x, V)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_ties_pick_first_index():
    """Duplicate vocab rows force exact logit ties across chunks; argmax
    semantics (lowest index) must hold both in-chunk and cross-chunk."""
    w8, scale, x = _mk(seed=3)
    # row 5 (chunk 0) duplicated at 100 (same chunk at bv=256, different
    # chunk at bv=128) and at 290 (always a later chunk)
    for dup in (100, 290):
        w8d = w8.at[dup].set(w8[5])
        sd = scale.at[dup].set(scale[5])
        for bv in (128, 256):
            p = pad_head_weights({"w8": w8d, "scale": sd}, bv)
            got = lm_head_argmax(p["w8"], p["scale"], x,
                                 n_valid=w8.shape[0], block_v=bv)
            ref = lm_head_argmax_reference(w8d, sd, x, w8.shape[0])
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pad_rows_never_win():
    """All-negative real logits: the zero-scale pad rows' 0.0 logits would
    win an unmasked max."""
    V, D, B = 130, 128, 4
    rs = np.random.RandomState(1)
    # weights ~ -x so every real logit is strongly negative
    x = jnp.asarray(np.abs(rs.randn(B, D)) + 0.5, jnp.bfloat16)
    w8 = jnp.asarray(-rs.randint(1, 128, (V, D)), jnp.int8)
    scale = jnp.asarray(np.abs(rs.randn(V)) * 0.01 + 1e-4, jnp.float32)
    p = pad_head_weights({"w8": w8, "scale": scale}, 128)
    got = lm_head_argmax(p["w8"], p["scale"], x, n_valid=V, block_v=128)
    ref = lm_head_argmax_reference(w8, scale, x, V)
    assert (np.asarray(got) < V).all()
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_generate_fused_head_equals_xla(megakernel_wide_model):
    """End-to-end: megakernel greedy decode with the fused head must emit
    the same tokens as the XLA lm_head+argmax path (fused_head=False)."""
    m, ids, media, mask, feats = megakernel_wide_model
    kw = dict(media_locations=media, attention_mask=mask,
              visual_features=feats, max_length=16, eos_token_id=9999,
              pad_token_id=0, megakernel=True)
    fused = np.asarray(m.generate(ids, fused_head=True, **kw))
    plain = np.asarray(m.generate(ids, fused_head=False, **kw))
    np.testing.assert_array_equal(fused, plain)


@pytest.fixture(scope="module")
def megakernel_wide_model():
    """Thin-but-wide (D=1024) int8 model, as test_megakernel.py uses."""
    from flamingo_mini_tpu import FlamingoConfig, FlamingoModel
    from flamingo_mini_tpu.ops.quant import (cast_params_bf16,
                                             quantize_gpt2_lm,
                                             quantize_xattn_blocks)
    cfg = FlamingoConfig(
        lm="gpt2", dim=1024, dim_visual=64, xattn_every=2, xattn_dim_head=64,
        xattn_heads=8, resampler_depth=1, resampler_dim_head=16,
        resampler_heads=4, resampler_num_latents=8,
        compute_dtype="bfloat16",
        lm_arch_overrides=dict(vocab_size=512, n_positions=128, n_embd=1024,
                               n_layer=2, n_head=16),
        vision_arch_overrides=dict(hidden_size=64, intermediate_size=128,
                                   num_hidden_layers=1,
                                   num_attention_heads=4, image_size=32,
                                   patch_size=8))
    m = FlamingoModel(cfg, rng=jax.random.PRNGKey(0), with_vision=False)
    m.params["lm"] = quantize_gpt2_lm(m.params["lm"])
    m.params["xattn"] = quantize_xattn_blocks(m.params["xattn"])
    m.params = cast_params_bf16(m.params)
    for blk in m.params["xattn"].values():
        blk["alpha_attn"] = jnp.full_like(blk["alpha_attn"], 0.5)
        blk["alpha_ffw"] = jnp.full_like(blk["alpha_ffw"], 0.3)
    rs = np.random.RandomState(7)
    b, L = 4, 6
    ids = rs.randint(5, 500, size=(b, L)).astype(np.int32)
    mask = np.ones((b, L), np.int32)
    ids[1, :2] = 0
    mask[1, :2] = 0
    media = np.zeros((b, L), np.int32)
    media[:, 0] = 1
    feats = jnp.asarray(rs.randn(b, 1, 8, 64), jnp.float32)
    return m, ids, media, mask, feats

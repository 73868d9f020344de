"""bf16 numerical robustness regressions.

float32's finfo.min overflows to -inf when cast to bfloat16, so any fully
masked attention row (left-pad queries, text_time beyond the media count)
used to softmax to NaN and 0*NaN-poison the whole batch. The fills are now
dtype-aware (matching the torch reference's masked_fill(-finfo(sim.dtype).max))
and clamped after bias addition.
"""
import numpy as np

import jax
import jax.numpy as jnp

from flamingo_mini_tpu import FlamingoConfig, FlamingoModel, FlamingoProcessor
from flamingo_mini_tpu.tokenizer import build_toy_tokenizer

TINY_LM = dict(vocab_size=512, n_positions=64, n_embd=32, n_layer=2, n_head=4)
TINY_VIT = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=1,
                num_attention_heads=4, image_size=32, patch_size=8)


def bf16_config():
    return FlamingoConfig(
        lm="gpt2", dim=32, dim_visual=32, xattn_every=1, xattn_dim_head=8,
        xattn_heads=4, resampler_depth=1, resampler_dim_head=8,
        resampler_heads=4, resampler_num_latents=4,
        compute_dtype="bfloat16",
        lm_arch_overrides=TINY_LM, vision_arch_overrides=TINY_VIT)


def test_bf16_forward_finite_with_padding_and_media():
    """Right-padded training batch + media: loss must be finite in bf16."""
    cfg = bf16_config()
    model = FlamingoModel(cfg, rng=jax.random.PRNGKey(0))
    b, n = 4, 16
    rs = np.random.RandomState(0)
    ids = rs.randint(3, 100, (b, n)).astype(np.int32)
    mask = np.ones((b, n), np.int32)
    mask[:, 10:] = 0                      # right padding
    media = np.zeros((b, n), np.int32)
    media[:, 1] = 1
    px = jnp.zeros((b, 1, 3, 32, 32), jnp.bfloat16)
    out = model.forward(ids, media_locations=media, attention_mask=mask,
                        pixel_values=px, labels=ids)
    assert np.isfinite(float(out.loss)), out.loss
    assert bool(jnp.isfinite(out.logits).all())


def test_bf16_forward_finite_when_text_time_exceeds_media():
    """A row whose media_locations count exceeds the supplied images (the
    fully-masked xattn row case) must stay finite, as in the torch reference
    under fp16."""
    cfg = bf16_config()
    model = FlamingoModel(cfg, rng=jax.random.PRNGKey(0))
    b, n = 2, 12
    ids = np.full((b, n), 7, np.int32)
    media = np.zeros((b, n), np.int32)
    media[:, 0] = 1
    media[:, 4] = 1                       # 2 tags but only 1 image supplied
    px = jnp.zeros((b, 1, 3, 32, 32), jnp.bfloat16)
    out = model.forward(ids, media_locations=media,
                        attention_mask=np.ones((b, n), np.int32),
                        pixel_values=px, labels=ids)
    assert np.isfinite(float(out.loss)), out.loss


def test_bf16_leftpad_generate_finite():
    """Left-padded prompts (fully-masked pad query rows) decode to valid
    tokens in bf16."""
    cfg = bf16_config()
    model = FlamingoModel(cfg, rng=jax.random.PRNGKey(0))
    ids = np.array([[511, 511, 7, 8], [5, 6, 7, 8]], np.int32)
    mask = np.array([[0, 0, 1, 1], [1, 1, 1, 1]], np.int32)
    px = jnp.zeros((2, 1, 3, 32, 32), jnp.bfloat16)
    media = np.zeros((2, 4), np.int32)
    media[:, 0] = 1
    out = np.asarray(model.generate(
        ids, media_locations=media, attention_mask=mask, pixel_values=px,
        max_length=10, eos_token_id=511, pad_token_id=511))
    gen = out[:, 4:]                       # generated region only
    assert ((0 <= gen) & (gen < 513)).all(), gen


def test_media_locations_or_not_sum():
    """With a degenerate vocab where '<' and ' <' share one id, tags must
    still be marked once (OR), not double-counted (sum) — double counting
    pushed text_time past the media count."""
    cfg = bf16_config()
    # no '<' word -> ' <' has no merge -> both leq variants end on the same id
    tok = build_toy_tokenizer(["image", "a", "cat"])
    proc = FlamingoProcessor(cfg, tokenizer=tok)
    assert proc.leq_ids[0] == proc.leq_ids[1]  # the degenerate case
    ids, media, _ = proc.encode_text("<image>a cat")
    assert int(np.asarray(media).max()) == 1
    assert int(np.asarray(media).sum()) == 1

"""int8 weight-only quantization: algebra, model quality, decode paths."""
import numpy as np

import jax
import jax.numpy as jnp

from flamingo_mini_tpu import FlamingoConfig, FlamingoModel
from flamingo_mini_tpu.generation import DecodeConfig, generate
from flamingo_mini_tpu.ops.layers import PARITY, linear
from flamingo_mini_tpu.ops.quant import quantize_linear, quantize_weight

TINY_LM = dict(vocab_size=256, n_positions=64, n_embd=32, n_layer=2, n_head=4)
TINY_VIT = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=1,
                num_attention_heads=4, image_size=32, patch_size=8)


def tiny_config(**kw):
    base = dict(lm="gpt2", dim=32, dim_visual=32, xattn_every=1,
                xattn_dim_head=8, xattn_heads=4, resampler_depth=1,
                resampler_dim_head=8, resampler_heads=4,
                resampler_num_latents=4, lm_arch_overrides=TINY_LM,
                vision_arch_overrides=TINY_VIT)
    base.update(kw)
    return FlamingoConfig(**base)


def test_quantized_linear_close():
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(64, 128).astype(np.float32)) * 0.1
    x = jnp.asarray(rs.randn(4, 64).astype(np.float32))
    p = {"w": w, "b": jnp.asarray(rs.randn(128).astype(np.float32))}
    q = quantize_linear(p)
    assert q["w8"].dtype == jnp.int8
    y = linear(x, p, PARITY)
    yq = linear(x, q, PARITY)
    # per-channel int8: relative error ~1/127 of channel absmax
    rel = float(jnp.max(jnp.abs(y - yq)) / jnp.max(jnp.abs(y)))
    assert rel < 0.02, rel


def test_quantize_weight_per_row():
    rs = np.random.RandomState(1)
    w = jnp.asarray(rs.randn(16, 8).astype(np.float32))
    q = quantize_weight(w, axis=1)   # per-row
    deq = q["w8"].astype(jnp.float32) * q["scale"][:, None]
    assert float(jnp.max(jnp.abs(deq - w))) < float(jnp.max(jnp.abs(w))) / 100


def test_quantized_model_generates_similar():
    """int8 decode runs and mostly agrees with fp32 greedy on a tiny model."""
    cfg = tiny_config()
    model = FlamingoModel(cfg, rng=jax.random.PRNGKey(0))
    rs = np.random.RandomState(2)
    ids = rs.randint(0, 200, (2, 5))
    ml = np.zeros((2, 5), np.int32)
    ml[:, 0] = 1
    px = rs.randn(2, 1, 3, 32, 32).astype(np.float32)

    out_fp = np.asarray(model.generate(ids, media_locations=ml,
                                       pixel_values=px, max_length=12,
                                       eos_token_id=999, pad_token_id=0))
    model.quantize_int8()
    out_q8 = np.asarray(model.generate(ids, media_locations=ml,
                                       pixel_values=px, max_length=12,
                                       eos_token_id=999, pad_token_id=0))
    assert out_q8.shape == out_fp.shape
    # prompt identical; generated tokens should mostly agree on a tiny model
    np.testing.assert_array_equal(out_q8[:, :5], out_fp[:, :5])
    agreement = (out_q8[:, 5:] == out_fp[:, 5:]).mean()
    assert agreement >= 0.5, (agreement, out_fp, out_q8)

    # forward + loss path also works quantized
    out = model.forward(ids, media_locations=ml, pixel_values=px, labels=ids)
    assert np.isfinite(float(out.loss))


def test_int8_kv_cache_next_logits_close():
    """Prefill with an int8 KV cache: the next-token logits must match the
    fp cache within per-position int8 error (~1/127 of absmax)."""
    from flamingo_mini_tpu.generation import _prefill
    from flamingo_mini_tpu.models import flamingo as F
    from dataclasses import replace

    cfg = tiny_config()
    model = FlamingoModel(cfg, rng=jax.random.PRNGKey(0))
    rs = np.random.RandomState(4)
    b, n = 2, 6
    ids = jnp.asarray(rs.randint(0, 200, (b, n)), jnp.int32)
    ml = jnp.zeros((b, n), jnp.int32).at[:, 0].set(1)
    am = jnp.ones((b, n), jnp.int32)
    vf = jnp.asarray(rs.randn(b, 1, cfg.resampler_num_latents, cfg.dim_visual),
                     jnp.float32)
    dc = DecodeConfig(max_length=12, eos_token_id=999, pad_token_id=0)
    logits_fp, _, _ = _prefill(model.params, cfg, dc, PARITY, ids, ml, am, vf)
    dc8 = replace(dc, int8_kv_cache=True)
    logits_q8, _, st = _prefill(model.params, cfg, dc8, PARITY, ids, ml, am, vf)
    assert "k8" in st["cache"][0]
    err = float(jnp.max(jnp.abs(logits_fp - logits_q8)))
    ref = float(jnp.max(jnp.abs(logits_fp)))
    assert err < 0.05 * ref + 0.05, (err, ref)


def test_prefix_block_decode_exact():
    """Live-prefix segmented decode is a pure layout optimization: greedy
    tokens must EXACTLY equal the full-cache path (masked slots carry zero
    softmax weight either way)."""
    cfg = tiny_config()
    model = FlamingoModel(cfg, rng=jax.random.PRNGKey(0))
    rs = np.random.RandomState(5)
    ids = rs.randint(0, 200, (2, 5))
    ml = np.zeros((2, 5), np.int32)
    ml[:, 0] = 1
    px = rs.randn(2, 1, 3, 32, 32).astype(np.float32)
    kw = dict(media_locations=ml, pixel_values=px, max_length=24,
              eos_token_id=999, pad_token_id=0)
    full = np.asarray(model.generate(ids, **kw))
    seg = np.asarray(model.generate(ids, prefix_block=8, **kw))
    np.testing.assert_array_equal(full, seg)


def test_prefix_block_with_int8_kv_and_weights():
    """The combined fast-decode deployment (int8 weights + int8 KV +
    live-prefix) runs and stays in-vocab."""
    cfg = tiny_config()
    model = FlamingoModel(cfg, rng=jax.random.PRNGKey(0)).quantize_int8()
    rs = np.random.RandomState(6)
    ids = rs.randint(0, 200, (2, 5))
    px = rs.randn(2, 1, 3, 32, 32).astype(np.float32)
    ml = np.zeros((2, 5), np.int32)
    ml[:, 0] = 1
    out = np.asarray(model.generate(
        ids, media_locations=ml, pixel_values=px, max_length=24,
        eos_token_id=999, pad_token_id=0, int8_kv_cache=True, prefix_block=8))
    assert out.shape == (2, 24)
    assert ((0 <= out) & (out < 257)).all()


def test_int8_kv_beam_runs():
    cfg = tiny_config()
    model = FlamingoModel(cfg, rng=jax.random.PRNGKey(0))
    rs = np.random.RandomState(7)
    ids = rs.randint(0, 200, (1, 4))
    out = model.generate(ids, max_length=10, num_beams=3, eos_token_id=999,
                         pad_token_id=0, int8_kv_cache=True)
    assert np.asarray(out).shape == (1, 10)


def test_quantized_beam_runs():
    cfg = tiny_config()
    model = FlamingoModel(cfg, rng=jax.random.PRNGKey(0)).quantize_int8()
    rs = np.random.RandomState(3)
    ids = rs.randint(0, 200, (1, 4))
    out = model.generate(ids, max_length=10, num_beams=3,
                         eos_token_id=999, pad_token_id=0)
    assert np.asarray(out).shape == (1, 10)


def test_beam_prefix_block_exact():
    """Segmented live-prefix beam decode (prefix-limited cache gather +
    kv_limit attention) is a pure layout change: tokens must EXACTLY equal
    the full-cache beam path."""
    cfg = tiny_config()
    model = FlamingoModel(cfg, rng=jax.random.PRNGKey(0))
    rs = np.random.RandomState(8)
    ids = rs.randint(0, 200, (2, 5))
    ml = np.zeros((2, 5), np.int32)
    ml[:, 0] = 1
    px = rs.randn(2, 1, 3, 32, 32).astype(np.float32)
    kw = dict(media_locations=ml, pixel_values=px, max_length=24,
              eos_token_id=999, pad_token_id=0, num_beams=3)
    full = np.asarray(model.generate(ids, **kw))
    seg = np.asarray(model.generate(ids, prefix_block=8, **kw))
    np.testing.assert_array_equal(full, seg)
    seg1 = np.asarray(model.generate(ids, prefix_block=64, **kw))
    np.testing.assert_array_equal(full, seg1)


def test_beam_lazy_vs_gather_int8_kv():
    """Lazy reorder never rewrites the quantized cache, so int8-KV beam decode
    must match the gather path token-for-token (gather moves int8 rows without
    requantizing — both layouts read identical dequantized values)."""
    cfg = tiny_config()
    model = FlamingoModel(cfg, rng=jax.random.PRNGKey(0))
    rs = np.random.RandomState(13)
    ids = rs.randint(0, 200, (2, 4))
    kw = dict(max_length=20, num_beams=3, eos_token_id=999, pad_token_id=0,
              int8_kv_cache=True, prefix_block=8)
    g = np.asarray(model.generate(ids, beam_reorder="gather", **kw))
    l = np.asarray(model.generate(ids, beam_reorder="lazy", **kw))
    np.testing.assert_array_equal(g, l)


def test_beam_prefix_block_int8_kv_runs():
    cfg = tiny_config()
    model = FlamingoModel(cfg, rng=jax.random.PRNGKey(0)).quantize_int8()
    rs = np.random.RandomState(9)
    ids = rs.randint(0, 200, (1, 4))
    out = model.generate(ids, max_length=20, num_beams=3, eos_token_id=999,
                         pad_token_id=0, int8_kv_cache=True, prefix_block=8)
    assert np.asarray(out).shape == (1, 20)

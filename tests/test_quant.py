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


def test_quantized_beam_runs():
    cfg = tiny_config()
    model = FlamingoModel(cfg, rng=jax.random.PRNGKey(0)).quantize_int8()
    rs = np.random.RandomState(3)
    ids = rs.randint(0, 200, (1, 4))
    out = model.generate(ids, max_length=10, num_beams=3,
                         eos_token_id=999, pad_token_id=0)
    assert np.asarray(out).shape == (1, 10)

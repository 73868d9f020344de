"""Pallas fused-attention kernel: numerics vs the XLA path + gradient flow.

Tight-tolerance tests pin interpret=True (they verify kernel LOGIC in true
fp32); on real TPU Mosaic lowers fp32 dots at ~bf16 effective precision, so
on-device behavior is covered by the loose-tolerance full-model test below
and by bench.py with use_pallas.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flamingo_mini_tpu.ops.attention import attend

# Tight-tolerance logic tests need true-fp32 execution on BOTH sides; on TPU
# backends even interpret-mode jnp ops run at the device's default (bf16-ish)
# matmul precision. These tests run in the CPU-pinned suite (see conftest);
# on-device kernel behavior is covered by the loose-tolerance full-model test
# and bench.py.
tight = pytest.mark.skipif(
    jax.default_backend() in ("tpu", "axon"),
    reason="tight-tolerance kernel-logic tests require CPU fp32 execution")
from flamingo_mini_tpu.ops.pallas_attn import fused_attention


def _rand(shape, seed):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape).astype(np.float32))


@tight
@pytest.mark.parametrize("causal", [False, True])
def test_matches_xla(causal):
    b, h, n, d = 2, 3, 40, 16
    q, k, v = _rand((b, h, n, d), 0), _rand((b, h, n, d), 1), _rand((b, h, n, d), 2)
    scale = d ** -0.5

    got = fused_attention(q, k, v, scale=scale, causal=causal, block_q=16,
                          interpret=True)
    mask = None
    if causal:
        mask = jnp.tril(jnp.ones((n, n), bool))[None, None]
    want = attend(q * scale, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@tight
def test_row_bias_padding():
    """Padding via row_bias == additive mask in the XLA path."""
    b, h, n, d = 2, 2, 24, 8
    q, k, v = _rand((b, h, n, d), 3), _rand((b, h, n, d), 4), _rand((b, h, n, d), 5)
    pad = np.ones((b, n), np.int32)
    pad[0, 20:] = 0
    neg = np.finfo(np.float32).min
    row = jnp.asarray(np.where(pad, 0.0, neg).astype(np.float32))

    got = fused_attention(q, k, v, scale=0.3, causal=True, row_bias=row,
                          block_q=8, interpret=True)
    mask = jnp.tril(jnp.ones((n, n), bool))[None, None]
    bias = row[:, None, None, :]
    want = attend(q * 0.3, k, v, mask=mask, bias=bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@tight
def test_gradients_match_xla():
    b, h, n, d = 1, 2, 16, 8
    q, k, v = _rand((b, h, n, d), 6), _rand((b, h, n, d), 7), _rand((b, h, n, d), 8)
    scale = d ** -0.5

    def loss_pallas(q, k, v):
        return jnp.sum(fused_attention(q, k, v, scale=scale, causal=True,
                                       block_q=8, interpret=True) ** 2)

    def loss_xla(q, k, v):
        mask = jnp.tril(jnp.ones((n, n), bool))[None, None]
        return jnp.sum(attend(q * scale, k, v, mask=mask) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_full_model_pallas_policy_close_to_xla():
    """FAST_PALLAS forward ~== FAST forward on a tiny Flamingo."""
    from flamingo_mini_tpu.configuration_flamingo import FlamingoConfig
    from flamingo_mini_tpu.models.flamingo import forward, init_flamingo
    from flamingo_mini_tpu.ops.layers import FAST, FAST_PALLAS

    config = FlamingoConfig(
        lm="gpt2", dim=32, dim_visual=32, xattn_every=2, xattn_dim_head=8,
        xattn_heads=4, resampler_depth=1, resampler_dim_head=8,
        resampler_heads=4, resampler_num_latents=4,
        lm_arch_overrides=dict(vocab_size=128, n_positions=64, n_embd=32,
                               n_layer=2, n_head=4),
        vision_arch_overrides=dict(hidden_size=32, intermediate_size=64,
                                   num_hidden_layers=1, num_attention_heads=4,
                                   image_size=32, patch_size=8))
    params = init_flamingo(jax.random.PRNGKey(0), config)
    for blk in params["xattn"].values():
        blk["alpha_attn"] = jnp.ones((1,)) * 0.5

    rs = np.random.RandomState(0)
    ids = jnp.asarray(rs.randint(0, 100, (2, 10)))
    ml = jnp.zeros((2, 10), jnp.int32).at[:, 0].set(1)
    px = jnp.asarray(rs.randn(2, 1, 3, 32, 32).astype(np.float32))

    out_fast = forward(params, config, ids, policy=FAST,
                       media_locations=ml, pixel_values=px)
    out_pallas = forward(params, config, ids, policy=FAST_PALLAS,
                         media_locations=ml, pixel_values=px)
    # bf16 path: agreement to bf16 rounding
    np.testing.assert_allclose(
        np.asarray(out_fast.logits, np.float32),
        np.asarray(out_pallas.logits, np.float32), atol=0.15, rtol=0.1)


@tight
@pytest.mark.parametrize("causal", [False, True])
def test_streaming_flash_matches_xla(causal):
    """Online-softmax streaming variant == XLA over multiple kv blocks."""
    b, h, n, d = 1, 2, 96, 16
    q, k, v = _rand((b, h, n, d), 10), _rand((b, h, n, d), 11), _rand((b, h, n, d), 12)
    scale = d ** -0.5
    got = fused_attention(q, k, v, scale=scale, causal=causal, block_q=32,
                          streaming=True, interpret=True)
    mask = jnp.tril(jnp.ones((n, n), bool))[None, None] if causal else None
    want = attend(q * scale, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@tight
def test_streaming_flash_row_bias_and_padding():
    """Streaming + padding row bias + non-multiple kv length."""
    b, h, n_q, n_kv, d = 2, 2, 24, 40, 8
    q = _rand((b, h, n_q, d), 13)
    k = _rand((b, h, n_kv, d), 14)
    v = _rand((b, h, n_kv, d), 15)
    pad = np.ones((b, n_kv), np.int32)
    pad[0, 33:] = 0
    neg = np.finfo(np.float32).min
    row = jnp.asarray(np.where(pad, 0.0, neg).astype(np.float32))

    got = fused_attention(q, k, v, scale=0.4, row_bias=row, block_q=16,
                          streaming=True, interpret=True)
    want = attend(q * 0.4, k, v, bias=row[:, None, None, :])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@tight
def test_streaming_flash_gradients():
    b, h, n, d = 1, 2, 64, 8
    q, k, v = _rand((b, h, n, d), 16), _rand((b, h, n, d), 17), _rand((b, h, n, d), 18)
    scale = d ** -0.5
    g1 = jax.grad(lambda q_: jnp.sum(fused_attention(
        q_, k, v, scale=scale, causal=True, block_q=16, streaming=True,
        interpret=True) ** 2))(q)
    g2 = jax.grad(lambda q_: jnp.sum(attend(
        q_ * scale, k, v, mask=jnp.tril(jnp.ones((n, n), bool))[None, None]) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-4, rtol=1e-4)

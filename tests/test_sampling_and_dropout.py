"""Sampling-filter parity vs HF logits warpers + trunk dropout behavior."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from flamingo_mini_tpu.configuration_flamingo import FlamingoConfig
from flamingo_mini_tpu.models import flamingo
from flamingo_mini_tpu.ops.layers import PARITY

TINY_LM = dict(vocab_size=128, n_positions=64, n_embd=32, n_layer=2, n_head=4)
TINY_VIT = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=1,
                num_attention_heads=4, image_size=32, patch_size=8)


def _apply_our_filters(logits, dc):
    from flamingo_mini_tpu.generation import apply_logit_filters
    return np.asarray(apply_logit_filters(
        jnp.asarray(logits), temperature=dc["temperature"],
        top_k=dc["top_k"], top_p=dc["top_p"]))


@pytest.mark.parametrize("top_k,top_p,temp", [
    (5, 1.0, 1.0), (0, 0.9, 1.0), (10, 0.8, 0.7), (3, 0.5, 1.3),
])
def test_filter_masks_match_hf_warpers(top_k, top_p, temp):
    """The SET of allowed tokens after top-k/top-p/temperature filtering must
    equal HF's TemperatureLogitsWarper + TopK + TopP chain."""
    from transformers.generation.logits_process import (
        TemperatureLogitsWarper, TopKLogitsWarper, TopPLogitsWarper)
    rs = np.random.RandomState(0)
    logits = rs.randn(4, 64).astype(np.float32) * 3

    t = torch.tensor(logits)
    if temp != 1.0:
        t = TemperatureLogitsWarper(temp)(None, t)
    if top_k > 0:
        t = TopKLogitsWarper(top_k)(None, t)
    if top_p < 1.0:
        t = TopPLogitsWarper(top_p)(None, t)
    hf_allowed = torch.isfinite(t).numpy()

    ours = _apply_our_filters(logits, dict(top_k=top_k, top_p=top_p,
                                           temperature=temp))
    ours_allowed = ours > np.finfo(np.float32).min / 2
    np.testing.assert_array_equal(ours_allowed, hf_allowed)
    # and the surviving logits themselves match (same temperature scaling)
    np.testing.assert_allclose(np.where(ours_allowed, ours, 0),
                               np.where(hf_allowed, t.numpy(), 0),
                               atol=1e-5, rtol=1e-5)


def _tiny():
    config = FlamingoConfig(
        lm="gpt2", dim=32, dim_visual=32, xattn_every=2, xattn_dim_head=8,
        xattn_heads=4, resampler_depth=1, resampler_dim_head=8,
        resampler_heads=4, resampler_num_latents=4,
        lm_arch_overrides=TINY_LM, vision_arch_overrides=TINY_VIT)
    params = flamingo.init_flamingo(jax.random.PRNGKey(0), config)
    rs = np.random.RandomState(1)
    ids = jnp.asarray(rs.randint(0, 100, (2, 10)))
    ml = jnp.zeros((2, 10), jnp.int32).at[:, 0].set(1)
    px = jnp.asarray(rs.randn(2, 1, 3, 32, 32).astype(np.float32))
    return config, params, ids, ml, px


def test_dropout_rng_gated():
    """No rng -> deterministic eval; rng -> stochastic but finite; different
    rngs -> different losses; same rng -> same loss."""
    config, params, ids, ml, px = _tiny()
    base = flamingo.forward(params, config, ids, policy=PARITY,
                            media_locations=ml, pixel_values=px, labels=ids)
    base2 = flamingo.forward(params, config, ids, policy=PARITY,
                             media_locations=ml, pixel_values=px, labels=ids)
    assert float(base.loss) == float(base2.loss)

    r1 = flamingo.forward(params, config, ids, policy=PARITY,
                          media_locations=ml, pixel_values=px, labels=ids,
                          dropout_rng=jax.random.PRNGKey(1))
    r1b = flamingo.forward(params, config, ids, policy=PARITY,
                           media_locations=ml, pixel_values=px, labels=ids,
                           dropout_rng=jax.random.PRNGKey(1))
    r2 = flamingo.forward(params, config, ids, policy=PARITY,
                          media_locations=ml, pixel_values=px, labels=ids,
                          dropout_rng=jax.random.PRNGKey(2))
    assert float(r1.loss) == float(r1b.loss)        # same rng deterministic
    assert float(r1.loss) != float(r2.loss)         # different rng differs
    assert float(r1.loss) != float(base.loss)       # dropout changes loss
    assert np.isfinite(float(r1.loss)) and np.isfinite(float(r2.loss))


def test_opt_dropout_rng_gated():
    config = FlamingoConfig(
        lm="facebook/opt-125m", dim=32, dim_visual=32, xattn_every=2,
        xattn_dim_head=8, xattn_heads=4, resampler_depth=1,
        resampler_dim_head=8, resampler_heads=4, resampler_num_latents=4,
        lm_arch_overrides=dict(vocab_size=128, max_position_embeddings=64,
                               hidden_size=32, ffn_dim=64,
                               num_hidden_layers=2, num_attention_heads=4,
                               word_embed_proj_dim=32),
        vision_arch_overrides=TINY_VIT)
    params = flamingo.init_flamingo(jax.random.PRNGKey(0), config)
    rs = np.random.RandomState(1)
    ids = jnp.asarray(rs.randint(0, 100, (2, 8)))
    base = flamingo.forward(params, config, ids, policy=PARITY, labels=ids)
    drop = flamingo.forward(params, config, ids, policy=PARITY, labels=ids,
                            dropout_rng=jax.random.PRNGKey(3))
    assert float(base.loss) != float(drop.loss)
    assert np.isfinite(float(drop.loss))


@pytest.mark.parametrize("kw", [
    dict(min_p=0.2),
    dict(min_p=0.05),
    dict(typical_p=0.9),
    dict(typical_p=0.5),
    dict(epsilon_cutoff=0.02),
    dict(eta_cutoff=0.01),
    dict(top_k=20, typical_p=0.8),
    dict(temperature=0.7, min_p=0.1, epsilon_cutoff=0.01),
])
def test_extended_warpers_match_hf(kw):
    """min_p / typical_p / epsilon_cutoff / eta_cutoff vs the HF warpers,
    chained in HF's _get_logits_processor order."""
    from transformers.generation.logits_process import (
        EpsilonLogitsWarper, EtaLogitsWarper, MinPLogitsWarper,
        TemperatureLogitsWarper, TopKLogitsWarper, TypicalLogitsWarper)
    from flamingo_mini_tpu.generation import apply_logit_filters

    full = dict(temperature=1.0, top_k=0, top_p=1.0, min_p=0.0,
                typical_p=1.0, epsilon_cutoff=0.0, eta_cutoff=0.0)
    full.update(kw)
    rs = np.random.RandomState(7)
    logits = rs.randn(5, 64).astype(np.float32) * 3

    t = torch.tensor(logits)
    if full["temperature"] != 1.0:
        t = TemperatureLogitsWarper(full["temperature"])(None, t)
    if full["top_k"] > 0:
        t = TopKLogitsWarper(full["top_k"])(None, t)
    if full["min_p"] > 0:
        t = MinPLogitsWarper(full["min_p"])(None, t)
    if full["typical_p"] < 1.0:
        t = TypicalLogitsWarper(mass=full["typical_p"])(None, t)
    if full["epsilon_cutoff"] > 0:
        t = EpsilonLogitsWarper(full["epsilon_cutoff"])(None, t)
    if full["eta_cutoff"] > 0:
        # HF's EtaLogitsWarper wants a python float; device arg optional
        t = EtaLogitsWarper(full["eta_cutoff"])(None, t)
    hf_allowed = torch.isfinite(t).numpy()

    ours = np.asarray(apply_logit_filters(jnp.asarray(logits), **full))
    ours_allowed = ours > np.finfo(np.float32).min / 2
    np.testing.assert_array_equal(ours_allowed, hf_allowed)
    np.testing.assert_allclose(np.where(ours_allowed, ours, 0),
                               np.where(hf_allowed, t.numpy(), 0),
                               atol=1e-5, rtol=1e-5)

"""Contrastive search invariants.

transformers >= 4.50 removed contrastive search from core (this env ships
4.57), so there is no importable HF oracle; these tests pin the published
algorithm's invariants instead (see contrastive.py's module docstring).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flamingo_mini_tpu import FlamingoConfig, FlamingoModel
from flamingo_mini_tpu.generation import DecodeConfig

TINY_LM = dict(vocab_size=128, n_positions=64, n_embd=32, n_layer=2, n_head=4)
TINY_VIT = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=1,
                num_attention_heads=4, image_size=32, patch_size=8)


@pytest.fixture(scope="module")
def model():
    cfg = FlamingoConfig(
        lm="gpt2", dim=32, dim_visual=32, xattn_every=1, xattn_dim_head=8,
        xattn_heads=4, resampler_depth=1, resampler_dim_head=8,
        resampler_heads=4, resampler_num_latents=4,
        lm_arch_overrides=TINY_LM, vision_arch_overrides=TINY_VIT)
    return FlamingoModel(cfg, rng=jax.random.PRNGKey(0))


def _inputs(b=2, n=5, seed=0):
    rs = np.random.RandomState(seed)
    ids = rs.randint(0, 100, (b, n)).astype(np.int32)
    media = np.zeros((b, n), np.int32)
    media[:, 0] = 1
    px = rs.randn(b, 1, 3, 32, 32).astype(np.float32)
    return ids, media, px


def test_alpha_zero_equals_greedy(model):
    """score = (1-0)*p - 0*pen = p, and argmax_p over the top-k candidates
    IS the greedy token — alpha=0 must reproduce greedy exactly."""
    ids, media, px = _inputs()
    kw = dict(media_locations=media, pixel_values=px, max_length=18,
              eos_token_id=10**9, pad_token_id=0)
    greedy = np.asarray(model.generate(ids, **kw))
    # penalty_alpha=0 would dispatch to plain greedy at the API level, so
    # call the contrastive impl directly: the argmax-p candidate is always
    # in the top-k set, so alpha=0 must reproduce greedy token-for-token
    from flamingo_mini_tpu.contrastive import _contrastive_impl
    dc = DecodeConfig(max_length=18, eos_token_id=10**9, pad_token_id=0,
                      top_k=4)
    got = np.asarray(_contrastive_impl(
        model.params, model.config, dc, model.policy, jnp.asarray(ids),
        jnp.asarray(media), jnp.ones_like(jnp.asarray(ids)), None,
        jnp.asarray(px)))
    np.testing.assert_array_equal(got, greedy)


def test_deterministic_and_prompt_preserved(model):
    ids, media, px = _inputs(seed=3)
    kw = dict(media_locations=media, pixel_values=px, max_length=16,
              top_k=4, penalty_alpha=0.6, eos_token_id=10**9, pad_token_id=0)
    a = np.asarray(model.generate(ids, **kw))
    b = np.asarray(model.generate(ids, **kw))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a[:, :5], ids)
    assert a.shape == (2, 16)


def test_penalty_changes_selection(model):
    """With a huge alpha the penalty term dominates and the output must
    diverge from greedy somewhere (otherwise the penalty is dead code)."""
    ids, media, px = _inputs(seed=5)
    kw = dict(media_locations=media, pixel_values=px, max_length=20,
              eos_token_id=10**9, pad_token_id=0)
    greedy = np.asarray(model.generate(ids, **kw))
    contr = np.asarray(model.generate(ids, top_k=8, penalty_alpha=0.9, **kw))
    assert (contr != greedy).any(), "penalty never changed a selection"


def test_eos_pads_tail(model):
    """Rows that hit EOS pad the remainder (HF layout)."""
    ids, media, px = _inputs(seed=7)
    from flamingo_mini_tpu.contrastive import _contrastive_impl
    from flamingo_mini_tpu.ops.layers import PARITY
    # pick eos likely to occur: run once to find a frequent token
    kw = dict(media_locations=media, pixel_values=px, max_length=24,
              top_k=4, penalty_alpha=0.6, eos_token_id=10**9, pad_token_id=0)
    out = np.asarray(model.generate(ids, **kw))
    eos = int(out[0, 8])          # force an eos that WILL be generated
    out2 = np.asarray(model.generate(
        ids, media_locations=media, pixel_values=px, max_length=24,
        top_k=4, penalty_alpha=0.6, eos_token_id=eos, pad_token_id=99))
    row = out2[0]
    # selection is deterministic and independent of eos_token_id until the
    # EOS is actually emitted, so the token seen at position 8 in the probe
    # run MUST reappear there — the pad-tail check cannot be vacuous
    # (advisor r3: the old `if hits.size` guard let it silently skip)
    hits = np.where(row[5:] == eos)[0]
    assert hits.size > 0, "forced EOS was never generated"
    first = 5 + hits[0]
    assert first <= 8, (first, row)
    assert (row[first + 1:] == 99).all(), row


def test_validation():
    with pytest.raises(ValueError):
        DecodeConfig(penalty_alpha=0.5, top_k=1)
    with pytest.raises(ValueError):
        DecodeConfig(penalty_alpha=0.5, top_k=4, do_sample=True)
    with pytest.raises(ValueError):
        DecodeConfig(penalty_alpha=0.5, top_k=4, num_beams=2)

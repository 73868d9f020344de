"""Numerical parity of core modules vs the PyTorch reference.

Strategy: build the reference torch module with random init, convert its
state_dict through ``utils/hf_weights.py``, run both on identical inputs in
fp32, and demand agreement to tight tolerances.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from flamingo_mini_tpu.ops.layers import PARITY
from flamingo_mini_tpu.models.resampler import apply_resampler
from flamingo_mini_tpu.models.xattn import (
    apply_gated_xattn_block, compute_visual_kv,
)
from flamingo_mini_tpu.utils.hf_weights import (
    convert_gated_xattn_block, convert_resampler, state_dict_to_numpy,
)

ATOL = 2e-5


@pytest.mark.parametrize("frames", [1, 3])
def test_resampler_parity(reference, frames):
    torch.manual_seed(0)
    dim, depth, heads, dim_head, n_lat = 64, 3, 4, 16, 8
    ref = reference.perceiver_resampler.PerceiverResampler(
        dim=dim, depth=depth, dim_head=dim_head, heads=heads,
        num_latents=n_lat, num_time_embeds=4, ff_mult=2, act="gelu")
    ref.eval()

    x = torch.randn(2, frames, 10, dim)
    with torch.no_grad():
        want = ref(x if frames > 1 else x[:, 0]).numpy()

    params = convert_resampler(state_dict_to_numpy(ref.state_dict()))
    got = apply_resampler(
        params, jnp.asarray(x.numpy()),
        heads=heads, dim_head=dim_head, act="gelu", policy=PARITY)
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL, rtol=1e-5)


@pytest.mark.parametrize("act", ["gelu", "sqrelu"])
def test_gated_xattn_block_parity(reference, act):
    torch.manual_seed(1)
    dim, dim_visual, heads, dim_head, n_visual = 48, 32, 4, 16, 8
    n_media, n_token, b = 2, 12, 3
    ref = reference.gated_cross_attention.GatedCrossAttentionBlock(
        dim=dim, dim_visual=dim_visual, dim_head=dim_head, heads=heads,
        ff_mult=2, act=act, n_visual=n_visual)
    ref.eval()
    # nonzero gates so the xattn path actually contributes
    with torch.no_grad():
        ref.alpha_attn.fill_(0.7)
        ref.alpha_ffw.fill_(-0.3)

    y = torch.randn(b, n_token, dim)
    vis = torch.randn(b, n_media, n_visual, dim_visual)
    media_locations = torch.zeros(b, n_token, dtype=torch.int)
    media_locations[:, 1] = 1
    media_locations[:, 6] = 1
    # row 2: no media at all -> exercises the text_time==0 zeroing
    media_locations[2, :] = 0

    with torch.no_grad():
        want, _ = ref(y, vis, media_locations)

    params = convert_gated_xattn_block(state_dict_to_numpy(ref.state_dict()))
    kv = compute_visual_kv(params["attn"], jnp.asarray(vis.numpy()),
                           heads=heads, policy=PARITY)
    text_time = jnp.cumsum(jnp.asarray(media_locations.numpy()), axis=-1)
    got = apply_gated_xattn_block(
        params, jnp.asarray(y.numpy()), kv, text_time,
        n_visual=n_visual, heads=heads, dim_head=dim_head, act=act,
        policy=PARITY)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=ATOL, rtol=1e-5)


def test_xattn_cached_matches_uncached(reference):
    """Decode-cache semantics: conditioning the last token with cached visual
    K/V must equal slicing the full-sequence output (the reference's
    previous_kv path, gated_cross_attention.py:89-104)."""
    torch.manual_seed(2)
    dim, dim_visual, heads, dim_head, n_visual = 48, 32, 4, 16, 8
    b, n_media, n_token = 2, 2, 10
    ref = reference.gated_cross_attention.GatedCrossAttentionBlock(
        dim=dim, dim_visual=dim_visual, dim_head=dim_head, heads=heads,
        ff_mult=2, act="gelu", n_visual=n_visual)
    ref.eval()
    with torch.no_grad():
        ref.alpha_attn.fill_(0.9)

    params = convert_gated_xattn_block(state_dict_to_numpy(ref.state_dict()))
    y = jnp.asarray(np.random.RandomState(0).randn(b, n_token, dim).astype(np.float32))
    vis = jnp.asarray(np.random.RandomState(1).randn(b, n_media, n_visual, dim_visual).astype(np.float32))
    media_locations = np.zeros((b, n_token), np.int32)
    media_locations[:, 0] = 1
    media_locations[:, 4] = 1
    text_time = jnp.cumsum(jnp.asarray(media_locations), axis=-1)

    kv = compute_visual_kv(params["attn"], vis, heads=heads, policy=PARITY)
    full = apply_gated_xattn_block(
        params, y, kv, text_time, n_visual=n_visual, heads=heads,
        dim_head=dim_head, act="gelu", policy=PARITY)

    # cached step: only the last token, with text_time sliced to it
    last = apply_gated_xattn_block(
        params, y[:, -1:], kv, text_time[:, -1:], n_visual=n_visual,
        heads=heads, dim_head=dim_head, act="gelu", policy=PARITY)
    np.testing.assert_allclose(
        np.asarray(last), np.asarray(full[:, -1:]), atol=1e-5, rtol=1e-5)

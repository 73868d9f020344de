"""Video-path parity: 6-dim pixel_values (b, N, T, c, h, w) through the
time-embedded resampler vs the torch reference (C10 in SURVEY.md §2:
encode_resample_visuals accepts multi-frame input; modeling_flamingo.py:140-181)."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from flamingo_mini_tpu.configuration_flamingo import FlamingoConfig
from flamingo_mini_tpu.models import flamingo
from flamingo_mini_tpu.ops.layers import PARITY
from flamingo_mini_tpu.utils.hf_weights import convert_flamingo, state_dict_to_numpy

TINY_LM = dict(vocab_size=128, n_positions=64, n_embd=32, n_layer=2, n_head=4)
TINY_VIT = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=1,
                num_attention_heads=4, image_size=32, patch_size=8)


@pytest.fixture()
def ref_model(reference, monkeypatch):
    from transformers import CLIPVisionConfig, CLIPVisionModel, GPT2Config, GPT2LMHeadModel

    clip_cfg = CLIPVisionConfig(**TINY_VIT, attention_dropout=0.0)
    gpt2_cfg = GPT2Config(**TINY_LM, attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0)
    monkeypatch.setattr(CLIPVisionModel, "from_pretrained",
                        classmethod(lambda cls, n, **kw: CLIPVisionModel(clip_cfg)))
    monkeypatch.setattr(GPT2LMHeadModel, "from_pretrained",
                        classmethod(lambda cls, n, **kw: GPT2LMHeadModel(gpt2_cfg)))
    torch.manual_seed(9)
    cfg = reference.FlamingoConfig(
        lm="gpt2", clip_model_type="openai/clip-vit-base-patch32",
        dim=32, dim_visual=32, xattn_every=2, xattn_dim_head=8, xattn_heads=4,
        resampler_depth=2, resampler_dim_head=8, resampler_heads=4,
        resampler_num_latents=8, resampler_num_time_embeds=8)
    model = reference.FlamingoModel(cfg)
    model.eval()
    with torch.no_grad():
        for layer in model.flamingo.get_modified_layers():
            layer.xattn_block.alpha_attn.fill_(0.8)
    for layer in model.flamingo.get_modified_layers():
        def make_fwd(mb):
            def fwd(hidden_states, past_key_values=None, cache_position=None,
                    attention_mask=None, head_mask=None,
                    encoder_hidden_states=None, use_cache=False, **kw):
                hidden_states, kv = mb.xattn_block(
                    y=hidden_states, visual_features=mb.visual_features,
                    media_locations=mb.media_locations,
                    previous_kv=mb.xattn_layer_past, output_kv=use_cache)
                mb.kv_output = kv
                return mb.lm_block(hidden_states, past_key_values,
                                   cache_position, attention_mask, head_mask,
                                   encoder_hidden_states, use_cache=use_cache,
                                   **kw)
            return fwd
        layer.forward = make_fwd(layer)
    return model


def test_video_forward_parity(ref_model):
    """8-frame clips: encode_resample_visuals (6-dim) + forward logits parity."""
    config = FlamingoConfig(
        lm="gpt2", dim=32, dim_visual=32, xattn_every=2, xattn_dim_head=8,
        xattn_heads=4, resampler_depth=2, resampler_dim_head=8,
        resampler_heads=4, resampler_num_latents=8, resampler_num_time_embeds=8,
        lm_arch_overrides=TINY_LM, vision_arch_overrides=TINY_VIT)
    params = convert_flamingo(state_dict_to_numpy(ref_model.state_dict()),
                              xattn_every=2, n_lm_layers=TINY_LM["n_layer"])

    b, N, T, n = 2, 1, 8, 10
    rs = np.random.RandomState(0)
    pixel_values = rs.randn(b, N, T, 3, 32, 32).astype(np.float32)
    input_ids = rs.randint(0, 100, (b, n)).astype(np.int64)
    media = np.zeros((b, n), np.int64)
    media[:, 0] = 1

    # visual features (vision + time-embedded resampler over 8 frames)
    with torch.no_grad():
        want_vf = ref_model.flamingo.encode_resample_visuals(
            torch.tensor(pixel_values)).numpy()
    got_vf = np.asarray(flamingo.encode_resample_visuals(
        params, config, jnp.asarray(pixel_values), policy=PARITY))
    np.testing.assert_allclose(got_vf, want_vf, atol=3e-5, rtol=1e-4)

    # full forward over the video-conditioned sequence
    with torch.no_grad():
        want = ref_model(
            input_ids=torch.tensor(input_ids),
            media_locations=torch.tensor(media),
            attention_mask=torch.ones(b, n, dtype=torch.long),
            pixel_values=torch.tensor(pixel_values)).logits.numpy()
    out = flamingo.forward(
        params, config, jnp.asarray(input_ids), policy=PARITY,
        media_locations=jnp.asarray(media),
        attention_mask=jnp.ones((b, n), jnp.int32),
        pixel_values=jnp.asarray(pixel_values))
    np.testing.assert_allclose(np.asarray(out.logits), want, atol=2e-4, rtol=1e-4)

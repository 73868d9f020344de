"""End-to-end parity for the OPT-backed Flamingo + few-shot media masking."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from flamingo_mini_tpu.configuration_flamingo import FlamingoConfig
from flamingo_mini_tpu.generation import DecodeConfig, generate
from flamingo_mini_tpu.models import flamingo
from flamingo_mini_tpu.ops.layers import PARITY
from flamingo_mini_tpu.utils.hf_weights import convert_flamingo, state_dict_to_numpy

TINY_OPT = dict(vocab_size=128, max_position_embeddings=64, hidden_size=32,
                ffn_dim=64, num_hidden_layers=4, num_attention_heads=4,
                word_embed_proj_dim=32)
TINY_VIT = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                num_attention_heads=4, image_size=32, patch_size=8)


def tiny_config() -> FlamingoConfig:
    return FlamingoConfig(
        lm="facebook/opt-125m", clip_model_type="openai/clip-vit-base-patch32",
        dim=32, dim_visual=32, xattn_every=2, xattn_dim_head=8, xattn_heads=4,
        xattn_ff_mult=2, xattn_act="sqrelu", resampler_depth=2,
        resampler_dim_head=8, resampler_heads=4, resampler_num_latents=8,
        resampler_num_time_embeds=4, resampler_ff_mult=2, resampler_act="gelu",
        lm_arch_overrides=TINY_OPT, vision_arch_overrides=TINY_VIT)


@pytest.fixture()
def ref_model(reference, monkeypatch):
    from transformers import CLIPVisionConfig, CLIPVisionModel, OPTConfig, OPTForCausalLM

    clip_cfg = CLIPVisionConfig(**TINY_VIT, attention_dropout=0.0)
    opt_cfg = OPTConfig(**TINY_OPT, dropout=0.0, attention_dropout=0.0,
                        activation_dropout=0.0)

    monkeypatch.setattr(CLIPVisionModel, "from_pretrained",
                        classmethod(lambda cls, name, **kw: CLIPVisionModel(clip_cfg)))
    monkeypatch.setattr(OPTForCausalLM, "from_pretrained",
                        classmethod(lambda cls, name, **kw: OPTForCausalLM(opt_cfg)))

    torch.manual_seed(3)
    cfg = reference.FlamingoConfig(
        lm="facebook/opt-125m", clip_model_type="openai/clip-vit-base-patch32",
        dim=32, dim_visual=32, xattn_every=2, xattn_dim_head=8, xattn_heads=4,
        xattn_ff_mult=2, xattn_act="sqrelu", resampler_depth=2,
        resampler_dim_head=8, resampler_heads=4, resampler_num_latents=8,
        resampler_num_time_embeds=4, resampler_ff_mult=2, resampler_act="gelu")
    model = reference.FlamingoModel(cfg)
    model.eval()
    with torch.no_grad():
        for layer in model.flamingo.get_modified_layers():
            layer.xattn_block.alpha_attn.fill_(0.6)
            layer.xattn_block.alpha_ffw.fill_(0.3)
    # OPT layers are invoked kwargs-only in transformers 4.5x, so the
    # reference's hijacked blocks work without a signature adapter
    return model


def _convert(ref_model, config):
    return convert_flamingo(state_dict_to_numpy(ref_model.state_dict()),
                            xattn_every=config.xattn_every,
                            n_lm_layers=TINY_OPT["num_hidden_layers"])


def test_opt_forward_parity_fewshot(ref_model):
    """Full forward with THREE interleaved images (few-shot media masking:
    each text span attends only its most recent image)."""
    config = tiny_config()
    params = _convert(ref_model, config)
    b, n = 2, 16
    rs = np.random.RandomState(5)
    input_ids = rs.randint(0, 120, (b, n)).astype(np.int64)
    media_locations = np.zeros((b, n), np.int64)
    media_locations[:, 1] = 1
    media_locations[:, 6] = 1
    media_locations[:, 11] = 1
    pixel_values = rs.randn(b, 3, 3, 32, 32).astype(np.float32)
    attention_mask = np.ones((b, n), np.int64)

    with torch.no_grad():
        want = ref_model(
            input_ids=torch.tensor(input_ids),
            media_locations=torch.tensor(media_locations),
            attention_mask=torch.tensor(attention_mask),
            pixel_values=torch.tensor(pixel_values)).logits.numpy()

    out = flamingo.forward(
        params, config, jnp.asarray(input_ids), policy=PARITY,
        media_locations=jnp.asarray(media_locations),
        attention_mask=jnp.asarray(attention_mask),
        pixel_values=jnp.asarray(pixel_values))
    np.testing.assert_allclose(np.asarray(out.logits), want, atol=2e-4, rtol=1e-4)


def test_opt_greedy_decode_parity(ref_model):
    config = tiny_config()
    params = _convert(ref_model, config)
    b, n, max_length = 2, 6, 18
    rs = np.random.RandomState(6)
    input_ids = rs.randint(0, 120, (b, n)).astype(np.int64)
    media_locations = np.zeros((b, n), np.int64)
    media_locations[:, 0] = 1
    pixel_values = rs.randn(b, 1, 3, 32, 32).astype(np.float32)
    attention_mask = np.ones((b, n), np.int64)

    with torch.no_grad():
        out = ref_model(
            input_ids=torch.tensor(input_ids),
            media_locations=torch.tensor(media_locations),
            attention_mask=torch.tensor(attention_mask),
            pixel_values=torch.tensor(pixel_values), use_cache=True)
        past = out.past_key_values
        toks = [out.logits[:, -1].argmax(-1)]
        mask = torch.tensor(attention_mask)
        for _ in range(max_length - n - 1):
            mask = torch.cat([mask, torch.ones(b, 1, dtype=mask.dtype)], dim=1)
            out = ref_model(input_ids=toks[-1][:, None],
                            media_locations=torch.tensor(media_locations),
                            attention_mask=mask,
                            past_key_values=past, use_cache=True)
            past = out.past_key_values
            toks.append(out.logits[:, -1].argmax(-1))
    want = torch.stack(toks, dim=1).numpy()

    dc = DecodeConfig(max_length=max_length, eos_token_id=999, pad_token_id=999)
    got = np.asarray(generate(
        params, config, jnp.asarray(input_ids), policy=PARITY, dc=dc,
        media_locations=jnp.asarray(media_locations),
        attention_mask=jnp.asarray(attention_mask),
        pixel_values=jnp.asarray(pixel_values)))
    np.testing.assert_array_equal(got[:, n:], want)

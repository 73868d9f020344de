"""Converter CLI round-trip: a torch-saved reference checkpoint converts to
native format and produces the reference's logits."""
import os
import subprocess
import sys

import numpy as np
import torch

import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_convert_reference_checkpoint(tmp_path, reference, monkeypatch):
    from transformers import CLIPVisionConfig, CLIPVisionModel, GPT2Config, GPT2LMHeadModel

    TINY_LM = dict(vocab_size=128, n_positions=64, n_embd=32, n_layer=2, n_head=4)
    TINY_VIT = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=1,
                    num_attention_heads=4, image_size=32, patch_size=8)
    clip_cfg = CLIPVisionConfig(**TINY_VIT, attention_dropout=0.0)
    gpt2_cfg = GPT2Config(**TINY_LM, attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0)
    monkeypatch.setattr(CLIPVisionModel, "from_pretrained",
                        classmethod(lambda cls, n, **kw: CLIPVisionModel(clip_cfg)))
    monkeypatch.setattr(GPT2LMHeadModel, "from_pretrained",
                        classmethod(lambda cls, n, **kw: GPT2LMHeadModel(gpt2_cfg)))

    torch.manual_seed(0)
    ref_cfg = reference.FlamingoConfig(
        lm="gpt2", clip_model_type="openai/clip-vit-base-patch32",
        dim=32, dim_visual=32, xattn_every=2, xattn_dim_head=8, xattn_heads=4,
        resampler_depth=1, resampler_dim_head=8, resampler_heads=4,
        resampler_num_latents=4)
    ref = reference.FlamingoModel(ref_cfg)
    ref.eval()
    # transformers-4.5x GPT-2 block signature adapter (same as the parity suite)
    for layer in ref.flamingo.get_modified_layers():
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

    # save an HF-style checkpoint dir the way the reference would (vision
    # tower excluded from the state dict; modeling_flamingo.py:376)
    src = tmp_path / "hf_ckpt"
    src.mkdir()
    sd = {k: v for k, v in ref.state_dict().items()
          if not k.startswith("flamingo.vision_encoder.")}
    torch.save(sd, src / "pytorch_model.bin")
    cfg_json = {
        "lm": "gpt2", "clip_model_type": "openai/clip-vit-base-patch32",
        "dim": 32, "dim_visual": 32, "xattn_every": 2, "xattn_dim_head": 8,
        "xattn_heads": 4, "resampler_depth": 1, "resampler_dim_head": 8,
        "resampler_heads": 4, "resampler_num_latents": 4,
        "lm_arch_overrides": TINY_LM, "vision_arch_overrides": TINY_VIT,
    }
    import json
    (src / "config.json").write_text(json.dumps(cfg_json))

    dst = tmp_path / "native"
    env = dict(os.environ, JAX_PLATFORM_NAME="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/convert_checkpoint.py"),
         str(src), str(dst)],
        capture_output=True, text=True, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    assert (dst / "flamingo_tpu.npz").exists()

    # loaded model reproduces reference logits on a text-only batch (the
    # vision tower is random-init on both sides of this comparison, so use
    # dummy zero visual features == no media)
    from flamingo_mini_tpu import FlamingoModel
    model = FlamingoModel.from_pretrained(str(dst))
    ids = np.arange(8)[None] + 5
    with torch.no_grad():
        want = ref(input_ids=torch.tensor(ids)).logits.numpy()
    got = np.asarray(model.forward(ids).logits)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

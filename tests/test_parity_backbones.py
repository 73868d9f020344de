"""Numerical parity of GPT-2 / OPT / CLIP ViT trunks vs HF torch models.

HF models are constructed from configs (random init — no hub access needed),
their state_dicts converted through utils/hf_weights, and outputs compared in
fp32.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from flamingo_mini_tpu.configuration_flamingo import CLIPViTArch, GPT2Arch, OPTArch
from flamingo_mini_tpu.models import clip_vit, gpt2, opt
from flamingo_mini_tpu.ops.layers import PARITY
from flamingo_mini_tpu.utils.hf_weights import (
    convert_clip_vit, convert_gpt2, convert_opt, state_dict_to_numpy,
)

ATOL = 5e-5


def _tiny_gpt2_torch():
    from transformers import GPT2Config, GPT2LMHeadModel
    cfg = GPT2Config(vocab_size=128, n_positions=64, n_embd=32, n_layer=2,
                     n_head=4, attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0)
    torch.manual_seed(0)
    m = GPT2LMHeadModel(cfg)
    m.eval()
    return m, cfg


def test_gpt2_parity():
    m, cfg = _tiny_gpt2_torch()
    arch = GPT2Arch(vocab_size=cfg.vocab_size, n_positions=cfg.n_positions,
                    n_embd=cfg.n_embd, n_layer=cfg.n_layer, n_head=cfg.n_head)
    params = convert_gpt2(state_dict_to_numpy(m.state_dict()))

    ids = torch.randint(0, 128, (2, 10))
    with torch.no_grad():
        want = m(ids).logits.numpy()

    hidden, _ = gpt2.apply_gpt2(params, jnp.asarray(ids.numpy()),
                                arch=arch, policy=PARITY)
    got = np.asarray(gpt2.lm_head(params, hidden, PARITY))
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-4)


def test_gpt2_parity_padded():
    """Right-padded batch with attention_mask + HF-style position_ids."""
    m, cfg = _tiny_gpt2_torch()
    arch = GPT2Arch(vocab_size=cfg.vocab_size, n_positions=cfg.n_positions,
                    n_embd=cfg.n_embd, n_layer=cfg.n_layer, n_head=cfg.n_head)
    params = convert_gpt2(state_dict_to_numpy(m.state_dict()))

    ids = torch.randint(0, 128, (2, 8))
    mask = torch.ones(2, 8, dtype=torch.long)
    mask[1, 5:] = 0
    pos = (mask.cumsum(-1) - 1).clamp(min=0)
    with torch.no_grad():
        want = m(ids, attention_mask=mask, position_ids=pos).logits.numpy()

    hidden, _ = gpt2.apply_gpt2(
        params, jnp.asarray(ids.numpy()), arch=arch, policy=PARITY,
        attention_mask=jnp.asarray(mask.numpy()),
        position_ids=jnp.asarray(pos.numpy()))
    got = np.asarray(gpt2.lm_head(params, hidden, PARITY))
    # only compare non-pad rows (HF computes garbage at pads too, but equal)
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-4)


def test_gpt2_cached_decode_matches_full():
    """Prefill + single-token cached steps == full forward (cache soundness)."""
    m, cfg = _tiny_gpt2_torch()
    arch = GPT2Arch(vocab_size=cfg.vocab_size, n_positions=cfg.n_positions,
                    n_embd=cfg.n_embd, n_layer=cfg.n_layer, n_head=cfg.n_head)
    params = convert_gpt2(state_dict_to_numpy(m.state_dict()))

    ids = np.random.RandomState(0).randint(0, 128, (2, 12))
    jids = jnp.asarray(ids)
    full_hidden, _ = gpt2.apply_gpt2(params, jids, arch=arch, policy=PARITY)

    max_len = 16
    mask = np.zeros((2, max_len), np.int32)
    mask[:, :12] = 1
    cache = gpt2.init_cache(arch, 2, max_len, jnp.float32)
    pre_hidden, cache = gpt2.apply_gpt2(
        params, jids[:, :8], arch=arch, policy=PARITY,
        attention_mask=jnp.asarray(mask), cache=cache,
        cache_index=jnp.asarray(0, jnp.int32))
    np.testing.assert_allclose(np.asarray(pre_hidden), np.asarray(full_hidden[:, :8]),
                               atol=1e-5, rtol=1e-5)

    h = pre_hidden
    for t in range(8, 12):
        h, cache = gpt2.apply_gpt2(
            params, jids[:, t:t + 1], arch=arch, policy=PARITY,
            attention_mask=jnp.asarray(mask), cache=cache,
            cache_index=jnp.asarray(t, jnp.int32))
        np.testing.assert_allclose(np.asarray(h[:, 0]), np.asarray(full_hidden[:, t]),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("layer_norm_before", [True, False])
def test_opt_parity(layer_norm_before):
    from transformers import OPTConfig, OPTForCausalLM
    cfg = OPTConfig(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                    ffn_dim=64, num_attention_heads=4, max_position_embeddings=64,
                    word_embed_proj_dim=16 if not layer_norm_before else 32,
                    do_layer_norm_before=layer_norm_before, dropout=0.0,
                    attention_dropout=0.0, activation_dropout=0.0)
    torch.manual_seed(1)
    m = OPTForCausalLM(cfg)
    m.eval()
    arch = OPTArch(vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
                   ffn_dim=cfg.ffn_dim, num_hidden_layers=cfg.num_hidden_layers,
                   num_attention_heads=cfg.num_attention_heads,
                   max_position_embeddings=cfg.max_position_embeddings,
                   word_embed_proj_dim=cfg.word_embed_proj_dim,
                   do_layer_norm_before=cfg.do_layer_norm_before)
    params = convert_opt(state_dict_to_numpy(m.state_dict()))

    ids = torch.randint(0, 128, (2, 9))
    mask = torch.ones(2, 9, dtype=torch.long)
    mask[1, 6:] = 0
    with torch.no_grad():
        want = m(ids, attention_mask=mask).logits.numpy()

    hidden, _ = opt.apply_opt(params, jnp.asarray(ids.numpy()), arch=arch,
                              policy=PARITY, attention_mask=jnp.asarray(mask.numpy()))
    got = np.asarray(opt.lm_head(params, hidden, PARITY))
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-4)


def test_clip_vit_parity():
    from transformers import CLIPVisionConfig, CLIPVisionModel
    cfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=32, patch_size=8,
                           attention_dropout=0.0)
    torch.manual_seed(2)
    m = CLIPVisionModel(cfg)
    m.eval()
    arch = CLIPViTArch(hidden_size=32, intermediate_size=64,
                       num_hidden_layers=2, num_attention_heads=4,
                       image_size=32, patch_size=8)
    params = convert_clip_vit(state_dict_to_numpy(m.state_dict()))

    px = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        want = m(px).last_hidden_state.numpy()

    got = np.asarray(clip_vit.apply_clip_vit(
        params, jnp.asarray(px.numpy()), arch=arch, policy=PARITY))
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-4)

"""Decode features: repetition penalty, beam sampling, trainer remat."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from flamingo_mini_tpu import FlamingoConfig, FlamingoModel
from flamingo_mini_tpu.generation import _repetition_penalty

TINY_LM = dict(vocab_size=256, n_positions=64, n_embd=32, n_layer=2, n_head=4)
TINY_VIT = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=1,
                num_attention_heads=4, image_size=32, patch_size=8)


def tiny_model():
    cfg = FlamingoConfig(
        lm="gpt2", dim=32, dim_visual=32, xattn_every=2, xattn_dim_head=8,
        xattn_heads=4, resampler_depth=1, resampler_dim_head=8,
        resampler_heads=4, resampler_num_latents=4,
        lm_arch_overrides=TINY_LM, vision_arch_overrides=TINY_VIT)
    return FlamingoModel(cfg, rng=jax.random.PRNGKey(0))


def test_repetition_penalty_matches_hf_processor():
    from transformers.generation.logits_process import RepetitionPenaltyLogitsProcessor
    rs = np.random.RandomState(0)
    logits = rs.randn(2, 64).astype(np.float32) * 2
    tokens = np.array([[3, 7, 7, 12, 0, 0], [5, 6, 1, 2, 0, 0]])
    mask = np.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 0, 0]])

    got = np.asarray(_repetition_penalty(
        jnp.asarray(logits), jnp.asarray(tokens), jnp.asarray(mask), 1.5))

    proc = RepetitionPenaltyLogitsProcessor(1.5)
    # HF penalizes every id present in input_ids; restrict to real tokens
    want = proc(torch.tensor(tokens[:, :4]), torch.tensor(logits)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_repetition_penalty_changes_decode():
    m = tiny_model()
    ids = np.arange(5)[None] + 10
    base = np.asarray(m.generate(ids, max_length=16, eos_token_id=999,
                                 pad_token_id=0))
    pen = np.asarray(m.generate(ids, max_length=16, eos_token_id=999,
                                pad_token_id=0, repetition_penalty=5.0))
    gen = pen[0, 5:]
    # with a huge penalty, greedy cannot emit the same token twice in a row
    assert all(gen[i] != gen[i + 1] for i in range(len(gen) - 1)), gen
    assert not np.array_equal(base, pen)


def test_beam_sampling_runs_and_varies():
    m = tiny_model()
    ids = np.arange(4)[None] + 20
    outs = []
    for seed in (1, 2):
        outs.append(np.asarray(m.generate(
            ids, max_length=14, eos_token_id=999, pad_token_id=0,
            num_beams=3, do_sample=True, temperature=1.5,
            rng=jax.random.PRNGKey(seed))))
    assert outs[0].shape == (1, 14)
    assert not np.array_equal(outs[0], outs[1])
    # deterministic for a fixed seed
    again = np.asarray(m.generate(
        ids, max_length=14, eos_token_id=999, pad_token_id=0,
        num_beams=3, do_sample=True, temperature=1.5,
        rng=jax.random.PRNGKey(1)))
    np.testing.assert_array_equal(outs[0], again)


def test_trainer_remat_matches_no_remat():
    from flamingo_mini_tpu.flamingo_processor import FlamingoProcessor
    from flamingo_mini_tpu.tokenizer import build_toy_tokenizer
    from flamingo_mini_tpu.train.data import DataCollator, SyntheticCaptionDataset
    from flamingo_mini_tpu.train.trainer import FlamingoTrainer, TrainingArguments

    cfg = tiny_model().config
    proc = FlamingoProcessor(cfg, tokenizer=build_toy_tokenizer(
        ["image", "a", "cat", "dog"]))
    ds = SyntheticCaptionDataset(size=8, image_hw=32)
    col = DataCollator(proc, length=16)
    batch = col([ds[i] for i in range(8)])

    losses = {}
    for name, remat in (("plain", False), ("remat", True)):
        model = FlamingoModel(cfg, rng=jax.random.PRNGKey(0))
        args = TrainingArguments(output_dir=f"/tmp/fl_remat_{name}",
                                 learning_rate=1e-3, warmup_steps=1,
                                 remat=remat, eval_every_steps=None,
                                 save_every_steps=None)
        tr = FlamingoTrainer(model, args, train_dataset=ds, collator=col)
        losses[name] = [tr.train_step_on(batch) for _ in range(2)]
    np.testing.assert_allclose(losses["plain"], losses["remat"], rtol=1e-5)

"""End-to-end text->ids parity vs the HF tokenizers the reference drives.

The reference sets ``tokenizer.add_bos_token = True``
(/root/reference/flamingo_mini/flamingo_processor.py:49) but defaults to
``GPT2TokenizerFast`` (``use_fast=True``), whose encode path IGNORES that
attribute — so reference GPT-2 checkpoints see no leading BOS. These tests
pin that behavior with HF itself as the oracle (tokenizers built from local
toy vocab files; zero-egress safe).
"""
import json
import os

import pytest

from flamingo_mini_tpu.tokenizer import BPETokenizer, build_toy_tokenizer

WORDS = ["image", "a", "cat", "dog", "picture", "of", "red", "<", ">"]
TEXTS = [
    "a cat",
    "a cat a dog of a picture",
    "<image>a red dog",
    " a cat  of",
    "a cat<|endoftext|>",
]


@pytest.fixture(scope="module")
def vocab_files(tmp_path_factory):
    """Write the toy vocab/merges in the standard GPT-2 artifact format."""
    tok = build_toy_tokenizer(WORDS)
    d = tmp_path_factory.mktemp("toy_vocab")
    vocab_file = os.path.join(str(d), "vocab.json")
    merges_file = os.path.join(str(d), "merges.txt")
    with open(vocab_file, "w", encoding="utf-8") as f:
        json.dump(tok.encoder, f, ensure_ascii=False)
    with open(merges_file, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for (a, b), _ in sorted(tok.bpe_ranks.items(), key=lambda kv: kv[1]):
            f.write(f"{a} {b}\n")
    return vocab_file, merges_file


def test_fast_tokenizer_ignores_add_bos_and_we_match(vocab_files):
    """Our GPT-2 default (add_bos=False) == GPT2TokenizerFast with
    add_bos_token=True — HF's fast path never prepends BOS."""
    from transformers import GPT2TokenizerFast
    vocab_file, merges_file = vocab_files
    hf = GPT2TokenizerFast(vocab_file=vocab_file, merges_file=merges_file)
    hf.add_bos_token = True          # what the reference sets
    hf.pad_token = hf.eos_token

    ours = BPETokenizer.from_files(vocab_file, merges_file,
                                   eos_token="<|endoftext|>", add_bos=False)
    for text in TEXTS:
        want = hf.encode(text)
        got = ours.encode(text)
        assert got == want, f"{text!r}: {got} != {want}"
        assert ours.decode(got) == hf.decode(want)


def test_slow_tokenizer_path_with_add_bos(vocab_files):
    """add_bos=True reproduces the slow (use_fast=False) reference path:
    GPT2Tokenizer with add_bos_token=True DOES prepend <|endoftext|>."""
    from transformers import GPT2Tokenizer
    vocab_file, merges_file = vocab_files
    hf = GPT2Tokenizer(vocab_file=vocab_file, merges_file=merges_file)
    hf.add_bos_token = True

    ours = BPETokenizer.from_files(vocab_file, merges_file,
                                   eos_token="<|endoftext|>", add_bos=True)
    for text in TEXTS[:3]:
        want = hf.encode(text)
        got = ours.encode(text)
        assert want[0] == hf.eos_token_id, "oracle sanity: slow path adds BOS"
        assert got == want, f"{text!r}: {got} != {want}"


def test_processor_add_bos_override(vocab_files):
    """FlamingoProcessor(add_bos=...) overrides a user-supplied tokenizer."""
    from flamingo_mini_tpu import FlamingoConfig, FlamingoProcessor
    config = FlamingoConfig(
        lm="gpt2", dim=32, dim_visual=32,
        lm_arch_overrides=dict(vocab_size=512, n_positions=64, n_embd=32,
                               n_layer=2, n_head=4),
        vision_arch_overrides=dict(hidden_size=32, intermediate_size=64,
                                   num_hidden_layers=1, num_attention_heads=4,
                                   image_size=32, patch_size=8))
    tok = build_toy_tokenizer(WORDS, add_bos=True)
    proc = FlamingoProcessor(config, tokenizer=tok, add_bos=False)
    ids, _media, _mask = proc.encode_text("a cat")
    import numpy as np
    assert np.asarray(ids)[0, 0] != tok.bos_token_id

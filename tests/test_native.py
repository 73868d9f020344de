"""Native C++ BPE engine: builds, and is bit-identical to the Python path."""
import os

import numpy as np
import pytest

from flamingo_mini_tpu.tokenizer import build_toy_tokenizer


@pytest.fixture(scope="module")
def lib():
    from flamingo_mini_tpu.native import load_library
    lib = load_library()
    if lib is None:
        pytest.skip("g++/native build unavailable")
    return lib


def test_native_matches_python(lib):
    words = ["image", "a", "cat", "dog", "picture", "of", "tokenization",
             "supercalifragilistic", "<", ">"]
    texts = [
        "a cat and a dog", "picture of tokenization",
        " supercalifragilistic picture", "a", "", "cat cat cat",
        "unknownwordxyz with cat",
    ]
    t_native = build_toy_tokenizer(words)
    t_python = build_toy_tokenizer(words)
    t_python._native_tried = True  # force pure-Python path
    assert t_native._get_native() is not None, "native engine failed to build"

    for s in texts:
        a = t_native.encode(s)
        b = t_python.encode(s)
        assert a == b, (s, a, b)
        assert t_native.decode(a) == t_python.decode(b)


def test_native_batch_api(lib):
    from flamingo_mini_tpu.native import NativeBPE
    t = build_toy_tokenizer(["hello", "world"])
    native = t._get_native()
    assert native is not None
    # batch == per-word
    words = []
    for w in ["hello", "world", "helloworld", "x"]:
        token_b = "".join(t.byte_encoder[b] for b in w.encode())
        words.append([t.encoder[c] for c in token_b])
    batch = native.encode_words(words)
    single = [native.encode_word(w) for w in words]
    assert batch == single


def test_native_speedup_smoke(lib):
    """Native path exists and handles a large unique-word workload."""
    import random
    import string
    t = build_toy_tokenizer(["the", "quick", "brown", "fox"])
    native = t._get_native()
    assert native is not None
    rng = random.Random(0)
    text = " ".join("".join(rng.choices(string.ascii_lowercase, k=12))
                    for _ in range(500))
    ids = t.encode(text)
    assert len(ids) > 500
    # round-trip through decode
    assert t.decode(ids, skip_special_tokens=True) == text

"""exact_topk must be indistinguishable from lax.top_k (values, indices,
and tie-breaking order) — it feeds beam search where HF parity is exact."""
import numpy as np
import jax.numpy as jnp
from jax import lax

from flamingo_mini_tpu.ops.topk import exact_topk


def _check(x, k, block):
    want_v, want_i = lax.top_k(jnp.asarray(x), k)
    got_v, got_i = exact_topk(jnp.asarray(x), k, block=block)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_matches_lax_topk_random():
    rs = np.random.RandomState(0)
    x = rs.randn(4, 150774).astype(np.float32)
    _check(x, 6, block=8192)
    _check(x, 1, block=4096)
    _check(x, 50, block=2048)


def test_tie_breaking_matches():
    # heavy ties across and within blocks: lowest index must win
    rs = np.random.RandomState(1)
    x = rs.randint(0, 5, (3, 40000)).astype(np.float32)
    _check(x, 8, block=4096)
    x2 = np.zeros((2, 30000), np.float32)  # all equal
    _check(x2, 4, block=4096)


def test_non_divisible_padding():
    rs = np.random.RandomState(2)
    x = rs.randn(2, 100003).astype(np.float32)  # prime-ish, pads the tail
    _check(x, 6, block=8192)
    # negative values near the pad fill
    x3 = np.full((1, 99991), -1e30, np.float32)
    x3[0, 12345] = -1e29
    _check(x3, 2, block=8192)


def test_small_rows_fall_back():
    rs = np.random.RandomState(3)
    x = rs.randn(2, 1000).astype(np.float32)
    _check(x, 6, block=8192)

"""Correctness of the T-major flat-cache Pallas decode-attention kernel.

ops/pallas_decode.decode_attention vs its XLA reference, on CPU via the
Pallas interpreter. Covers left-padding, partial caches (cur < max_len),
kv_limit chunk coverage, non-divisible chunk boundaries, and bf16/f32.
Caches are (T, b, D) T-major; garbage beyond ``cur`` must stay masked
(the zero-tail contract only matters for array-overrun, which the chunk
divisibility rule prevents).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flamingo_mini_tpu.ops.pallas_decode import (
    decode_attention,
    decode_attention_reference,
)


def _mk(b, max_len, n_head, dh, dtype, seed=0):
    rng = np.random.RandomState(seed)
    D = n_head * dh
    q = jnp.asarray(rng.randn(b, D) * 0.3, dtype)
    k = jnp.asarray(rng.randn(max_len, b, D) * 0.3, dtype)
    v = jnp.asarray(rng.randn(max_len, b, D) * 0.3, dtype)
    return q, k, v


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("b,max_len,n_head,dh", [
    (2, 64, 4, 16),
    (3, 48, 2, 32),
])
def test_matches_reference(dtype, b, max_len, n_head, dh):
    q, k, v = _mk(b, max_len, n_head, dh, dtype)
    npad = jnp.asarray(np.arange(b) % 3, jnp.int32)
    cur = jnp.int32(max_len - 5)
    scale = 1.0 / np.sqrt(dh)
    got = decode_attention(q, k, v, npad, cur, n_head=n_head, scale=scale,
                           block_t=16, interpret=True)
    want = decode_attention_reference(q, k, v, npad, cur,
                                      n_head=n_head, scale=scale)
    tol = 2e-2 if dtype == jnp.bfloat16 else 1e-5
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=tol, rtol=tol)


def test_kv_limit_masks_tail():
    # slots beyond cur hold garbage; kv_limit covers them but the mask wins
    b, max_len, n_head, dh = 2, 96, 4, 16
    q, k, v = _mk(b, max_len, n_head, dh, jnp.float32, seed=1)
    k = k.at[40:].set(1e4)   # garbage beyond cur
    v = v.at[40:].set(1e4)
    npad = jnp.zeros((b,), jnp.int32)
    cur = jnp.int32(39)
    got = decode_attention(q, k, v, npad, cur, n_head=n_head, scale=0.25,
                           kv_limit=64, block_t=32, interpret=True)
    want = decode_attention_reference(q, k, v, npad, cur,
                                      n_head=n_head, scale=0.25, kv_limit=40)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    assert np.isfinite(np.asarray(got)).all()


def test_nondivisible_kv_limit():
    # kv_limit not a multiple of block_t: coverage rounds up inside the array
    b, max_len, n_head, dh = 1, 80, 2, 16
    q, k, v = _mk(b, max_len, n_head, dh, jnp.float32, seed=2)
    npad = jnp.asarray([4], jnp.int32)
    cur = jnp.int32(70)
    got = decode_attention(q, k, v, npad, cur, n_head=n_head, scale=0.25,
                           kv_limit=71, block_t=16, interpret=True)
    want = decode_attention_reference(q, k, v, npad, cur,
                                      n_head=n_head, scale=0.25)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_fully_masked_row_is_finite():
    # npad > cur (row not yet live): output must be finite, not NaN
    b, max_len, n_head, dh = 2, 32, 2, 16
    q, k, v = _mk(b, max_len, n_head, dh, jnp.float32, seed=3)
    npad = jnp.asarray([0, 31], jnp.int32)
    cur = jnp.int32(8)
    got = decode_attention(q, k, v, npad, cur, n_head=n_head, scale=0.25,
                           block_t=16, interpret=True)
    assert np.isfinite(np.asarray(got)).all()


# ---------------------------------------------------------------------------
# beam variant (r5): ancestry-masked lazy-beam kernel over the flat cache
# ---------------------------------------------------------------------------


def _beam_case(b, kb, H, D, T, seed=0, family_npad=True):
    rs = np.random.RandomState(seed)
    B = b * kb
    kc = jnp.asarray(rs.randn(T, B, D), jnp.float32)
    vc = jnp.asarray(rs.randn(T, B, D), jnp.float32)
    q = jnp.asarray(rs.randn(B, D), jnp.float32)
    anc = jnp.asarray(rs.randint(0, kb, (b, kb, T)), jnp.int32)
    cur = jnp.asarray(T - 6, jnp.int32)
    anc = anc.at[:, :, T - 6].set(jnp.arange(kb)[None])
    if family_npad:
        npad = jnp.asarray(np.repeat(rs.randint(0, 3, (b,)), kb), jnp.int32)
    else:
        npad = jnp.asarray(rs.randint(0, 3, (B,)), jnp.int32)
    return q, kc, vc, anc, npad, cur


@pytest.mark.parametrize("b,kb,H", [(8, 3, 16), (2, 4, 16), (4, 2, 4)])
def test_beam_kernel_matches_reference(b, kb, H):
    from flamingo_mini_tpu.ops.pallas_decode import (
        beam_kernel_group, decode_attention_beam,
        decode_attention_beam_reference)
    D, T = 128, 32
    assert beam_kernel_group(b * kb, kb, H) > 0  # the kernel path, not the
    # reference fallback
    q, kc, vc, anc, npad, cur = _beam_case(b, kb, H, D, T, seed=b + kb)
    ref = decode_attention_beam_reference(q, kc, vc, anc, npad, cur,
                                          n_head=H, scale=0.2, kb=kb)
    out = decode_attention_beam(q, kc, vc, anc, npad, cur, n_head=H,
                                scale=0.2, kb=kb, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_beam_kernel_kv_limit():
    from flamingo_mini_tpu.ops.pallas_decode import (
        decode_attention_beam, decode_attention_beam_reference)
    b, kb, H, D, T = 8, 3, 16, 128, 64
    q, kc, vc, anc, npad, cur = _beam_case(b, kb, H, D, T, seed=5)
    cur = jnp.asarray(20, jnp.int32)
    anc = anc.at[:, :, 20].set(jnp.arange(kb)[None])
    ref = decode_attention_beam_reference(q, kc, vc, anc, npad, cur,
                                          n_head=H, scale=0.2, kb=kb,
                                          kv_limit=32)
    out = decode_attention_beam(q, kc, vc, anc, npad, cur, n_head=H,
                                scale=0.2, kb=kb, kv_limit=32,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_beam_kernel_group_fallback():
    """Row counts that no lcm(8, kb)-multiple group divides fall back to
    the XLA reference path (same function, exact semantics)."""
    from flamingo_mini_tpu.ops.pallas_decode import beam_kernel_group
    assert beam_kernel_group(6, 3, 4) == 0       # b=2 beam-3: 24 ∤ 6
    assert beam_kernel_group(96, 3, 16) == 24    # beam-3 bs=32
    assert beam_kernel_group(64, 4, 16) == 8     # beam-4 bs=16
    assert beam_kernel_group(128, 8, 16) == 8    # beam-8 bs=16

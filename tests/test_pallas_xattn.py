"""Fused media-masked xattn kernel vs the XLA path (interpret mode)."""
import numpy as np

import jax
import jax.numpy as jnp
import pytest

tight = pytest.mark.skipif(
    jax.default_backend() in ("tpu", "axon"),
    reason="tight-tolerance kernel-logic tests require CPU fp32 execution")

from flamingo_mini_tpu.models.xattn import (
    apply_masked_xattn, compute_visual_kv, init_masked_xattn)
from flamingo_mini_tpu.ops.layers import FAST, FAST_PALLAS, PARITY
from flamingo_mini_tpu.ops.pallas_xattn import fused_media_xattn


@tight
def test_kernel_matches_xla_path():
    b, h, n, d, n_visual, n_media = 2, 4, 22, 16, 8, 3
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(b, h, n, d).astype(np.float32))
    k = jnp.asarray(rs.randn(b, h, n_media * n_visual, d).astype(np.float32))
    v = jnp.asarray(rs.randn(b, h, n_media * n_visual, d).astype(np.float32))
    tt = np.zeros((b, n), np.int32)
    tt[:, 5:] = 1
    tt[:, 12:] = 2
    tt[0, 18:] = 3
    # row 1 has a no-media prefix (tt==0) -> exercises the zeroing
    tt = jnp.asarray(tt)

    got = fused_media_xattn(q, k, v, tt, scale=0.25, n_visual=n_visual,
                            block_q=8, interpret=True)

    # reference: the module's XLA formulation
    media_time = jnp.repeat(jnp.arange(1, n_media + 1), n_visual)
    mask = tt[:, None, :, None] == media_time[None, None, None, :]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   precision=jax.lax.Precision.HIGHEST) * 0.25
    s = jnp.where(mask, s, jnp.finfo(jnp.float32).min)
    s = s - s.max(axis=-1, keepdims=True)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where((tt == 0)[:, None, :, None], 0.0, p)
    want = jnp.einsum("bhqk,bhkd->bhqd", p, v,
                      precision=jax.lax.Precision.HIGHEST)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_module_pallas_policy_matches_xla():
    """apply_masked_xattn with FAST_PALLAS ~== FAST (bf16 rounding)."""
    dim, dim_visual, heads, dim_head, n_visual = 32, 32, 4, 8, 8
    p = init_masked_xattn(jax.random.PRNGKey(0), dim=dim,
                          dim_visual=dim_visual, dim_head=dim_head,
                          heads=heads)
    rs = np.random.RandomState(1)
    y = jnp.asarray(rs.randn(2, 12, dim).astype(np.float32))
    vis = jnp.asarray(rs.randn(2, 2, n_visual, dim_visual).astype(np.float32))
    tt = jnp.asarray(np.cumsum(np.eye(12, dtype=np.int32)[0] +
                               np.eye(12, dtype=np.int32)[6], axis=0))[None]
    tt = jnp.tile(tt, (2, 1))

    kv = compute_visual_kv(p, vis, heads=heads, policy=PARITY)
    out_xla = apply_masked_xattn(p, y, kv, tt, n_visual=n_visual, heads=heads,
                                 dim_head=dim_head, policy=FAST)
    out_pal = apply_masked_xattn(p, y, kv, tt, n_visual=n_visual, heads=heads,
                                 dim_head=dim_head, policy=FAST_PALLAS)
    np.testing.assert_allclose(np.asarray(out_xla, np.float32),
                               np.asarray(out_pal, np.float32),
                               atol=0.1, rtol=0.1)


@tight
def test_kernel_gradients():
    b, h, n, d, n_visual = 1, 2, 8, 8, 4
    rs = np.random.RandomState(2)
    q = jnp.asarray(rs.randn(b, h, n, d).astype(np.float32))
    k = jnp.asarray(rs.randn(b, h, n_visual, d).astype(np.float32))
    v = jnp.asarray(rs.randn(b, h, n_visual, d).astype(np.float32))
    tt = jnp.ones((b, n), jnp.int32)

    g = jax.grad(lambda q_: jnp.sum(
        fused_media_xattn(q_, k, v, tt, scale=0.3, n_visual=n_visual,
                          block_q=8, interpret=True) ** 2))(q)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0

"""Ring attention (context parallelism): exact equality with single-device
causal attention on an 8-virtual-device mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flamingo_mini_tpu.parallel import create_mesh
from flamingo_mini_tpu.parallel.ring_attention import ring_attention


def _reference_causal(q, k, v, scale):
    n = q.shape[2]
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    mask = jnp.arange(n)[None, :] <= jnp.arange(n)[:, None]
    s = jnp.where(mask[None, None], s, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)


@pytest.mark.parametrize("n", [64, 128])
def test_ring_matches_single_device(n):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = create_mesh((8, 1))
    b, h, d = 2, 4, 32
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(b, h, n, d).astype(np.float32))
    k = jnp.asarray(rs.randn(b, h, n, d).astype(np.float32))
    v = jnp.asarray(rs.randn(b, h, n, d).astype(np.float32))

    got = ring_attention(q, k, v, mesh=mesh)
    want = _reference_causal(q, k, v, d ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_ring_gradients():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = create_mesh((8, 1))
    b, h, n, d = 1, 2, 64, 16
    rs = np.random.RandomState(1)
    q = jnp.asarray(rs.randn(b, h, n, d).astype(np.float32))
    k = jnp.asarray(rs.randn(b, h, n, d).astype(np.float32))
    v = jnp.asarray(rs.randn(b, h, n, d).astype(np.float32))

    g_ring = jax.grad(lambda q_: jnp.sum(
        ring_attention(q_, k, v, mesh=mesh) ** 2))(q)
    g_ref = jax.grad(lambda q_: jnp.sum(
        _reference_causal(q_, k, v, d ** -0.5) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_ref),
                               atol=5e-5, rtol=5e-5)

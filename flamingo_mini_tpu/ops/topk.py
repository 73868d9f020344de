"""Exact blockwise top-k for wide rows (the beam-search hot op).

The standard exact decomposition splits the row into blocks, takes the
per-block top-k (small sorts that vectorize over the block axis), then a
final top-k over the ``n_blocks * k`` survivors — any global top-k element
is necessarily in its block's top-k, so the result is exact.

NB (measured, TPU v5e): at beam-search scale (~150k lanes) plain
``lax.top_k`` is FASTER than this decomposition (17.9 vs 22.6 ms/step in
the beam decode), so beam search uses ``lax.top_k``; this utility is for
substantially wider rows, where the row-wide sort becomes the bound.

Tie-breaking matches ``lax.top_k`` (stable, lowest index first): survivors
are ordered block-major with in-block ranks stable, so for equal values the
earlier (= lower-index) candidate wins the final sort too.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def exact_topk(x: jnp.ndarray, k: int, block: int = 8192):
    """Top-k over the last axis of ``x`` (2-D: (batch, n)).

    Returns (values, indices) identical to ``lax.top_k(x, k)``. Falls back
    to plain ``lax.top_k`` when the row is small or blocking wouldn't help.
    """
    b, n = x.shape
    if n <= 2 * block or k > block:
        return lax.top_k(x, k)
    n_blocks = -(-n // block)
    pad = n_blocks * block - n
    if pad:
        fill = jnp.full((b, pad), -jnp.inf, x.dtype) if \
            jnp.issubdtype(x.dtype, jnp.floating) else \
            jnp.full((b, pad), jnp.iinfo(x.dtype).min, x.dtype)
        x = jnp.concatenate([x, fill], axis=1)
    xb = x.reshape(b, n_blocks, block)
    v, i = lax.top_k(xb, k)                      # (b, n_blocks, k) each
    base = (jnp.arange(n_blocks, dtype=i.dtype) * block)[None, :, None]
    gi = (i + base).reshape(b, n_blocks * k)     # global indices
    v = v.reshape(b, n_blocks * k)
    fv, fi = lax.top_k(v, k)
    return fv, jnp.take_along_axis(gi, fi, axis=1)

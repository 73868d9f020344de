"""Fused int8 lm_head + greedy argmax Pallas kernel.

The decode megakernel (ops/pallas_megadecode.py) executes the whole trunk in
one launch but leaves the tied lm_head + argmax in XLA. At flamingo-mini
scale that is the single largest remaining per-step op: a (B, D) x (D, V)
matvec-ish matmul streaming ~50 MB of int8 vocab rows. XLA runs the
convert-fused int8 matmul at roughly 280 GB/s in situ (r2 decomposition:
~0.18 ms/step); a Pallas grid pipeline streams the same rows at the chip's
raw rate (~700 GB/s peak, tools/probe_stream.py) — and since the greedy fast
path only needs the argmax TOKEN, the (B, V) logits never have to be
materialized in HBM at all.

Semantics mirror models/gpt2.lm_head (reference tie: wte is both embedding
and head, /root/reference/flamingo_mini/flamingo_model.py lm_head tie) +
jnp.argmax EXACTLY:

    logits = (x @ w8^T)_f32 * scale          (per-row dequant, f32)
    logits = bf16(logits)                    (lm_head casts to hidden dtype)
    tok    = argmax_f32(logits)              (first index on ties)

The per-output-element dot is a single K=D contraction in both paths;
measured at the deployment shape (B=32, D=1024, V=50258) the TPU tokens are
bitwise equal to the XLA head, and CPU interpret mode is exactly equal on
adversarial tie cases (test_pallas_lmhead.py). At other shapes XLA may tile
the head matmul with a different accumulation association (observed: one
near-tie argmax flip per ~60 decode steps on a random-init V=513 test model)
— the same +-1-ulp-bf16 envelope as the megakernel's documented fc2/xf2
association delta, far below the int8 tier's own serving noise.

Padded vocab rows (``pad_head_weights`` pads V up to the chunk grid; TP's
pad_vocab_params rows are handled the same way) are masked to -inf via the
``n_valid`` bound before the max — zero-scale pad rows would otherwise win
on all-negative rows.

NaN logits are undefined behavior (advisor r4): a NaN chunk max fails the
kernel's strict ``cmax > m`` comparison, so the fused path keeps an earlier
index while ``jnp.argmax`` would propagate the NaN's index. Degenerate
(NaN hidden-state) inputs already have no meaningful argmax; the two paths
simply disagree on WHICH arbitrary token they emit.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = float(jnp.finfo(jnp.float32).min)


def pad_head_weights(wq: Dict[str, jnp.ndarray], block_v: int):
    """Pad {"w8": (V, D) int8, "scale": (V,) f32} rows up to a multiple of
    ``block_v``. Run ONCE at generate-setup time (outside the decode loop) —
    the pad is a ~50 MB copy at flamingo-mini scale."""
    V, D = wq["w8"].shape
    Vp = -(-V // block_v) * block_v
    if Vp == V:
        w8, scale = wq["w8"], wq["scale"]
    else:
        w8 = jnp.pad(wq["w8"], ((0, Vp - V), (0, 0)))
        scale = jnp.pad(wq["scale"], (0, Vp - V))
    return {"w8": w8, "scale": scale.astype(jnp.float32).reshape(1, Vp)}


@functools.partial(jax.jit, static_argnames=("n_valid", "block_v",
                                             "interpret"))
def lm_head_argmax(w8: jnp.ndarray,       # (Vp, D) int8, Vp % block_v == 0
                   scale: jnp.ndarray,    # (1, Vp) f32 per-row dequant
                   x: jnp.ndarray,        # (B, D) bf16 post-ln_f hidden
                   *,
                   n_valid: int,          # true vocab rows (incl. <EOC>)
                   block_v: int = 2048,
                   interpret: Optional[bool] = None) -> jnp.ndarray:
    """Greedy next token over the tied int8 head -> (B,) int32."""
    Vp, D = w8.shape
    B = x.shape[0]
    assert Vp % block_v == 0, (Vp, block_v)
    n_chunks = Vp // block_v
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")

    def kern(x_ref, w_ref, s_ref, o_ref, m_ref, i_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            m_ref[...] = jnp.full_like(m_ref, NEG)
            i_ref[...] = jnp.zeros_like(i_ref)

        xv = x_ref[...]                                   # (B, D) bf16
        wv = w_ref[...].astype(jnp.bfloat16)              # (VB, D)
        lg = lax.dot_general(xv, wv, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
        lg = lg * s_ref[...]                              # (B, VB) * (1, VB)
        # lm_head casts logits to the hidden dtype; argmax then runs on the
        # (monotone) f32 view of those bf16 values — mirror both
        lg = lg.astype(jnp.bfloat16).astype(jnp.float32)
        cols = (lax.broadcasted_iota(jnp.int32, lg.shape, 1)
                + j * block_v)
        lg = jnp.where(cols < n_valid, lg, NEG)
        cmax = jnp.max(lg, axis=1, keepdims=True)         # (B, 1)
        cidx = jnp.min(jnp.where(lg == cmax, cols, 2 ** 30),
                       axis=1, keepdims=True)             # first max in chunk
        # strict > keeps the earlier chunk on cross-chunk ties == argmax's
        # first-index rule
        better = cmax > m_ref[...]
        i_ref[...] = jnp.where(better, cidx, i_ref[...])
        m_ref[...] = jnp.maximum(m_ref[...], cmax)

        @pl.when(j == n_chunks - 1)
        def _done():
            o_ref[...] = i_ref[...]

    out = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((B, D), lambda j: (0, 0)),
            pl.BlockSpec((block_v, D), lambda j: (j, 0)),
            pl.BlockSpec((1, block_v), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((B, 1), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, 1), jnp.float32),
                        pltpu.VMEM((B, 1), jnp.int32)],
        interpret=interpret,
    )(x.astype(jnp.bfloat16), w8, scale)
    return out[:, 0]


def lm_head_argmax_reference(w8, scale, x, n_valid: int) -> jnp.ndarray:
    """XLA path with identical semantics (models/gpt2.lm_head + argmax)."""
    logits = jnp.matmul(x.astype(jnp.bfloat16),
                        jnp.swapaxes(w8.astype(jnp.bfloat16), 0, 1),
                        preferred_element_type=jnp.float32)
    logits = (logits * scale.reshape(1, -1)).astype(jnp.bfloat16)
    cols = jnp.arange(logits.shape[-1])
    logits = jnp.where(cols[None, :] < n_valid,
                       logits.astype(jnp.float32), NEG)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)

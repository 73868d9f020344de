"""Core layer primitives: norms, linears, activations, feed-forward.

Pure functions over parameter pytrees (nested dicts of ``jnp.ndarray``). Two
compute policies are provided:

* ``PARITY``: fp32 activations with HIGHEST matmul precision. Used to match
  the PyTorch reference numerics bit-for-bit-ish (greedy-token identical).
* ``FAST``: bf16 activations with default (bf16 MXU) precision. The
  production TPU path; parameters stay fp32 and are cast at use.

Reference behavior reproduced here (see docstrings of each function):
- FeedForward factory: /root/reference/flamingo_mini/utils.py:31-50
  (LayerNorm -> Linear(dim, mult*dim, bias=False) -> act -> Linear(back, bias=False))
- SquaredReLU: /root/reference/flamingo_mini/utils.py:22-28
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, Any]


@dataclass(frozen=True)
class Policy:
    """Compute policy threaded through all apply functions.

    ``pallas``: route big attention ops (ViT encode, LM prefill/training,
    resampler) through the Pallas fused-attention kernel instead of the XLA
    einsum chain. Off in PARITY mode (the kernel's always-on max-subtraction
    is softmax-invariant but not bit-identical to the reference sequence).
    """

    dtype: Any = jnp.float32
    precision: Optional[lax.Precision] = None
    pallas: bool = False

    def cast(self, x: jnp.ndarray) -> jnp.ndarray:
        return x.astype(self.dtype)


PARITY = Policy(dtype=jnp.float32, precision=lax.Precision.HIGHEST)
FAST = Policy(dtype=jnp.bfloat16, precision=None)
FAST_PALLAS = Policy(dtype=jnp.bfloat16, precision=None, pallas=True)


def policy_for(compute_dtype: str, use_pallas: bool = False) -> Policy:
    """Map a FlamingoConfig.compute_dtype string to a Policy."""
    if compute_dtype in ("float32", "fp32"):
        return PARITY
    if compute_dtype in ("bfloat16", "bf16"):
        return FAST_PALLAS if use_pallas else FAST
    raise ValueError(f"unknown compute dtype {compute_dtype!r}")


def dot(x: jnp.ndarray, w: jnp.ndarray, policy: Policy) -> jnp.ndarray:
    """Matmul with the policy's dtype/precision. Weights are cast to the
    compute dtype; accumulation is fp32 on the MXU via preferred_element_type."""
    return jnp.matmul(
        x, w.astype(x.dtype), precision=policy.precision,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


# ---------------------------------------------------------------------------
# LayerNorm
# ---------------------------------------------------------------------------


def init_layer_norm(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def layer_norm(x: jnp.ndarray, p: Params, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm matching ``torch.nn.LayerNorm`` numerics.

    Statistics are always computed in fp32 (TPU best practice and required
    for bf16 stability), result cast back to the input dtype.
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------


def init_linear(key, d_in: int, d_out: int, bias: bool = True, std: float = 0.02) -> Params:
    p: Params = {"w": jax.random.normal(key, (d_in, d_out), jnp.float32) * std}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def linear(x: jnp.ndarray, p: Params, policy: Policy) -> jnp.ndarray:
    """x @ w (+ b). Weights stored ``(d_in, d_out)``.

    Accepts int8 weight-only quantized leaves ({"w8", "scale"} from
    ops/quant.py): y = (x @ w8) * scale with fp32 accumulation — XLA fuses
    the int8 operand convert into the matmul, halving HBM weight traffic.
    """
    if "w8" in p:
        y = jnp.matmul(x, p["w8"].astype(x.dtype), precision=policy.precision,
                       preferred_element_type=jnp.float32)
        y = (y * p["scale"]).astype(x.dtype)
    else:
        y = dot(x, p["w"], policy)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------


def gelu_erf(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU == torch.nn.GELU default."""
    return jax.nn.gelu(x, approximate=False)


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """tanh-approximated GELU == HF 'gelu_new' used by GPT-2."""
    return jax.nn.gelu(x, approximate=True)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(1.702 x) == HF 'quick_gelu' used by CLIP."""
    return x * jax.nn.sigmoid(1.702 * x)


def squared_relu(x: jnp.ndarray) -> jnp.ndarray:
    """relu(x)^2 (Flamingo paper choice; reference utils.py:22-28)."""
    r = jax.nn.relu(x)
    return r * r


_ACTS: Dict[str, Callable[[jnp.ndarray], jnp.ndarray]] = {
    "gelu": gelu_erf,          # torch.nn.GELU default (reference FeedForward)
    "gelu_new": gelu_tanh,     # GPT-2 MLP
    "quick_gelu": quick_gelu,  # CLIP MLP
    "relu": jax.nn.relu,       # OPT MLP / reference FeedForward option
    "sqrelu": squared_relu,    # reference FeedForward option
}


def get_activation(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if name not in _ACTS:
        raise ValueError(f"activation must be one of {sorted(_ACTS)}, got {name!r}")
    return _ACTS[name]


def dropout(x: jnp.ndarray, rate: float, rng) -> jnp.ndarray:
    """Inverted dropout; identity when rng is None or rate == 0 (eval mode).

    The reference trains through HF Trainer with the trunk's dropout active
    (GPT-2 embd/resid/attn 0.1, OPT 0.1); the trainable flamingo modules
    have no dropout in the reference and none here.
    """
    if rng is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# ---------------------------------------------------------------------------
# FeedForward (reference utils.py:31-50 semantics)
# ---------------------------------------------------------------------------


def init_feed_forward(key, dim: int, mult: int = 4) -> Params:
    k1, k2 = jax.random.split(key)
    inner = int(dim * mult)
    return {
        "norm": init_layer_norm(dim),
        "fc1": init_linear(k1, dim, inner, bias=False),
        "fc2": init_linear(k2, inner, dim, bias=False),
    }


def feed_forward(x: jnp.ndarray, p: Params, act: str, policy: Policy) -> jnp.ndarray:
    """LayerNorm -> Linear(no bias) -> act -> Linear(no bias)."""
    h = layer_norm(x, p["norm"])
    h = linear(h, p["fc1"], policy)
    h = get_activation(act)(h)
    return linear(h, p["fc2"], policy)

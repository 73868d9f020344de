"""Weight-only int8 quantization for the decode path.

Autoregressive decode at small batch is HBM-bandwidth-bound on weight
streaming (every step reads every LM weight once); int8 storage halves the
bytes vs bf16 for up to ~2x decode throughput. Scheme: symmetric per-
output-channel scales,

    w8[:, j] = round(w[:, j] / s[j]),   s[j] = absmax(w[:, j]) / 127
    y = (x @ w8) * s            (exact algebra, fp32 accumulation)

XLA fuses the int8->bf16 convert into the matmul operand load, so the
HBM savings materialize without a custom kernel; accumulation stays fp32 on
the MXU via preferred_element_type.

A quantized linear leaf is a dict {"w8": int8 (d_in, d_out),
"scale": fp32 (d_out,)} (+ optional "b"); embeddings quantize per-row:
{"w8": int8 (vocab, d), "scale": (vocab,)} serving both the gather
(w8[ids]*scale[ids]) and the tied lm_head ((h @ w8^T) * scale).
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

Params = Dict[str, Any]


def cast_params_bf16(params):
    """Cast float parameter leaves to bf16 for inference.

    FAST-mode compute casts weights at use (``w.astype(x.dtype)`` inside the
    matmul), but the HBM read still streams the stored fp32 bytes — casting
    the stored params halves decode weight traffic. Keep fp32 masters for
    training; this is an inference-deployment transform.
    """
    import jax

    def cast(path, x):
        if not hasattr(x, "dtype") or x.dtype != jnp.float32:
            return x
        # int8 dequant scales stay fp32 (bf16 scales cost real accuracy)
        if any(getattr(k, "key", None) == "scale" for k in path):
            return x
        return x.astype(jnp.bfloat16)

    return jax.tree_util.tree_map_with_path(cast, params)


def quantize_weight(w: jnp.ndarray, axis: int = 0) -> Params:
    """Symmetric int8 with per-channel scales (channels = the non-``axis``
    dim)."""
    s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-8)
    w8 = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return {"w8": w8, "scale": jnp.squeeze(s, axis=axis)}


def quantize_linear(p: Params) -> Params:
    out = quantize_weight(p["w"], axis=0)
    if "b" in p:
        out["b"] = p["b"]
    return out


def is_quantized(p) -> bool:
    return isinstance(p, dict) and "w8" in p


def embed_lookup(q: Params, ids: jnp.ndarray, dtype) -> jnp.ndarray:
    """Row gather from a per-row-quantized embedding."""
    return (q["w8"][ids].astype(jnp.float32)
            * q["scale"][ids][..., None]).astype(dtype)


def quantize_gpt2_lm(lm: Params) -> Params:
    """Quantize the GPT-2 trunk's decode-path weights (blocks + tied
    embedding). LayerNorms, biases, and wpe stay fp32."""
    out = dict(lm)
    out["wte_q"] = quantize_weight(lm["wte"], axis=1)  # per-row
    out.pop("wte")
    out["blocks"] = [
        {
            "ln_1": b["ln_1"],
            "c_attn": quantize_linear(b["c_attn"]),
            "c_proj": quantize_linear(b["c_proj"]),
            "ln_2": b["ln_2"],
            "mlp_fc": quantize_linear(b["mlp_fc"]),
            "mlp_proj": quantize_linear(b["mlp_proj"]),
        }
        for b in lm["blocks"]
    ]
    return out


def quantize_ffw(f: Params) -> Params:
    return {"norm": f["norm"], "fc1": quantize_linear(f["fc1"]),
            "fc2": quantize_linear(f["fc2"])}


def quantize_xattn_blocks(xattn: Params) -> Params:
    """Quantize the gated-xattn blocks' linears. These run EVERY decode step
    (one per hijacked LM layer), so at flamingo-mini scale their weight
    streaming (~12M params/block) rivals the LM trunk's."""
    out = {}
    for idx, blk in xattn.items():
        a = blk["attn"]
        out[idx] = {
            "attn": {"norm": a["norm"], "to_q": quantize_linear(a["to_q"]),
                     "to_kv": quantize_linear(a["to_kv"]),
                     "to_out": quantize_linear(a["to_out"])},
            "alpha_attn": blk["alpha_attn"],
            "ffw": quantize_ffw(blk["ffw"]),
            "alpha_ffw": blk["alpha_ffw"],
        }
    return out


# ---------------------------------------------------------------------------
# int8 KV (activation) quantization — decode reads the whole KV cache every
# step, so int8 storage halves the dominant HBM stream at long max_length.
# Per-position symmetric scales over the head dim (absmax/127).
# ---------------------------------------------------------------------------


def quantize_kv_write(x: jnp.ndarray):
    """(..., n, d) -> (int8 values, per-position scales (..., n, 1) bf16)."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-8)
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return x8, s.astype(jnp.bfloat16)


def dequantize_kv(x8: jnp.ndarray, s: jnp.ndarray, dtype) -> jnp.ndarray:
    return (x8.astype(dtype) * s.astype(dtype))


def quantize_kv_pair(kv):
    """(k, v) -> {"k8","ks","v8","vs"} (e.g. the per-sequence xattn K/V)."""
    k, v = kv
    k8, ks = quantize_kv_write(k)
    v8, vs = quantize_kv_write(v)
    return {"k8": k8, "ks": ks, "v8": v8, "vs": vs}


def quantize_opt_lm(lm: Params) -> Params:
    out = dict(lm)
    out["embed_tokens_q"] = quantize_weight(lm["embed_tokens"], axis=1)
    out.pop("embed_tokens")
    out["layers"] = [
        {
            "attn_ln": b["attn_ln"],
            "q_proj": quantize_linear(b["q_proj"]),
            "k_proj": quantize_linear(b["k_proj"]),
            "v_proj": quantize_linear(b["v_proj"]),
            "out_proj": quantize_linear(b["out_proj"]),
            "final_ln": b["final_ln"],
            "fc1": quantize_linear(b["fc1"]),
            "fc2": quantize_linear(b["fc2"]),
        }
        for b in lm["layers"]
    ]
    return out

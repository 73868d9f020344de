"""Flamingo model assembly (functional core).

Re-design of the reference ``FlamingoBaseModel``
(/root/reference/flamingo_mini/modeling_flamingo.py:43-306) without the
layer-hijacking/side-channel machinery: the decoder trunks (gpt2.py / opt.py)
expose a ``layer_hook`` that applies the gated cross-attention block before
every ``xattn_every``-th LM layer (hijack positions match the reference:
``i % xattn_every == 0`` starting at 0; modeling_flamingo.py:81-83), and all
visual conditioning state (visual K/V per xattn layer + ``text_time``) is
passed as explicit arguments.

The KV "caches" are plain pytrees:
  * xattn KV — computed ONCE from the resampled visual features and constant
    across decode steps (two-part cache, part 1; modeling_flamingo.py:282-285)
  * LM KV — preallocated static-shape buffers (part 2)
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..configuration_flamingo import FlamingoConfig, GPT2Arch
from ..ops.layers import Policy
from . import clip_vit, gpt2, opt
from .resampler import apply_resampler, init_resampler
from .xattn import (
    KV, apply_gated_xattn_block, compute_visual_kv, init_gated_xattn_block,
)

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def lm_family(config: FlamingoConfig) -> str:
    if config.lm.startswith("gpt"):
        return "gpt2"
    if config.lm.startswith("facebook/opt"):
        return "opt"
    raise ValueError(f"unsupported language model {config.lm!r}")


def n_lm_layers(config: FlamingoConfig) -> int:
    arch = config.lm_arch
    return arch.n_layer if isinstance(arch, GPT2Arch) else arch.num_hidden_layers


def xattn_layer_indices(config: FlamingoConfig) -> List[int]:
    """LM layer indices that get a gated xattn block (reference
    modeling_flamingo.py:81-83: every xattn_every-th, starting at 0)."""
    return [i for i in range(n_lm_layers(config)) if i % config.xattn_every == 0]


def init_flamingo(key, config: FlamingoConfig, with_vision: bool = True) -> Params:
    """Random-init full parameter tree {vision, resampler, lm, xattn}."""
    k_vis, k_res, k_lm, k_x = jax.random.split(key, 4)
    lm_arch = config.lm_arch
    if isinstance(lm_arch, GPT2Arch):
        assert config.dim == lm_arch.n_embd, \
            f"config.dim={config.dim} but {config.lm} hidden size={lm_arch.n_embd}"
        lm_params = gpt2.init_gpt2(k_lm, lm_arch)
    else:
        assert config.dim == lm_arch.hidden_size, \
            f"config.dim={config.dim} but {config.lm} hidden size={lm_arch.hidden_size}"
        lm_params = opt.init_opt(k_lm, lm_arch)

    xattn = {}
    for i, kx in zip(xattn_layer_indices(config),
                     jax.random.split(k_x, max(1, len(xattn_layer_indices(config))))):
        xattn[str(i)] = init_gated_xattn_block(
            kx, dim=config.dim, dim_visual=config.dim_visual,
            dim_head=config.xattn_dim_head, heads=config.xattn_heads,
            ff_mult=config.xattn_ff_mult)

    params: Params = {
        "resampler": init_resampler(
            k_res, dim=config.dim_visual, depth=config.resampler_depth,
            dim_head=config.resampler_dim_head, heads=config.resampler_heads,
            num_latents=config.resampler_num_latents,
            num_time_embeds=config.resampler_num_time_embeds,
            ff_mult=config.resampler_ff_mult),
        "lm": lm_params,
        "xattn": xattn,
    }
    if with_vision:
        params["vision"] = clip_vit.init_clip_vit(k_vis, config.vision_arch)
    return params


# ---------------------------------------------------------------------------
# vision path
# ---------------------------------------------------------------------------


def encode_resample_visuals(
    params: Params,
    config: FlamingoConfig,
    pixel_values: jnp.ndarray,
    *,
    policy: Policy,
) -> jnp.ndarray:
    """Vision encoder + resampler: pixels -> (b, N, q, d_visual).

    Accepted shapes mirror the reference (modeling_flamingo.py:140-181):
    ``(N c h w)`` (b=1), ``(b N c h w)`` (T=1), ``(b N T c h w)``.
    The vision tower runs under ``stop_gradient`` — it NEVER trains,
    independent of freeze flags (modeling_flamingo.py:169-170).
    """
    if pixel_values.ndim == 4:
        N = pixel_values.shape[0]
        b, T = 1, 1
    elif pixel_values.ndim == 5:
        b, N = pixel_values.shape[:2]
        T = 1
    elif pixel_values.ndim == 6:
        b, N, T = pixel_values.shape[:3]
    else:
        raise ValueError("pixel_values must have ndim 4, 5 or 6")
    flat = pixel_values.reshape((b * N * T,) + pixel_values.shape[-3:])

    feats = clip_vit.apply_clip_vit(
        params["vision"], flat, arch=config.vision_arch, policy=policy)
    feats = jax.lax.stop_gradient(feats)

    v, d = feats.shape[-2:]
    feats = feats.reshape(b * N, T, v, d)
    resampled = apply_resampler(
        params["resampler"], feats,
        heads=config.resampler_heads, dim_head=config.resampler_dim_head,
        act=config.resampler_act, policy=policy)
    q = resampled.shape[-2]
    return resampled.reshape(b, N, q, config.dim_visual)


# ---------------------------------------------------------------------------
# xattn conditioning
# ---------------------------------------------------------------------------


def compute_xattn_kv(
    params: Params, config: FlamingoConfig, visual_features: jnp.ndarray,
    *, policy: Policy,
) -> Dict[str, KV]:
    """Project visual features into per-xattn-layer K/V (two-part cache,
    part 1 — constant over decode steps)."""
    return {
        idx: compute_visual_kv(block["attn"], visual_features,
                               heads=config.xattn_heads, policy=policy)
        for idx, block in params["xattn"].items()
    }


def make_layer_hook(
    params: Params,
    config: FlamingoConfig,
    xattn_kv: Dict[str, KV],
    text_time: jnp.ndarray,
    *,
    policy: Policy,
):
    """Build the decoder layer_hook applying gated xattn at hijack indices."""

    def hook(i: int, x: jnp.ndarray) -> jnp.ndarray:
        key = str(i)
        if key not in params["xattn"]:
            return x
        return apply_gated_xattn_block(
            params["xattn"][key], x, xattn_kv[key], text_time,
            n_visual=config.resampler_num_latents,
            heads=config.xattn_heads, dim_head=config.xattn_dim_head,
            act=config.xattn_act, policy=policy)

    return hook


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


@dataclass
class FlamingoOutput:
    logits: jnp.ndarray
    loss: Optional[jnp.ndarray] = None
    lm_cache: Optional[Any] = None
    xattn_kv: Optional[Dict[str, KV]] = None


def apply_lm(
    params: Params,
    config: FlamingoConfig,
    input_ids: jnp.ndarray,
    *,
    policy: Policy,
    layer_hook,
    attention_mask: Optional[jnp.ndarray],
    position_ids: Optional[jnp.ndarray] = None,
    cache=None,
    cache_index=None,
    dropout_rng=None,
    kv_limit=None,
    context_mesh=None,
    context_axis: str = "data",
    beam_anc=None,
    with_hidden: bool = False,
    skip_head: bool = False,
) -> Tuple[jnp.ndarray, Any]:
    """Run the LM trunk + tied head. Returns (logits, new_cache), or
    (logits, new_cache, hidden) when ``with_hidden`` — the final-LN trunk
    output (HF ``hidden_states[-1]``; contrastive search's penalty space).
    ``skip_head=True`` (with ``with_hidden``) leaves logits as None — the
    caller fuses the head itself (ops/pallas_lmhead's greedy fast path).

    ``kv_limit`` (static int): attend only the first kv_limit cache slots —
    the live-prefix decode optimization (cache writes still land in the full
    preallocated buffer).
    ``context_mesh``: route self-attention through ring attention with the
    sequence sharded over ``context_axis`` (context parallelism for
    sequences whose O(n^2) score matrix won't fit one device; padding masks
    are supported — their chunks rotate around the ring with K/V). Full
    sequences only (no decode cache); see BENCH.md for the memory/compute
    story."""
    lm_arch = config.lm_arch
    if isinstance(lm_arch, GPT2Arch):
        hidden, new_cache = gpt2.apply_gpt2(
            params["lm"], input_ids, arch=lm_arch, policy=policy,
            position_ids=position_ids, attention_mask=attention_mask,
            layer_hook=layer_hook, cache=cache, cache_index=cache_index,
            dropout_rng=dropout_rng, kv_limit=kv_limit,
            ring_mesh=context_mesh, ring_axis=context_axis,
            beam_anc=beam_anc)
        logits = None if skip_head else gpt2.lm_head(
            params["lm"], hidden, policy, n_valid=lm_arch.vocab_size + 1)
    else:
        hidden, new_cache = opt.apply_opt(
            params["lm"], input_ids, arch=lm_arch, policy=policy,
            position_ids=position_ids, attention_mask=attention_mask,
            layer_hook=layer_hook, cache=cache, cache_index=cache_index,
            dropout_rng=dropout_rng, kv_limit=kv_limit,
            ring_mesh=context_mesh, ring_axis=context_axis,
            beam_anc=beam_anc)
        logits = None if skip_head else opt.lm_head(
            params["lm"], hidden, policy, n_valid=lm_arch.vocab_size + 1)
    if with_hidden:
        return logits, new_cache, hidden
    return logits, new_cache


def forward(
    params: Params,
    config: FlamingoConfig,
    input_ids: jnp.ndarray,                      # (b, n)
    *,
    policy: Policy,
    media_locations: Optional[jnp.ndarray] = None,   # (b, n) 0/1
    attention_mask: Optional[jnp.ndarray] = None,    # (b, n) 1=real
    pixel_values: Optional[jnp.ndarray] = None,
    visual_features: Optional[jnp.ndarray] = None,   # (b, N, q, d_visual)
    labels: Optional[jnp.ndarray] = None,
    loss_reduction: str = "mean",
    dropout_rng=None,   # enables the frozen trunk's training-mode dropout
    context_mesh=None,  # ring-attention context parallelism (see apply_lm)
    context_axis: str = "data",
) -> FlamingoOutput:
    """Full (uncached) Flamingo forward pass — training / scoring path.

    Mirrors reference modeling_flamingo.py:183-306: visual encode+resample
    (unless precomputed features given), per-layer conditioning, LM trunk,
    tied head, optional shifted-CE loss with selectable reduction.
    """
    b, n = input_ids.shape
    if visual_features is None:
        if pixel_values is not None:
            visual_features = encode_resample_visuals(
                params, config, pixel_values, policy=policy)
        else:
            # dummy zero features: no media (text_time stays 0 everywhere ->
            # xattn output fully zeroed; reference modeling_flamingo.py:253-257)
            visual_features = jnp.zeros(
                (b, 1, config.resampler_num_latents, config.dim_visual),
                policy.dtype)
    if media_locations is None:
        media_locations = jnp.zeros((b, n), jnp.int32)

    text_time = jnp.cumsum(media_locations.astype(jnp.int32), axis=-1)
    xattn_kv = compute_xattn_kv(params, config, policy.cast(visual_features),
                                policy=policy)
    hook = make_layer_hook(params, config, xattn_kv, text_time, policy=policy)

    logits, _ = apply_lm(
        params, config, input_ids, policy=policy, layer_hook=hook,
        attention_mask=attention_mask, dropout_rng=dropout_rng,
        context_mesh=context_mesh, context_axis=context_axis)

    loss = None
    if labels is not None:
        loss = cross_entropy_loss(logits, labels, reduction=loss_reduction)

    return FlamingoOutput(logits=logits, loss=loss, xattn_kv=xattn_kv)


def cross_entropy_loss(
    logits: jnp.ndarray, labels: jnp.ndarray, reduction: str = "mean",
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Shifted next-token CE, matching reference modeling_flamingo.py:288-298
    (loss over the full sequence including prompt/pad — pads are eos).

    reduction: 'mean' | 'none' (per-token, flattened like torch F.cross_entropy
    with reduction='none' over (b*(n-1),) logits).
    ``weights`` optionally masks tokens (used by the trainer for pad masking —
    a TPU-native extra, not reference behavior).
    """
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    token_loss = -jnp.take_along_axis(logp, shift_labels[..., None], axis=-1)[..., 0]
    if weights is not None:
        token_loss = token_loss * weights[:, 1:].astype(token_loss.dtype)
        if reduction == "mean":
            return token_loss.sum() / jnp.maximum(weights[:, 1:].sum(), 1)
    if reduction == "mean":
        return token_loss.mean()
    if reduction == "none":
        return token_loss.reshape(-1)
    raise ValueError(f"unknown reduction {reduction!r}")

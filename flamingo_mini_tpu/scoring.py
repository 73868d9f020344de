"""Zero-shot sequence scoring (the reference's ``score_sequences``).

Re-implements /root/reference/flamingo_mini/modeling_flamingo.py:607-712 as a
two-pass compiled program:

1. the common prefix (host-computed length) runs ONCE with caching;
2. the next-token logits filter the top-k candidate sequences;
3. caches are tiled to the k choices with the LM cache re-entered at
   ``n_reuse - 1`` (the reference trims the last cached position,
   modeling_flamingo.py:677-683 — equivalent to recomputing that slot);
4. each choice suffix runs with ``labels`` and per-token loss; the score is
   ``-sum(loss)``, with non-top-k sequences at ``finfo.min``.
"""
from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np

from .configuration_flamingo import FlamingoConfig
from .models import flamingo
from .ops.layers import Policy


def get_common_prefix_length(input_ids: np.ndarray) -> int:
    """Length of the longest common prefix across rows (reference
    utils.py:53-57)."""
    x = np.asarray(input_ids)
    if x.shape[0] == 1:
        return x.shape[1]
    eq = (x[0] == x[1:]).all(axis=0)
    idx = np.argmin(eq)
    if eq[idx]:
        return x.shape[1]
    return int(idx)


@partial(jax.jit, static_argnames=("config", "policy", "nb_down", "nb_up", "k"))
def _score_impl(params, config: FlamingoConfig, policy: Policy,
                input_ids, media_locations, attention_mask, visual_features,
                n_true, nb_down: int, nb_up: int, k: int):
    """Two-pass scorer with BUCKETED static shapes.

    ``n_true`` (traced) is the real common-prefix length; ``nb_down <=
    n_true <= nb_up`` are its static bucket bounds (both equal to ``n_true``
    when bucketing is off). Pass 1 runs over ``[0, nb_up)`` so the top-k
    filter can read the logits at the exact position ``n_true - 1``
    (a dynamic index into a static-shape array); pass 2 re-enters at
    ``nb_down - 1``, overwriting any row-0-specific cache slots in
    ``[nb_down-1, nb_up)``, and a dynamic mask drops loss terms for
    positions below ``n_true`` — so the returned scores sum exactly the same
    loss terms as the unbucketed program (equal up to float reassociation
    across differently-shaped compiled programs, ~1e-5) while the compile
    count scales with the number of buckets, not distinct prefix lengths."""
    n_choices, L = input_ids.shape

    # ---- pass 1: shared prefix (batch of 1), bucketed UP ----------------
    text_time = jnp.cumsum(media_locations.astype(jnp.int32), axis=-1)
    xattn_kv = flamingo.compute_xattn_kv(
        params, config, policy.cast(visual_features), policy=policy)
    hook = flamingo.make_layer_hook(
        params, config, xattn_kv, text_time[:1, :nb_up], policy=policy)

    from .generation import _init_lm_cache
    cache = _init_lm_cache(config, 1, L, policy.dtype)
    # the mask must span the full (preallocated) cache length
    mask_full = jnp.zeros((1, L), jnp.int32).at[:, :nb_up].set(
        attention_mask[:1, :nb_up].astype(jnp.int32))
    logits, cache = flamingo.apply_lm(
        params, config, input_ids[:1, :nb_up], policy=policy,
        layer_hook=hook, attention_mask=mask_full,
        position_ids=None, cache=cache,
        cache_index=jnp.asarray(0, jnp.int32))

    # ---- top-k filter on the next token after the TRUE prefix -----------
    next_tokens = input_ids[:, n_true]                     # (n_choices,)
    next_logits = logits[0, n_true - 1]
    cand_logits = next_logits[next_tokens]                 # (n_choices,)
    topk_vals, topk_idx = jax.lax.top_k(cand_logits, k)

    # ---- pass 2: k choice suffixes with tiled caches, bucketed DOWN -----
    tile = lambda x: jnp.repeat(x, k, axis=0)
    cache_k = jax.tree_util.tree_map(tile, cache)
    xattn_kv_k = jax.tree_util.tree_map(tile, xattn_kv)

    choice_ids = input_ids[topk_idx][:, nb_down - 1:]      # (k, L-nb_down+1)
    choice_media = media_locations[topk_idx]
    choice_mask = attention_mask[topk_idx]
    choice_time = jnp.cumsum(choice_media.astype(jnp.int32), axis=-1)[:, nb_down - 1:]
    hook2 = flamingo.make_layer_hook(
        params, config, xattn_kv_k, choice_time, policy=policy)

    logits2, _ = flamingo.apply_lm(
        params, config, choice_ids, policy=policy, layer_hook=hook2,
        attention_mask=choice_mask, position_ids=None,
        cache=cache_k, cache_index=jnp.asarray(nb_down - 1, jnp.int32))

    # shifted per-token CE over the choice window; column j predicts the
    # token at absolute position nb_down + j, so positions below the true
    # prefix end (common to every choice) are masked out of the sum
    per_tok = flamingo.cross_entropy_loss(
        logits2, choice_ids, reduction="none").reshape(k, -1)
    valid = (jnp.arange(per_tok.shape[1]) + nb_down) >= n_true
    losses = (per_tok * valid[None, :]).sum(axis=1)

    scores = jnp.full((n_choices,), jnp.finfo(jnp.float32).min)
    scores = scores.at[topk_idx].set(-losses)
    return scores


def score_sequences(
    params,
    config: FlamingoConfig,
    input_ids,
    media_locations,
    attention_mask,
    *,
    policy: Policy,
    pixel_values=None,
    visual_features=None,
    k: int = 100000,
    reuse_block: int = 0,
) -> jnp.ndarray:
    """Log-prob scores (b,) for a batch of candidate sequences sharing a
    common prefix. Visual features are shared across the whole batch
    (reference semantics: pixel_values (N c h w) / visual_features (N q d)).

    ``reuse_block``: bucket the common-prefix length to multiples of this
    block so serving-time scoring does not recompile for every distinct
    prefix length (only per bucket pair) — scores match the unbucketed
    program to float-reassociation precision (see ``_score_impl``). 0 =
    exact static length (one compile per distinct prefix length)."""
    input_ids = jnp.asarray(input_ids)
    n_choices = int(input_ids.shape[0])
    L = int(input_ids.shape[1])
    n_reuse = get_common_prefix_length(np.asarray(input_ids))
    k = min(k, n_choices)
    if n_reuse == 0:
        # the top-k pre-filter conditions on the shared prefix's next-token
        # logits; with NO genuinely common prefix that conditioning is row
        # 0's first token, which could wrongly filter other rows -> disable
        # the filter (pass 2 recomputes every row from index 0 regardless)
        k = n_choices
    # the reference fails when all sequences are equal (modeling_flamingo.py:636);
    # we clamp so the choice pass always has >= 1 token
    n_reuse = min(n_reuse, L - 1)
    n_reuse = max(n_reuse, 1)

    if reuse_block > 0:
        nb_down = min(max(1, (n_reuse // reuse_block) * reuse_block), L - 1)
        nb_up = min(max(1, -(-n_reuse // reuse_block) * reuse_block), L - 1)
    else:
        nb_down = nb_up = n_reuse

    if visual_features is None:
        assert pixel_values is not None, "need pixel_values or visual_features"
        visual_features = flamingo.encode_resample_visuals(
            params, config, pixel_values[None], policy=policy)  # (1, N, q, d)
    elif visual_features.ndim == 3:
        visual_features = visual_features[None]

    return _score_impl(params, config, policy, input_ids,
                       jnp.asarray(media_locations), jnp.asarray(attention_mask),
                       visual_features, jnp.asarray(n_reuse, jnp.int32),
                       nb_down, nb_up, k)

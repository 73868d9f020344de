"""FlamingoModel: the public, stateful model API.

API-parity wrapper over the functional core (models/flamingo.py,
generation.py, scoring.py), mirroring the reference ``FlamingoModel``
(/root/reference/flamingo_mini/modeling_flamingo.py:359-712): construction
from a ``FlamingoConfig``, ``from_pretrained``/``save_pretrained``,
``forward``-like ``__call__``, ``generate``, ``generate_captions``,
``score_sequences``, freeze semantics (``parameters_trainable``,
``state_dict_trainable``).

Weight sources for ``from_pretrained``:
* native ``flamingo_tpu.npz`` (flattened pytree; written by save_pretrained);
* an HF PyTorch checkpoint (``pytorch_model.bin`` / ``model.safetensors``)
  converted through utils/hf_weights.convert_flamingo — so reference
  checkpoints load directly. As in the reference, such checkpoints exclude
  the vision tower (modeling_flamingo.py:376); pass ``vision_params`` or a
  local CLIP checkpoint path to supply it.
"""
from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .configuration_flamingo import FlamingoConfig, GPT2Arch
from .flamingo_processor import FlamingoProcessor
from .generation import DecodeConfig, generate as _generate
from .models import flamingo as F
from .ops.layers import Policy, policy_for
from .scoring import score_sequences as _score_sequences
from .utils import params as param_utils

logger = logging.getLogger(__name__)
from .utils.hf_weights import convert_flamingo, convert_clip_vit, state_dict_to_numpy

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# pytree <-> flat dict (npz persistence)
# ---------------------------------------------------------------------------


def flatten_tree(tree, prefix="") -> Dict[str, np.ndarray]:
    """Flatten to {dotted.path: array}. List indices are marked ``#i`` so
    digit-keyed dicts (the xattn layer map) survive the round-trip."""
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}."))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_tree(v, f"{prefix}#{i}."))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]):
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split(".")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.startswith("#") for k in keys):
            return [listify(node[f"#{i}"]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


# ---------------------------------------------------------------------------


class FlamingoModel:
    """Stateful convenience wrapper: holds (config, params, policy)."""

    def __init__(self, config: FlamingoConfig, params: Optional[Params] = None,
                 *, rng: Optional[jax.Array] = None, with_vision: bool = True):
        if not self.is_lm_supported(config.lm):
            raise ValueError(f"unsupported language model {config.lm!r}")
        # full decode programs compile in minutes on TPU; persist them so a
        # serving process only pays per program shape once per machine
        # (utils/compile_cache; opt out with FLAMINGO_COMPILE_CACHE=off)
        from .utils.compile_cache import enable_compilation_cache
        enable_compilation_cache()
        self.config = config
        self.policy: Policy = policy_for(config.compute_dtype,
                                         getattr(config, "use_pallas", False))
        if params is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            params = F.init_flamingo(rng, config, with_vision=with_vision)
        self.params = params

    # -- registry --------------------------------------------------------
    _LANGUAGE_MODEL_PREFIXES = ("gpt2", "facebook/opt")

    @classmethod
    def is_lm_supported(cls, lm_id: str) -> bool:
        return any(lm_id.startswith(p) for p in cls._LANGUAGE_MODEL_PREFIXES)

    # -- persistence -----------------------------------------------------
    def save_pretrained(self, path: str, *, save_format: str = "npz") -> None:
        """Write config + weights to ``path``.

        ``save_format``: ``"npz"`` (native flat pytree), ``"hf"``
        (reference-layout ``flamingo.*`` state dict, vision excluded, loadable
        by the torch reference; modeling_flamingo.py:376 convention), or
        ``"both"``."""
        if save_format not in ("npz", "hf", "both"):
            raise ValueError(f"unknown save_format {save_format!r}")
        os.makedirs(path, exist_ok=True)
        self.config.save_pretrained(path)
        if save_format in ("npz", "both"):
            np.savez(os.path.join(path, "flamingo_tpu.npz"),
                     **flatten_tree(self.params))
        if save_format in ("hf", "both"):
            from .utils.hf_export import export_flamingo, save_hf_checkpoint
            state = export_flamingo(self.params, self.config.xattn_every)
            save_hf_checkpoint(state, path)

    def push_to_hub(self, repo_id: str, *, save_format: str = "both",
                    require_upload: bool = False) -> str:
        """Reference-API parity for ``PreTrainedModel.push_to_hub``
        (README.md:33). Zero-egress design: the checkpoint is staged into the
        local HF cache layout (``$HF_HOME/hub/models--org--name/snapshots``)
        so ``from_pretrained(repo_id)`` resolves it like any hub model; if
        ``huggingface_hub`` is importable AND the network is reachable, the
        repo is created (``exist_ok``) and the staged snapshot uploaded.
        Returns the staged snapshot dir; ``self.last_push_uploaded`` records
        whether the network upload happened. ``require_upload=True`` re-raises
        upload failures instead of degrading to staged-only."""
        from .utils.hub import stage_into_cache
        snap = stage_into_cache(repo_id, save=lambda d: self.save_pretrained(
            d, save_format=save_format))
        self.last_push_uploaded = False
        try:
            from huggingface_hub import HfApi
            api = HfApi()
            # a repo that doesn't exist yet makes upload_folder fail — create
            # it first (advisor r2 finding)
            api.create_repo(repo_id, repo_type="model", exist_ok=True)
            api.upload_folder(folder_path=snap, repo_id=repo_id,
                              repo_type="model")
            self.last_push_uploaded = True
        except Exception as e:  # offline / no token / package absent
            if require_upload:
                raise
            logger.warning(
                "hub upload failed (%s); checkpoint staged locally at %s — "
                "pass require_upload=True to make this an error", e, snap)
        return snap

    @classmethod
    def from_pretrained(cls, path: str, *, config: Optional[FlamingoConfig] = None,
                        vision_params: Optional[Params] = None,
                        clip_checkpoint: Optional[str] = None,
                        rng: Optional[jax.Array] = None) -> "FlamingoModel":
        """Load from a local directory containing config.json + weights
        (native npz or an HF torch checkpoint), or from a hub id like
        ``'dhansmair/flamingo-mini'`` resolved against the local HF cache
        (reference modeling_flamingo.py:359-376, README.md:33; zero-egress —
        never fetches)."""
        from .utils.hub import resolve_checkpoint_dir
        path = resolve_checkpoint_dir(path)
        if config is None:
            config = FlamingoConfig.from_pretrained(path)

        npz = os.path.join(path, "flamingo_tpu.npz")
        params: Optional[Params] = None
        if os.path.isfile(npz):
            with np.load(npz) as data:
                params = unflatten_tree({k: data[k] for k in data.files})
        else:
            sd = _load_torch_state_dict(path)
            if sd is not None:
                params = convert_flamingo(
                    sd, xattn_every=config.xattn_every,
                    n_lm_layers=F.n_lm_layers(config))

        if params is None:
            raise FileNotFoundError(
                f"no weights found under {path!r} (flamingo_tpu.npz, "
                "pytorch_model.bin or model.safetensors)")

        # vision tower: HF-format checkpoints exclude it (reference
        # modeling_flamingo.py:376) — re-init or load from a CLIP checkpoint
        if "vision" not in params:
            if vision_params is not None:
                params["vision"] = vision_params
            elif clip_checkpoint is not None:
                csd = _load_torch_state_dict(
                    resolve_checkpoint_dir(clip_checkpoint))
                params["vision"] = convert_clip_vit(csd)
            else:
                key = rng if rng is not None else jax.random.PRNGKey(0)
                from .models.clip_vit import init_clip_vit
                params["vision"] = init_clip_vit(key, config.vision_arch)

        return cls(config, params)

    # -- freeze machinery (reference modeling_flamingo.py:100-138) -------
    def trainable_mask(self) -> Params:
        lm_embed_key = "wte" if isinstance(self.config.lm_arch, GPT2Arch) else "embed_tokens"
        return param_utils.trainable_mask(
            self.params, freeze_lm=self.config.freeze_language_model,
            lm_embed_key=lm_embed_key)

    def parameters_trainable(self):
        mask = self.trainable_mask()
        trainable, _ = param_utils.partition_params(self.params, mask)
        return trainable

    def state_dict_trainable(self) -> Dict[str, jnp.ndarray]:
        return param_utils.state_dict_trainable(self.params, self.trainable_mask())

    def num_parameters(self, only_trainable: bool = False) -> int:
        if only_trainable:
            t = self.parameters_trainable()
            return sum(int(x.size) for x in jax.tree_util.tree_leaves(t) if x is not None)
        return param_utils.tree_size(self.params)

    # -- inference-deployment transforms ---------------------------------
    def to_bf16(self) -> "FlamingoModel":
        """Cast stored params to bf16 (halves decode HBM weight traffic).
        In-place; returns self. Use for inference, not training masters."""
        from .ops.quant import cast_params_bf16
        self.params = cast_params_bf16(self.params)
        return self

    def quantize_int8(self, include_xattn: bool = True) -> "FlamingoModel":
        """Weight-only int8 quantization of the decode-path weights (~2x
        less HBM weight traffic per decode step): the LM trunk and (by
        default) the gated-xattn blocks, which run every step and at
        flamingo-mini scale stream about as many weight bytes as the LM.
        In-place; returns self. Not available in float32 parity mode."""
        from .ops.quant import (quantize_gpt2_lm, quantize_opt_lm,
                                quantize_xattn_blocks)
        lm = self.params["lm"]
        if "wte" in lm:
            self.params["lm"] = quantize_gpt2_lm(lm)
        elif "embed_tokens" in lm:
            self.params["lm"] = quantize_opt_lm(lm)
        if include_xattn and "xattn" in self.params:
            self.params["xattn"] = quantize_xattn_blocks(self.params["xattn"])
        return self

    # -- forward ---------------------------------------------------------
    def __call__(self, input_ids, **kw) -> F.FlamingoOutput:
        return self.forward(input_ids, **kw)

    def forward(
        self,
        input_ids,
        *,
        media_locations=None,
        attention_mask=None,
        pixel_values=None,
        visual_features=None,
        labels=None,
        loss_reduction: str = "mean",
        context_mesh=None,
    ) -> F.FlamingoOutput:
        """``context_mesh``: route LM self-attention through ring attention
        (context parallelism for long sequences; padding masks supported —
        mask chunks rotate around the ring with K/V)."""
        return F.forward(
            self.params, self.config, jnp.asarray(input_ids),
            policy=self.policy,
            media_locations=_maybe(media_locations),
            attention_mask=_maybe(attention_mask),
            pixel_values=_maybe(pixel_values),
            visual_features=_maybe(visual_features),
            labels=_maybe(labels), loss_reduction=loss_reduction,
            context_mesh=context_mesh)

    def encode_resample_visuals(self, pixel_values) -> jnp.ndarray:
        return F.encode_resample_visuals(
            self.params, self.config, jnp.asarray(pixel_values),
            policy=self.policy)

    # -- generation ------------------------------------------------------
    def generate(
        self,
        input_ids,
        *,
        media_locations=None,
        attention_mask=None,
        pixel_values=None,
        visual_features=None,
        max_length: int = 150,
        max_new_tokens: Optional[int] = None,
        num_beams: int = 1,
        do_sample: bool = False,
        top_k: int = 0,
        top_p: float = 1.0,
        temperature: float = 1.0,
        min_p: float = 0.0,
        typical_p: float = 1.0,
        epsilon_cutoff: float = 0.0,
        eta_cutoff: float = 0.0,
        penalty_alpha: float = 0.0,
        repetition_penalty: float = 1.0,
        length_penalty: float = 1.0,
        early_stopping: bool = True,
        min_length: int = 0,
        min_new_tokens: int = 0,
        no_repeat_ngram_size: int = 0,
        bad_words_ids=None,
        force_words_ids=None,
        num_return_sequences: int = 1,
        num_beam_groups: int = 1,
        diversity_penalty: float = 0.0,
        forced_bos_token_id: Optional[int] = None,
        forced_eos_token_id: Optional[int] = None,
        suppress_tokens=None,
        begin_suppress_tokens=None,
        sequence_bias=None,
        exponential_decay_length_penalty=None,
        eos_token_id: Optional[int] = None,
        pad_token_id: Optional[int] = None,
        rng: Optional[jax.Array] = None,
        mesh=None,
        tensor_parallel: bool = False,
        int8_kv_cache: bool = False,
        prefix_block: int = 0,
        beam_reorder: str = "lazy",
        flat_kv_cache: bool = True,
        megakernel: bool = False,
        w8a8: bool = False,
        fused_head: bool = True,
        return_scores: bool = False,
        output_scores: bool = False,
    ) -> jnp.ndarray:
        """Generate token ids (b, max_length). With ``return_scores=True``
        returns ``(sequences, sequences_scores)``: beam search yields HF's
        length-penalized ``sequences_scores``; greedy/sample yield the sum of
        chosen-token log-probs under the per-step processed (and, when
        sampling, warped) distribution — HF
        ``compute_transition_scores(normalize_logits=True)`` summed over
        generated tokens (EOS included, post-EOS pads excluded).

        With ``output_scores=True`` (greedy/sample only) a per-step
        (b, max_length) f32 array is ALSO returned — each generated token's
        transition log-prob at its absolute sequence position, elementwise
        what HF ``compute_transition_scores(normalize_logits=True)`` reports
        per step (prompt slots and post-EOS pads hold 0.0). Combined
        ``return_scores=True, output_scores=True`` returns
        ``(sequences, sequences_scores, step_scores)``.

        ``fused_head=True`` (the default) routes the plain-greedy int8 path
        through the fused lm_head+argmax Pallas kernel
        (ops/pallas_lmhead.py); its argmax is bitwise-equal in exact
        arithmetic but the bf16 dot can flip near-tie argmaxes vs the XLA
        f32 head (~1 per 60 steps on a V=513 random-init test model —
        kernel docstring). Pass ``fused_head=False`` to reproduce pre-r4
        runs bit-for-bit. The kernel only engages when the compute policy
        is bfloat16 (matching numerics envelopes)."""
        arch = self.config.lm_arch
        eos = arch.eos_token_id if eos_token_id is None else eos_token_id
        pad = eos if pad_token_id is None else pad_token_id
        if bad_words_ids is not None:
            # HF NoBadWordsLogitsProcessor filters out a bad word equal to
            # [eos]: EOS must stay reachable (advisor r2 finding)
            bad_words_ids = [w for w in bad_words_ids
                             if not (len(w) == 1 and int(w[0]) == eos)]
        dc = DecodeConfig(
            max_length=max_length, max_new_tokens=max_new_tokens,
            eos_token_id=eos, pad_token_id=pad,
            do_sample=do_sample, top_k=top_k, top_p=top_p,
            temperature=temperature, min_p=min_p, typical_p=typical_p,
            epsilon_cutoff=epsilon_cutoff, eta_cutoff=eta_cutoff,
            penalty_alpha=penalty_alpha,
            repetition_penalty=repetition_penalty,
            num_beams=num_beams,
            length_penalty=length_penalty, early_stopping=early_stopping,
            min_length=min_length, min_new_tokens=min_new_tokens,
            no_repeat_ngram_size=no_repeat_ngram_size,
            bad_words_ids=None if bad_words_ids is None else tuple(
                tuple(int(t) for t in w) for w in bad_words_ids),
            # HF nested-list formats -> hashable constraint spec (phrasal =
            # List[int], disjunctive = List[List[int]])
            force_words_ids=None if force_words_ids is None else tuple(
                tuple(tuple(int(t) for t in alt) for alt in w)
                if w and isinstance(w[0], (list, tuple))
                else (tuple(int(t) for t in w),)
                for w in force_words_ids),
            num_return_sequences=num_return_sequences,
            num_beam_groups=num_beam_groups,
            diversity_penalty=diversity_penalty,
            forced_bos_token_id=forced_bos_token_id,
            forced_eos_token_id=forced_eos_token_id,
            suppress_tokens=None if suppress_tokens is None else tuple(
                int(t) for t in suppress_tokens),
            begin_suppress_tokens=None if begin_suppress_tokens is None
            else tuple(int(t) for t in begin_suppress_tokens),
            # HF accepts a dict {tuple(ids): bias} or list [[ids, bias]]
            sequence_bias=None if sequence_bias is None else tuple(
                (tuple(int(t) for t in w), float(v))
                for w, v in (sequence_bias.items()
                             if isinstance(sequence_bias, dict)
                             else sequence_bias)),
            exponential_decay_length_penalty=(
                None if exponential_decay_length_penalty is None
                else (int(exponential_decay_length_penalty[0]),
                      float(exponential_decay_length_penalty[1]))),
            int8_kv_cache=int8_kv_cache, prefix_block=prefix_block,
            beam_reorder=beam_reorder, flat_kv_cache=flat_kv_cache,
            megakernel=megakernel, w8a8=w8a8, fused_head=fused_head,
            return_scores=return_scores, output_scores=output_scores)
        return _generate(
            self.params, self.config, jnp.asarray(input_ids),
            policy=self.policy, dc=dc,
            media_locations=_maybe(media_locations),
            attention_mask=_maybe(attention_mask),
            pixel_values=_maybe(pixel_values),
            visual_features=_maybe(visual_features), rng=rng, mesh=mesh,
            tensor_parallel=tensor_parallel)

    def generate_captions(
        self,
        processor: FlamingoProcessor,
        pixel_values=None,
        images=None,
        prompt: str = "<image>",
        max_length: int = 150,
        num_beams: int = 1,
        **kw,
    ) -> List[str]:
        """Caption a batch of images (reference modeling_flamingo.py:550-605):
        prompt replicated per image, cached decode, tags stripped."""
        if images is not None:
            assert pixel_values is None, \
                "pass either images or pixel_values, not both"
            pixel_values = processor.preprocess_images(images)
        assert pixel_values is not None, "need images or pixel_values"
        if pixel_values.ndim == 4:
            pixel_values = pixel_values[:, None]  # (b, N=1, c, h, w)

        batch = pixel_values.shape[0]
        ids, media, mask = processor.encode_text(prompt)
        ids = jnp.tile(ids[:1], (batch, 1))
        media = jnp.tile(media[:1], (batch, 1))
        mask = jnp.tile(mask[:1], (batch, 1))

        out = self.generate(
            ids, media_locations=media, attention_mask=mask,
            pixel_values=pixel_values, max_length=max_length,
            num_beams=num_beams, **kw)
        texts = processor.tokenizer.batch_decode(
            np.asarray(out), skip_special_tokens=True)
        return processor.remove_tags(texts)

    # -- scoring ---------------------------------------------------------
    def score_sequences(self, input_ids, media_locations, attention_mask,
                        pixel_values=None, visual_features=None,
                        k: int = 100000, reuse_block: int = 0) -> jnp.ndarray:
        """``reuse_block > 0`` buckets the common-prefix length so serving
        does not recompile per prompt length; scores are unchanged (to float-reassociation precision)."""
        return _score_sequences(
            self.params, self.config, input_ids, media_locations,
            attention_mask, policy=self.policy, pixel_values=_maybe(pixel_values),
            visual_features=_maybe(visual_features), k=k,
            reuse_block=reuse_block)


def _maybe(x):
    return None if x is None else jnp.asarray(x)


def _load_torch_state_dict(path: str) -> Optional[Dict[str, np.ndarray]]:
    """Load an HF checkpoint's flat state dict as numpy (torch imported
    lazily; safetensors preferred when present)."""
    if os.path.isdir(path):
        for name in ("model.safetensors", "pytorch_model.bin"):
            f = os.path.join(path, name)
            if os.path.isfile(f):
                path = f
                break
        else:
            return None
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return load_file(path)
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return state_dict_to_numpy(sd)

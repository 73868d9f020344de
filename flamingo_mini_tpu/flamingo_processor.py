"""FlamingoProcessor: text + image preprocessing.

API-parity re-design of the reference processor
(/root/reference/flamingo_mini/flamingo_processor.py:11-147): same public
methods (``encode_text``, ``prepare_caption(s)``, ``remove_tags``,
``get_media_locations``, ``preprocess_images``, ``__call__``) and the same
semantics — ``<EOC>`` added token, pad=eos, BOS behavior matching the
reference's DEFAULT fast tokenizers (GPT-2: none — GPT2TokenizerFast ignores
add_bos_token; OPT: ``</s>``), media locations derived from the two "<"
token ids (with/without leading space; the ids differ: gpt2 27/1279,
opt 51552/28696 — flamingo_processor.py:53-61).

Differences by design:
* returns JAX arrays (device-resident), not torch tensors;
* images run through the on-device XLA pipeline (ops/image.py), not PIL;
* the tokenizer is the self-contained BPE (tokenizer.py) resolved from local
  vocab files — no hub download (zero-egress environments).
"""
from __future__ import annotations

from typing import List, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from .configuration_flamingo import FlamingoConfig
from .ops.image import preprocess_images as _preprocess_images
from .tokenizer import BPETokenizer


class FlamingoProcessor:
    def __init__(
        self,
        config: FlamingoConfig,
        tokenizer: Optional[BPETokenizer] = None,
        eoc_token: str = "<EOC>",
        vocab_path: Optional[str] = None,
        add_bos: Optional[bool] = None,
    ):
        """``add_bos=None`` keeps the per-family parity default (GPT-2: no
        BOS — the reference's fast tokenizer ignores add_bos_token; OPT:
        </s> prepended). Pass True/False to override (True mimics the
        reference's use_fast=False path for GPT-2)."""
        self.config = config
        self.eoc_token = eoc_token
        if tokenizer is None:
            if config.lm.startswith("gpt"):
                tokenizer = (BPETokenizer.gpt2(vocab_path) if add_bos is None
                             else BPETokenizer.gpt2(vocab_path, add_bos=add_bos))
            elif config.lm.startswith("facebook/opt"):
                tokenizer = (BPETokenizer.opt(vocab_path) if add_bos is None
                             else BPETokenizer.opt(vocab_path, add_bos=add_bos))
            else:
                raise ValueError(f"unsupported lm {config.lm!r}")
        elif add_bos is not None:
            tokenizer.add_bos = add_bos
        self.tokenizer = tokenizer
        self.eoc_token_id = self.tokenizer.add_token(eoc_token)

        # "<" token ids with/without preceding whitespace — media locations
        # mark the '<' of '<image>' (flamingo_processor.py:53-61)
        self.leq_ids = [
            self.tokenizer.encode("<", add_special_tokens=False)[-1],
            self.tokenizer.encode(" <", add_special_tokens=False)[-1],
        ]

        arch = config.vision_arch
        self._image_size = arch.image_size
        self._image_mean = tuple(arch.image_mean)
        self._image_std = tuple(arch.image_std)

    # -- text ------------------------------------------------------------
    def encode_text(
        self,
        text: Union[str, List[str]],
        *,
        length: Optional[int] = None,
        max_length: Optional[int] = None,
        pad_side: str = "left",
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Tokenize -> (input_ids, media_locations, attention_mask).

        Batches are padded to a common length with pad=eos. Padding side
        defaults to LEFT (correct for decoder-only generation and required by
        the static-shape decode loop; the reference right-pads and inherits
        HF's known right-pad generation artifacts).
        """
        if isinstance(text, str):
            text = [text]
        encoded = [self.tokenizer.encode(t) for t in text]
        if length is not None:
            encoded = [e[:length] for e in encoded]
            width = length
        else:
            width = max(len(e) for e in encoded)
            if max_length is not None:
                encoded = [e[:max_length] for e in encoded]
                width = min(width, max_length)
        pad_id = self.tokenizer.pad_token_id
        b = len(encoded)
        ids = np.full((b, width), pad_id, np.int32)
        mask = np.zeros((b, width), np.int32)
        for i, e in enumerate(encoded):
            if pad_side == "left":
                ids[i, width - len(e):] = e
                mask[i, width - len(e):] = 1
            else:
                ids[i, :len(e)] = e
                mask[i, :len(e)] = 1
        ids_j = jnp.asarray(ids)
        return ids_j, self.get_media_locations(ids_j), jnp.asarray(mask)

    def get_media_locations(self, input_ids) -> jnp.ndarray:
        """1 where the token is '<' of an '<image>' tag (either id variant);
        reference flamingo_processor.py:120-121."""
        arr = jnp.asarray(input_ids)
        out = jnp.zeros_like(arr, dtype=bool)
        for leq in self.leq_ids:
            out = out | (arr == leq)
        # OR, not sum: with a vocab where "<" and " <" share an id (no
        # leading-space merge) a sum would double-count each tag, pushing
        # text_time past the media count
        return out.astype(arr.dtype)

    def prepare_caption(self, caption: str) -> str:
        """'<image>' + caption + '<EOC>' + eos (BOS comes from the tokenizer);
        reference flamingo_processor.py:100-103."""
        return "<image>" + caption + self.eoc_token + self.tokenizer.eos_token

    def prepare_captions(self, captions: List[str]) -> List[str]:
        return [self.prepare_caption(c) for c in captions]

    def _remove_tags(self, text: str) -> str:
        for s in ("<image>", self.tokenizer.eos_token, self.eoc_token,
                  self.tokenizer.pad_token):
            text = text.replace(s, "")
        return text.strip()

    def remove_tags(self, text: Union[str, List[str]]):
        if isinstance(text, str):
            return self._remove_tags(text)
        return [self._remove_tags(t) for t in text]

    # -- images ----------------------------------------------------------
    def preprocess_images(self, images, exact: bool = False) -> jnp.ndarray:
        """PIL images / HWC arrays -> (n, 3, H, W) CLIP-normalized pixels.

        ``exact=True`` routes through the host-side PIL pipeline that is
        bit-for-bit identical to the reference's CLIPImageProcessor (use for
        reference-checkpoint token parity from image files); the default is
        the on-device XLA pipeline."""
        if not isinstance(images, (list, tuple)):
            images = [images]
        if exact:
            from .ops.image import preprocess_images_pil
            return jnp.asarray(preprocess_images_pil(
                images, size=self._image_size, crop=self._image_size,
                mean=self._image_mean, std=self._image_std))
        return _preprocess_images(
            images, size=self._image_size, crop=self._image_size,
            mean=self._image_mean, std=self._image_std)

    def __call__(self, images=None, text=None):
        result = {}
        if images is not None:
            result["pixel_values"] = self.preprocess_images(images)
        if text is not None:
            ids, media, mask = self.encode_text(text)
            result["input_ids"] = ids
            result["media_locations"] = media
            result["attention_mask"] = mask
        return result

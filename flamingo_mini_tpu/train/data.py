"""Training data pipeline.

Mirrors the reference's COCO pipeline semantics
(/root/reference/training/train.py:37-84):

* caption template ``f"{random ['' or ' ']}<image>{caption}<EOC></s>"`` — the
  random leading space varies the '<' token id between the two leq_ids
  (train.py:56), exercising both media-location variants;
* the collator tokenizes the batch, stacks pixel values, and sets
  ``labels = input_ids`` (loss over the full sequence; pads are eos);
* images: any callable dataset yielding (image, captions) works. A COCO
  adapter (torchvision, when data is present) and a synthetic dataset (for
  tests/benches, no downloads) are provided.

TPU-native departures: fixed ``length`` padding (static shapes for jit),
right-padding for training batches (loss is position-independent; generation
uses left-padding separately).
"""
from __future__ import annotations

import random
from dataclasses import dataclass
from typing import Any, Iterator, Optional, Sequence

import numpy as np

from ..flamingo_processor import FlamingoProcessor


@dataclass
class CaptionSample:
    image: Any                 # HWC uint8 array or PIL image
    caption: str


class SyntheticCaptionDataset:
    """Deterministic synthetic (image, caption) pairs — no downloads."""

    def __init__(self, size: int = 256, image_hw: int = 64,
                 vocab: Optional[Sequence[str]] = None, seed: int = 0):
        self.size = size
        self.image_hw = image_hw
        self.vocab = list(vocab or ["a", "cat", "dog", "picture", "of", "red",
                                    "blue", "small", "big", "bird"])
        self.seed = seed

    def __len__(self):
        return self.size

    def __getitem__(self, i: int) -> CaptionSample:
        rs = np.random.RandomState(self.seed + i)
        img = rs.randint(0, 255, (self.image_hw, self.image_hw, 3), np.uint8)
        words = [self.vocab[rs.randint(len(self.vocab))]
                 for _ in range(rs.randint(3, 8))]
        return CaptionSample(image=img, caption=" ".join(words))


class CocoCaptionDataset:
    """COCO Captions via torchvision (requires local data; the reference uses
    hardcoded paths, training/train.py:32-34). One random caption per image
    is chosen at access time, as in the reference (train.py:56)."""

    def __init__(self, root: str, ann_file: str):
        from torchvision.datasets import CocoCaptions  # lazy; torch cpu ok
        self.ds = CocoCaptions(root=root, annFile=ann_file)

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i: int) -> CaptionSample:
        img, captions = self.ds[i]
        return CaptionSample(image=img, caption=random.choice(captions))


class CocoCaptionEvalDataset:
    """COCO val split for captioning eval: yields (image, ALL reference
    captions) — the shape evaluate_image_captioning consumes (the reference
    evaluates COCO *val* with every annotation as a reference;
    training/train.py:160-168, eval.py:27-62)."""

    def __init__(self, root: str, ann_file: str):
        from torchvision.datasets import CocoCaptions
        self.ds = CocoCaptions(root=root, annFile=ann_file)

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i: int):
        img, captions = self.ds[i]
        return img, list(captions)


class SyntheticEvalDataset:
    """(image, [caption]) view over SyntheticCaptionDataset for eval."""

    def __init__(self, ds: SyntheticCaptionDataset):
        self.ds = ds

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i: int):
        s = self.ds[i]
        return s.image, [s.caption]


class DataCollator:
    """Samples -> model batch dict (numpy; device placement happens in the
    trainer via shard_batch)."""

    def __init__(self, processor: FlamingoProcessor, length: int = 64,
                 random_leading_space: bool = True, hflip_prob: float = 0.5,
                 seed: int = 0):
        self.processor = processor
        self.length = length
        self.random_leading_space = random_leading_space
        # train-time augmentation: the reference composes RandomHorizontalFlip
        # (p=0.5) BEFORE the CLIP transform (reference training/train.py:40-45)
        self.hflip_prob = hflip_prob
        self._rng = random.Random(seed)

    def _maybe_flip(self, image):
        if self.hflip_prob > 0 and self._rng.random() < self.hflip_prob:
            return np.asarray(image)[:, ::-1]
        return image

    def __call__(self, samples: Sequence[CaptionSample]) -> dict:
        texts = []
        for s in samples:
            lead = self._rng.choice(["", " "]) if self.random_leading_space else ""
            texts.append(lead + self.processor.prepare_caption(s.caption))
        pixels = self.processor.preprocess_images(
            [self._maybe_flip(s.image) for s in samples])
        ids, media, mask = self.processor.encode_text(
            texts, length=self.length, pad_side="right")
        return {
            "input_ids": np.asarray(ids),
            "media_locations": np.asarray(media),
            "attention_mask": np.asarray(mask),
            "pixel_values": np.asarray(pixels)[:, None],  # (b, N=1, c, h, w)
            "labels": np.asarray(ids),
        }


def batches(dataset, collator: DataCollator, batch_size: int,
            shuffle: bool = True, seed: int = 0,
            drop_last: bool = True) -> Iterator[dict]:
    """Simple host-side batch iterator (one epoch)."""
    idx = np.arange(len(dataset))
    if shuffle:
        np.random.RandomState(seed).shuffle(idx)
    for start in range(0, len(idx), batch_size):
        chunk = idx[start:start + batch_size]
        if drop_last and len(chunk) < batch_size:
            return
        yield collator([dataset[int(i)] for i in chunk])


def prefetch_to_device(batch_iter: Iterator[dict], cast_pixels=None,
                       mesh=None) -> Iterator[dict]:
    """Overlap host->device batch transfer with the previous step's compute.

    ``jax.device_put`` dispatches asynchronously, so issuing batch i+1's
    transfer BEFORE yielding batch i hides the copy behind the step running
    on batch i. On remote-attached devices (this sandbox's TPU tunnel) the
    un-prefetched transfer costs more than the train step itself (~115 ms
    vs 87 ms for flamingo-mini bs=8 — see BENCH.md), so this is the
    difference between transfer-bound and compute-bound training.

    ``cast_pixels``: optional fn applied to ``pixel_values`` after the put
    (e.g. ``policy.cast`` to bf16). ``mesh``: shard the batch over the
    mesh's data axis at transfer time (multi-device).
    """
    import jax

    def put(b):
        if mesh is not None and len(mesh.devices.flat) > 1:
            from ..parallel.sharding import shard_batch
            b = {k: np.asarray(v) for k, v in b.items()}
            b = shard_batch(b, mesh)
        else:
            b = {k: jax.device_put(np.asarray(v)) for k, v in b.items()}
        if cast_pixels is not None and "pixel_values" in b:
            b = dict(b)
            b["pixel_values"] = cast_pixels(b["pixel_values"])
        return b

    it = iter(batch_iter)
    try:
        pending = put(next(it))
    except StopIteration:
        return
    for nxt in it:
        nxt_dev = put(nxt)      # async dispatch; overlaps the consumer step
        yield pending
        pending = nxt_dev
    yield pending

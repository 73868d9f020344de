"""On-device image preprocessing (CLIPImageProcessor equivalent).

The reference routes every image through PIL on the host
(``CLIPImageProcessor``; /root/reference/flamingo_mini/flamingo_processor.py:33,
:123-128). Here the resize/center-crop/rescale/normalize chain is a
jit-compiled JAX function: decode-once on host, then the whole batch is
transformed on the TPU (bicubic resize == one gather-matmul pair per axis,
normalize fuses into the ViT's first GEMM).

Pipeline parity with CLIPImageProcessor defaults:
  1. resize shortest edge -> ``size`` (bicubic, antialiased)
  2. center crop ``crop x crop``
  3. scale 1/255
  4. normalize with CLIP mean/std
Output layout (b, 3, crop, crop) float32 — what the vision tower consumes.

PIL's bicubic and XLA's differ by ~1e-2 after rescale (different antialias
windows); this is irrelevant for caption quality but means pixel-level
bitwise parity with the torch pipeline is not a goal here (greedy-token
parity tests feed identical pixel_values instead).
"""
from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@partial(jax.jit, static_argnames=("size", "crop"))
def _resize_crop_one(img: jnp.ndarray, size: int, crop: int) -> jnp.ndarray:
    """(H, W, 3) uint8/float -> (3, crop, crop) float32 in [0, 1]."""
    h, w = img.shape[0], img.shape[1]
    if h <= w:
        nh, nw = size, max(int(round(w * size / h)), size)
    else:
        nh, nw = max(int(round(h * size / w)), size), size
    x = jax.image.resize(img.astype(jnp.float32), (nh, nw, 3), method="bicubic",
                         antialias=True)
    top = (nh - crop) // 2
    left = (nw - crop) // 2
    x = jax.lax.dynamic_slice(x, (top, left, 0), (crop, crop, 3))
    return jnp.clip(x, 0.0, 255.0).transpose(2, 0, 1) / 255.0


@partial(jax.jit, static_argnames=())
def normalize(x: jnp.ndarray,
              mean: Tuple[float, ...] = CLIP_MEAN,
              std: Tuple[float, ...] = CLIP_STD) -> jnp.ndarray:
    """(..., 3, H, W) in [0,1] -> CLIP-normalized."""
    mean_a = jnp.asarray(mean, jnp.float32)[:, None, None]
    std_a = jnp.asarray(std, jnp.float32)[:, None, None]
    return (x - mean_a) / std_a


def preprocess_images_pil(
    images: Sequence,
    *,
    size: int = 224,
    crop: int = 224,
    mean: Tuple[float, ...] = CLIP_MEAN,
    std: Tuple[float, ...] = CLIP_STD,
) -> np.ndarray:
    """Host-side PIL-EXACT preprocessing (opt-in parity path).

    Bit-for-bit identical to ``CLIPImageProcessor`` (the reference's pixel
    pipeline, flamingo_processor.py:33,123-128): PIL bicubic resize of the
    shortest edge, center crop, *1/255 rescale, float32 normalize. Use this
    when decoding from image FILES must reproduce reference-checkpoint
    tokens exactly; the XLA pipeline (preprocess_images) is the production
    default (~1e-2 off PIL's antialias window, irrelevant to quality).

    Returns a numpy (n, 3, crop, crop) float32 batch.
    """
    from PIL import Image

    out = []
    for im in images:
        if not hasattr(im, "convert"):
            arr = np.asarray(im)
            if arr.ndim == 2:
                arr = np.stack([arr] * 3, axis=-1)
            im = Image.fromarray(arr.astype(np.uint8))
        im = im.convert("RGB")
        w, h = im.size
        # HF get_resize_output_image_size(default_to_square=False):
        # new_long = int(size * long / short)
        short, long = (w, h) if w <= h else (h, w)
        new_short, new_long = size, int(size * long / short)
        nw, nh = (new_short, new_long) if w <= h else (new_long, new_short)
        im = im.resize((nw, nh), resample=Image.BICUBIC)
        arr = np.asarray(im)                                  # (nh, nw, 3) u8
        top = (nh - crop) // 2
        left = (nw - crop) // 2
        arr = arr[top:top + crop, left:left + crop]
        # HF rescale: float multiply then astype(float32)
        x = (arr * (1.0 / 255.0)).astype(np.float32)
        # HF normalize: channels-last, mean/std cast to image dtype
        m = np.array(mean, dtype=x.dtype)
        s = np.array(std, dtype=x.dtype)
        x = (x - m) / s
        out.append(x.transpose(2, 0, 1))                      # channel-first
    return np.stack(out)


def preprocess_images(
    images: Sequence,
    *,
    size: int = 224,
    crop: int = 224,
    mean: Tuple[float, ...] = CLIP_MEAN,
    std: Tuple[float, ...] = CLIP_STD,
) -> jnp.ndarray:
    """PIL images / HWC uint8 arrays -> (n, 3, crop, crop) pixel values.

    Per-image resize is jitted per input shape (shape-polymorphic batching is
    impossible under XLA; distinct source sizes are rare and cached).
    """
    out = []
    for im in images:
        if hasattr(im, "convert"):  # PIL image
            im = np.asarray(im.convert("RGB"))
        im = np.asarray(im)
        if im.ndim == 2:
            im = np.stack([im] * 3, axis=-1)
        out.append(_resize_crop_one(jnp.asarray(im), size, crop))
    batch = jnp.stack(out)
    return normalize(batch, tuple(mean), tuple(std))

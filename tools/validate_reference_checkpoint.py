#!/usr/bin/env python
"""Runbook: bitwise greedy-decode validation against a REAL reference
checkpoint (VERDICT r2 missing #1).

BASELINE.md claims "bitwise-matched greedy decode on `dhansmair/flamingo-mini`
checkpoints". The test suite proves parity against the imported torch
reference on config-built random weights (tests/test_parity_flamingo.py) —
the right oracle under zero egress — but that leaves the real-checkpoint
claim an inference. This script makes it a runnable fact whenever the HF
cache is warm, and SKIPS with a precise shopping list when it is cold:

    python tools/validate_reference_checkpoint.py                 # flamingo-mini
    python tools/validate_reference_checkpoint.py dhansmair/flamingo-tiny
    python tools/validate_reference_checkpoint.py --max-new-tokens 20

What it does (all offline; nothing is fetched):
  1. resolve the checkpoint, its CLIP tower (config.clip_model_type), and the
     LM hub weights (config.lm — the torch reference re-instantiates both
     towers from hub ids, /root/reference/flamingo_mini/modeling_flamingo.py:63,318)
     from the local HF cache; missing anything -> SKIP (exit 0, reason printed)
  2. build OUR model: FlamingoModel.from_pretrained(repo) + CLIP converter
  3. build the TORCH reference: flamingo_mini.FlamingoModel.from_pretrained
     with HF offline mode (+ the same transformers block-signature adapter
     the test suite uses)
  4. pixel parity: our PIL-exact preprocessing (ops/image.py:61-108) vs the
     reference CLIPImageProcessor on a deterministic synthetic image —
     asserted bit-for-bit
  5. greedy decode both on identical pixel_values/input_ids, fp32 PARITY
     policy, and assert token-for-token equality

Exit codes: 0 = VALIDATED or SKIPPED (line 1 of stdout says which),
1 = MISMATCH or error.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")


class Skip(Exception):
    """Cache cold — validation cannot run here (not a failure)."""


def _resolve_or_skip(repo_id: str, what: str, required=("config.json",)):
    from flamingo_mini_tpu.utils.hub import resolve_checkpoint_dir
    try:
        return resolve_checkpoint_dir(repo_id, required=required)
    except FileNotFoundError as e:
        raise Skip(f"{what} ({repo_id!r}) not in the local HF cache: {e}")


def _weights_required(snap_dir: str):
    for name in ("pytorch_model.bin", "model.safetensors",
                 "flamingo_tpu.npz"):
        if os.path.isfile(os.path.join(snap_dir, name)):
            return
    raise Skip(f"snapshot {snap_dir} has config.json but no weight file")


def _install_reference(repo_path: str = "/root/reference"):
    if "einops_exts" not in sys.modules:
        import einops
        m = types.ModuleType("einops_exts")
        m.rearrange_many = lambda xs, *a, **k: [
            einops.rearrange(x, *a, **k) for x in xs]
        m.repeat_many = lambda xs, *a, **k: [
            einops.repeat(x, *a, **k) for x in xs]
        sys.modules["einops_exts"] = m
    if repo_path not in sys.path:
        sys.path.insert(0, repo_path)
    import flamingo_mini as ref
    return ref


def _adapt_blocks(model):
    """transformers>=4.3x GPT2Block signature adapter (same shim as
    tests/bench): the reference's hijacked forward predates kwargs-only
    block calls."""
    for layer in model.flamingo.get_modified_layers():
        def make_fwd(mb):
            def fwd(hidden_states, past_key_values=None, cache_position=None,
                    attention_mask=None, head_mask=None,
                    encoder_hidden_states=None, use_cache=False, **kw):
                hidden_states, kv = mb.xattn_block(
                    y=hidden_states, visual_features=mb.visual_features,
                    media_locations=mb.media_locations,
                    previous_kv=mb.xattn_layer_past, output_kv=use_cache)
                mb.kv_output = kv
                return mb.lm_block(hidden_states, past_key_values,
                                   cache_position, attention_mask, head_mask,
                                   encoder_hidden_states, use_cache=use_cache,
                                   **kw)
            return fwd
        layer.forward = make_fwd(layer)


def _synthetic_image(size: int):
    """Deterministic RGB test card: gradients + blocks (seeded, no files)."""
    import numpy as np
    from PIL import Image
    rs = np.random.RandomState(0)
    h = w = size * 2  # force a real resize+crop through both pipelines
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack([
        (255 * x / w), (255 * y / h),
        rs.randint(0, 255, (h, w)),
    ], axis=-1).astype("uint8")
    return Image.fromarray(img, "RGB")


def run_validation(repo_id: str, max_new_tokens: int = 20, batch: int = 2):
    import numpy as np

    # ---- 1. resolve everything or skip --------------------------------
    snap = _resolve_or_skip(repo_id, "flamingo checkpoint")
    _weights_required(snap)
    with open(os.path.join(snap, "config.json")) as f:
        cfg_json = json.load(f)
    clip_id = cfg_json.get("clip_model_type", "openai/clip-vit-base-patch32")
    lm_id = cfg_json.get("lm", "gpt2")
    clip_snap = _resolve_or_skip(clip_id, "CLIP vision tower")
    clip_w = None
    for name in ("pytorch_model.bin", "model.safetensors"):
        if os.path.isfile(os.path.join(clip_snap, name)):
            clip_w = name
    if clip_w is None:
        raise Skip(f"CLIP snapshot {clip_snap} has no weight file")
    lm_snap = _resolve_or_skip(lm_id, "LM hub weights (torch reference "
                               "re-instantiates the trunk from the hub id)")
    del lm_snap  # existence is all the torch loader needs

    # ---- 2. our model --------------------------------------------------
    import jax.numpy as jnp
    from flamingo_mini_tpu import FlamingoModel
    from flamingo_mini_tpu.ops.layers import PARITY

    ours = FlamingoModel.from_pretrained(repo_id, clip_checkpoint=clip_id)
    ours.policy = PARITY  # fp32 numerics for the bitwise claim
    arch = ours.config.vision_arch

    # ---- 3. torch reference --------------------------------------------
    # NOT via PreTrainedModel.from_pretrained: modern transformers
    # instantiates on the meta device first, and the reference's __init__
    # calls resize_token_embeddings there (modeling_flamingo.py:323), which
    # crashes ("Tensor.item() cannot be called on meta tensors"). Plain
    # __init__ (real tensors; towers from the cached hub snapshots) + a
    # manual state_dict load is weight-identical.
    import torch
    ref = _install_reference()
    ref_cfg = ref.FlamingoConfig.from_pretrained(snap)
    ref_model = ref.FlamingoModel(ref_cfg)
    sd = None
    bin_path = os.path.join(snap, "pytorch_model.bin")
    st_path = os.path.join(snap, "model.safetensors")
    if os.path.isfile(bin_path):
        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
    elif os.path.isfile(st_path):
        from safetensors.torch import load_file
        sd = load_file(st_path)
    else:
        raise Skip(f"no torch weight file under {snap} for the reference "
                   "loader (flamingo_tpu.npz alone cannot drive the torch "
                   "side)")
    res = ref_model.load_state_dict(sd, strict=False)
    bad = [k for k in res.missing_keys
           if not (k.startswith("flamingo.vision_encoder.")
                   or k.endswith((".attn.bias", ".attn.masked_bias"))
                   or k == "flamingo.lm_head.weight")]  # tied
    if bad:
        return {"status": "MISMATCH", "stage": "state_dict",
                "missing_keys": bad[:10],
                "unexpected_keys": list(res.unexpected_keys)[:10]}
    with torch.no_grad():  # re-tie the head to the loaded embedding
        ref_model.flamingo.lm_head.weight = \
            ref_model.flamingo.lm.get_input_embeddings().weight
    ref_model.eval()
    _adapt_blocks(ref_model)

    # ---- 4. pixel parity (PIL-exact path vs CLIPImageProcessor) --------
    from transformers import CLIPImageProcessor
    try:
        hf_proc = CLIPImageProcessor.from_pretrained(clip_id)
    except Exception:
        hf_proc = CLIPImageProcessor()  # openai defaults
        hf_proc.size = {"shortest_edge": arch.image_size}
        hf_proc.crop_size = {"height": arch.image_size,
                             "width": arch.image_size}
    img = _synthetic_image(arch.image_size)
    from flamingo_mini_tpu.ops.image import preprocess_images_pil
    ours_px = np.asarray(preprocess_images_pil(
        [img], size=arch.image_size, crop=arch.image_size))
    ref_px = hf_proc(images=[img], return_tensors="np")["pixel_values"]
    if not np.array_equal(ours_px.astype(np.float32),
                          ref_px.astype(np.float32)):
        diff = float(np.abs(ours_px - ref_px).max())
        return {"status": "MISMATCH", "stage": "pixels", "max_abs_diff": diff}

    # ---- 5. bitwise greedy decode --------------------------------------
    pixel_values = np.tile(ref_px[None], (batch, 1, 1, 1, 1))  # (b,1,c,h,w)
    # prompt: "<image>" via the reference's own processor when tokenizer
    # files are cached; deterministic raw ids otherwise (parity does not
    # require meaningful text)
    try:
        proc = ref.FlamingoProcessor(ref_model.config)
        enc = proc.encode_text("<image>A picture of")
        input_ids = enc[0].numpy() if isinstance(enc, (tuple, list)) else \
            enc["input_ids"].numpy()
        input_ids = np.tile(input_ids[:1], (batch, 1))
        media = proc.get_media_locations(torch.tensor(input_ids)).numpy()
    except Exception:
        rs = np.random.RandomState(1)
        hi = min(1000, ours.config.lm_arch.vocab_size - 1)
        input_ids = rs.randint(1, hi, (batch, 6)).astype(np.int64)
        media = np.zeros_like(input_ids)
        media[:, 0] = 1
    attn = np.ones_like(input_ids)
    max_length = input_ids.shape[1] + max_new_tokens
    eos = int(getattr(ref_model.flamingo.lm.config, "eos_token_id", 50256)
              or 50256)

    # explicit greedy KV-cache loop (HF generate semantics: argmax, pad=eos
    # after finish, stop when all rows finished). transformers>=4.50 removed
    # GenerationMixin from PreTrainedModel, so the reference's .generate is
    # unavailable in modern envs; this loop IS what it ran for num_beams=1
    # (reference modeling_flamingo.py:464-523 prepare_inputs + HF greedy).
    with torch.no_grad():
        t_ids = torch.tensor(input_ids)
        t_media = torch.tensor(media)
        m = torch.tensor(attn)
        out = ref_model.flamingo(
            input_ids=t_ids, media_locations=t_media, attention_mask=m,
            pixel_values=torch.tensor(pixel_values), use_cache=True)
        past = out.past_key_values
        tok = out.logits[:, -1].argmax(-1)
        finished = tok == eos
        seq = torch.cat([t_ids, tok[:, None]], dim=1)
        while seq.shape[1] < max_length and not bool(finished.all()):
            m = torch.cat([m, torch.ones(batch, 1, dtype=m.dtype)], dim=1)
            out = ref_model.flamingo(
                input_ids=tok[:, None], media_locations=t_media,
                attention_mask=m, past_key_values=past, use_cache=True)
            past = out.past_key_values
            nxt = out.logits[:, -1].argmax(-1)
            nxt = torch.where(finished, torch.full_like(nxt, eos), nxt)
            finished |= nxt == eos
            seq = torch.cat([seq, nxt[:, None]], dim=1)
            tok = nxt
        want = seq.numpy()

    got = np.asarray(ours.generate(
        jnp.asarray(input_ids), media_locations=jnp.asarray(media),
        attention_mask=jnp.asarray(attn),
        pixel_values=jnp.asarray(pixel_values, jnp.float32),
        max_length=max_length, eos_token_id=eos, pad_token_id=eos))

    want_len = want.shape[1]
    ok = np.array_equal(got[:, :want_len], want) and \
        bool(np.all(got[:, want_len:] == eos))
    result = {
        "status": "VALIDATED" if ok else "MISMATCH",
        "stage": "greedy" if not ok else None,
        "repo": repo_id, "lm": lm_id, "clip": clip_id,
        "batch": batch, "max_new_tokens": max_new_tokens,
        "tokens_compared": int(want.size),
    }
    if not ok:
        first = int(np.argwhere(got[:, :want_len] != want)[0][1]) \
            if got[:, :want_len].shape == want.shape else -1
        result["first_divergence_pos"] = first
        result["want"] = want.tolist()
        result["got"] = got[:, :want_len].tolist()
    return result


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("repo_id", nargs="?", default="dhansmair/flamingo-mini")
    ap.add_argument("--max-new-tokens", type=int, default=20)
    ap.add_argument("--batch", type=int, default=2)
    args = ap.parse_args()
    try:
        result = run_validation(args.repo_id, args.max_new_tokens, args.batch)
    except Skip as s:
        print(f"SKIPPED: {s}")
        print("warm the cache on a networked machine with:\n"
              f"  huggingface-cli download {args.repo_id}\n"
              "  huggingface-cli download <clip_model_type from its config>\n"
              "  huggingface-cli download <lm from its config>")
        return 0
    print(result["status"])
    print(json.dumps(result, indent=2))
    return 0 if result["status"] == "VALIDATED" else 1


if __name__ == "__main__":
    sys.exit(main())

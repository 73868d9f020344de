#!/usr/bin/env python
"""Convert a reference (HF PyTorch) flamingo-mini checkpoint to native format.

Usage:
  python tools/convert_checkpoint.py SRC_DIR DST_DIR [--clip-checkpoint DIR]

SRC_DIR: an HF checkpoint directory (config.json + pytorch_model.bin or
model.safetensors), e.g. a local clone of dhansmair/flamingo-mini. As in the
reference, such checkpoints exclude the CLIP vision tower
(/root/reference/flamingo_mini/modeling_flamingo.py:376); pass
--clip-checkpoint with a local CLIP checkpoint to embed it, otherwise the
tower is randomly initialized (fine for decode-parity testing, wrong for real
captions).

Also copies tokenizer vocab files (vocab.json/merges.txt) into DST_DIR when
present so the converted directory is fully self-contained offline.
"""
import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flamingo_mini_tpu import FlamingoModel


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--clip-checkpoint", default=None)
    args = ap.parse_args()

    model = FlamingoModel.from_pretrained(
        args.src, clip_checkpoint=args.clip_checkpoint)
    model.save_pretrained(args.dst)

    for name in ("vocab.json", "merges.txt", "tokenizer.json"):
        src = os.path.join(args.src, name)
        if os.path.isfile(src):
            shutil.copy(src, os.path.join(args.dst, name))

    n = model.num_parameters()
    print(f"converted {args.src} -> {args.dst} ({n:,} params, "
          f"vision={'from ' + args.clip_checkpoint if args.clip_checkpoint else 'random-init'})")


if __name__ == "__main__":
    main()

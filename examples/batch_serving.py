"""Throughput-oriented batch captioning (deployment recipe).

Demonstrates the inference-deployment transforms and the production serving
loop shape: load once, `to_bf16()` (+ optionally `quantize_int8()`), compile
once per (batch, max_length) bucket, then stream batches through the single
jitted program. All heavy state stays device-resident between requests.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flamingo_mini_tpu import FlamingoConfig, FlamingoModel, FlamingoProcessor
from flamingo_mini_tpu.tokenizer import build_toy_tokenizer


def main():
    ckpt = os.environ.get("FLAMINGO_CKPT")
    if ckpt:
        model = FlamingoModel.from_pretrained(ckpt)
        processor = FlamingoProcessor(model.config)
    else:
        config = FlamingoConfig(lm="gpt2", dim=768, dim_visual=768,
                                compute_dtype="bfloat16")
        model = FlamingoModel(config)
        processor = FlamingoProcessor(config, tokenizer=build_toy_tokenizer(
            ["image", "a", "picture", "of"]))

    # deployment transforms: bf16 weight storage (+ int8 for the LM trunk)
    model.to_bf16()
    if os.environ.get("FLAMINGO_INT8") == "1":
        model.quantize_int8()

    batch, max_length = 16, 36
    rs = np.random.RandomState(0)

    def batch_of_images(seed):
        return [rs.randint(0, 255, (224, 224, 3), np.uint8) for _ in range(batch)]

    # first batch compiles; subsequent batches reuse the program
    for i in range(3):
        t0 = time.perf_counter()
        caps = model.generate_captions(processor, images=batch_of_images(i),
                                       max_length=max_length)
        dt = time.perf_counter() - t0
        label = "compile+run" if i == 0 else "run"
        print(f"batch {i} ({label}): {dt:.2f}s  "
              f"({batch/dt:.1f} captions/s)  e.g. {caps[0][:40]!r}")


if __name__ == "__main__":
    main()

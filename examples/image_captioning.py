"""Image captioning demo (reference examples/image_captioning.py parity).

With a converted checkpoint directory (and local vocab files) this produces
the same captions as the reference; without one it runs on random weights to
demonstrate the API.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flamingo_mini_tpu import FlamingoConfig, FlamingoModel, FlamingoProcessor


def main():
    ckpt = os.environ.get("FLAMINGO_CKPT")
    if ckpt:
        model = FlamingoModel.from_pretrained(ckpt)
        processor = FlamingoProcessor(model.config)
    else:
        print("FLAMINGO_CKPT not set -> random weights + toy tokenizer demo")
        from flamingo_mini_tpu.tokenizer import build_toy_tokenizer
        config = FlamingoConfig(
            lm="gpt2", dim=768, dim_visual=768, compute_dtype="bfloat16")
        model = FlamingoModel(config)
        processor = FlamingoProcessor(
            config, tokenizer=build_toy_tokenizer(
                ["image", "a", "picture", "of", "cat"]))

    image_path = os.environ.get("FLAMINGO_IMAGE")
    if image_path:
        from PIL import Image
        image = Image.open(image_path)
    else:
        image = np.random.RandomState(0).randint(0, 255, (480, 640, 3), np.uint8)

    caption = model.generate_captions(processor, images=[image], max_length=30)
    print("caption:", caption[0])


if __name__ == "__main__":
    main()

"""Few-shot interleaved prompting (reference examples/few_shot_prompt.ipynb).

Builds one sequence with k (image, caption) shots followed by a query image:
``<image>cap1<EOC><image>cap2<EOC>...<image>`` — the ``==`` media masking
routes each text span to its own image — then generates the final caption.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flamingo_mini_tpu import FlamingoConfig, FlamingoModel, FlamingoProcessor
from flamingo_mini_tpu.tokenizer import build_toy_tokenizer


def main():
    config = FlamingoConfig(lm="gpt2", dim=768, dim_visual=768,
                            compute_dtype="bfloat16")
    model = FlamingoModel(config)
    processor = FlamingoProcessor(config, tokenizer=build_toy_tokenizer(
        ["image", "a", "picture", "of", "cat", "dog", "bird"]))

    shots = [("a cat", None), ("a dog", None)]
    prompt = ""
    rs = np.random.RandomState(0)
    images = []
    for caption, _ in shots:
        prompt += f"<image>{caption}{processor.eoc_token}"
        images.append(rs.randint(0, 255, (224, 224, 3), np.uint8))
    prompt += "<image>"                      # the query image
    images.append(rs.randint(0, 255, (224, 224, 3), np.uint8))

    ids, media, mask = processor.encode_text(prompt)
    pixels = processor.preprocess_images(images)[None]   # (1, N, c, h, w)

    out = model.generate(ids, media_locations=media, attention_mask=mask,
                         pixel_values=pixels, max_length=ids.shape[1] + 20)
    text = processor.tokenizer.batch_decode(np.asarray(out),
                                            skip_special_tokens=True)[0]
    print("continuation:", processor.remove_tags(text))


if __name__ == "__main__":
    main()

"""Video captioning: 8-frame clips through the time-embedded resampler
(config ``resampler_num_time_embeds=8``; reference perceiver_resampler.py:131,
:166 — one learned time embedding added per frame before frames flatten into
the feature axis)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flamingo_mini_tpu import FlamingoConfig, FlamingoModel, FlamingoProcessor
from flamingo_mini_tpu.tokenizer import build_toy_tokenizer


def main():
    config = FlamingoConfig(lm="gpt2", dim=768, dim_visual=768,
                            resampler_num_time_embeds=8,
                            compute_dtype="bfloat16")
    model = FlamingoModel(config)
    processor = FlamingoProcessor(config, tokenizer=build_toy_tokenizer(
        ["image", "a", "video", "of", "cat"]))

    # 8 frames -> (b=1, N=1, T=8, c, h, w)
    rs = np.random.RandomState(0)
    frames = [rs.randint(0, 255, (224, 224, 3), np.uint8) for _ in range(8)]
    pixels = processor.preprocess_images(frames)[None, None]  # (1, 1, 8, 3, H, W)

    ids, media, mask = processor.encode_text("<image>")
    out = model.generate(ids, media_locations=media, attention_mask=mask,
                         pixel_values=pixels, max_length=ids.shape[1] + 20)
    text = processor.tokenizer.batch_decode(np.asarray(out),
                                            skip_special_tokens=True)[0]
    print("video caption:", processor.remove_tags(text))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Training-step benchmark: flamingo-mini fine-tuning throughput on-chip.

Reference recipe (training/train.sh:3-27): OPT-125m-scale LM + CLIP ViT-L,
bs 8/device, seq ~64. Here we measure the flagship flamingo-mini config
(GPT-2-medium + ViT-L/14) and the reference's actual training config
(OPT-125m + ViT-L/14), one optimizer step each: vision encode (frozen,
stop_gradient) + resampler/xattn forward + backward + AdamW update on the
trainable partition.

Each step is fenced by the host transfer of the loss; params/opt state are
donated and stay device-resident. Prints one JSON line per config.

Env: FLAMINGO_BENCH_TRAIN_SMOKE=1 for a tiny config sanity run.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

SMOKE = os.environ.get("FLAMINGO_BENCH_TRAIN_SMOKE") == "1"


def bench_config(name, config, *, batch, seq_len, steps=8, remat=False):
    import jax
    import jax.numpy as jnp
    from flamingo_mini_tpu.modeling_flamingo import FlamingoModel
    from flamingo_mini_tpu.train.trainer import FlamingoTrainer, TrainingArguments

    model = FlamingoModel(config, rng=jax.random.PRNGKey(0))
    args = TrainingArguments(
        output_dir="/tmp/flamingo_bench_train", learning_rate=1e-4,
        warmup_steps=10, eval_every_steps=None, save_every_steps=None,
        remat=remat)
    trainer = FlamingoTrainer(model, args)

    arch = config.vision_arch
    rs = np.random.RandomState(0)
    vocab = min(1000, config.lm_arch.vocab_size)
    batch0 = {
        "input_ids": rs.randint(0, vocab, (batch, seq_len)).astype(np.int32),
        "media_locations": np.zeros((batch, seq_len), np.int32),
        "attention_mask": np.ones((batch, seq_len), np.int32),
        "labels": rs.randint(0, vocab, (batch, seq_len)).astype(np.int32),
        "pixel_values": rs.randn(batch, 1, 3, arch.image_size,
                                 arch.image_size).astype(np.float32),
    }
    batch0["media_locations"][:, 0] = 1

    def vary(i):
        b = dict(batch0)
        # vary pixels so no transport layer can memoize repeated steps
        b["pixel_values"] = batch0["pixel_values"] * (1.0 + i * 1e-3)
        return b

    from flamingo_mini_tpu.train.data import prefetch_to_device

    t_compile0 = time.time()
    loss0 = trainer.train_step_on(vary(0))   # compile + first step
    compile_s = time.time() - t_compile0

    # measure the trainer's real loop shape: prefetch_to_device overlaps
    # batch i+1's host->device transfer with batch i's step (un-prefetched,
    # the raw transfer exceeds the step compute on this remote device)
    batches_iter = (vary(i + 1) for i in range(steps))
    ts = []
    for b in prefetch_to_device(batches_iter, cast_pixels=trainer.policy.cast,
                                mesh=trainer.mesh):
        t0 = time.perf_counter()
        trainer.train_step_on(b)   # float(loss) fences on host
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    result = {
        "config": name,
        "steps_per_sec": round(1.0 / med, 3),
        "samples_per_sec": round(batch / med, 2),
        "tokens_per_sec": round(batch * seq_len / med, 0),
        "step_ms": round(med * 1000, 1),
        "batch": batch,
        "seq_len": seq_len,
        "first_loss": round(float(loss0), 4),
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(result), flush=True)
    return result


def main():
    from flamingo_mini_tpu import FlamingoConfig

    if SMOKE:
        tiny = FlamingoConfig(
            lm="gpt2", dim=64, dim_visual=64, xattn_every=1, xattn_dim_head=16,
            xattn_heads=4, resampler_depth=2, resampler_dim_head=16,
            resampler_heads=4, resampler_num_latents=8,
            compute_dtype="bfloat16",
            lm_arch_overrides=dict(vocab_size=256, n_positions=512, n_embd=64,
                                   n_layer=4, n_head=4),
            vision_arch_overrides=dict(hidden_size=64, intermediate_size=128,
                                       num_hidden_layers=2,
                                       num_attention_heads=4,
                                       image_size=64, patch_size=16))
        results = [bench_config("smoke", tiny, batch=4, seq_len=16, steps=3)]
    else:
        mini = FlamingoConfig(   # flagship
            lm="gpt2-medium", clip_model_type="openai/clip-vit-large-patch14",
            dim=1024, dim_visual=1024, compute_dtype="bfloat16")
        ref_train = FlamingoConfig(   # the reference's actual training config
            lm="facebook/opt-125m",
            clip_model_type="openai/clip-vit-large-patch14",
            dim=768, dim_visual=1024, compute_dtype="bfloat16")
        results = [
            bench_config("flamingo-mini (GPT-2-medium + ViT-L/14) bs=8 seq=64",
                         mini, batch=8, seq_len=64),
            bench_config("reference recipe (OPT-125m + ViT-L/14) bs=8 seq=64",
                         ref_train, batch=8, seq_len=64),
        ]

    with open(os.path.join(REPO, "BENCH_TRAIN.json"), "w") as f:
        json.dump({"results": results,
                   "protocol": "median of fenced consecutive optimizer steps "
                               "(loss host-transfer per step); params/opt "
                               "donated, device-resident"}, f, indent=2)


if __name__ == "__main__":
    main()

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
    if os.environ.get("FLAMINGO_BENCH_PALLAS") == "1":
        # route full-sequence attention through the fused Pallas kernels
        # (ops/pallas_attn.py) for the on/off table (BENCH.md r4)
        import dataclasses
        config = dataclasses.replace(config, use_pallas=True)
    import jax
    from flamingo_mini_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()  # warm re-runs skip the ~minutes TPU compile
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

    if os.environ.get("FLAMINGO_BENCH_TRAIN_ABLATE") == "1":
        # step-cost decomposition: vision encode / forward / backward /
        # optimizer, each as its own fenced jitted program on device-
        # resident inputs (pixels varied per call against transport caches)
        import jax
        import jax.numpy as jnp
        from flamingo_mini_tpu.models import flamingo as F
        from flamingo_mini_tpu.utils import params as param_utils
        policy = trainer.policy

        def loss_fn(trainable, frozen, b):
            params = param_utils.merge_params(trainable, frozen)
            out = F.forward(params, config, b["input_ids"], policy=policy,
                            media_locations=b["media_locations"],
                            attention_mask=b["attention_mask"],
                            pixel_values=b["pixel_values"],
                            labels=b["labels"])
            return out.loss

        @jax.jit
        def fwd(t, f, b):
            return loss_fn(t, f, b)

        @jax.jit
        def fwdbwd(t, f, b):
            loss, grads = jax.value_and_grad(loss_fn)(t, f, b)
            keep = sum(jnp.sum(g.astype(jnp.float32))
                       for g in jax.tree_util.tree_leaves(grads))
            return loss + keep * jnp.float32(1e-30)   # grads stay live

        @jax.jit
        def vis(t, f, b):
            params = param_utils.merge_params(t, f)
            v = F.encode_resample_visuals(params, config, b["pixel_values"],
                                          policy=policy)
            return jnp.sum(v.astype(jnp.float32))

        def timed(fn, reps=7):
            dev = {k: policy.cast(jnp.asarray(v)) if k == "pixel_values"
                   else jnp.asarray(v) for k, v in batch0.items()}
            fn(trainer.trainable, trainer.frozen, dev)   # compile
            samples = []
            for i in range(reps):
                dev_i = dict(dev, pixel_values=dev["pixel_values"]
                             * (1.0 + (i + 1) * 1e-3))
                t0 = time.perf_counter()
                float(fn(trainer.trainable, trainer.frozen, dev_i))
                samples.append(time.perf_counter() - t0)
            return sorted(samples)[len(samples) // 2]

        t_vis = timed(vis)
        t_fwd = timed(fwd)
        t_fb = timed(fwdbwd)
        result["ablation_ms"] = {
            "vision_encode_resample": round(t_vis * 1000, 1),
            "forward": round(t_fwd * 1000, 1),
            "backward": round((t_fb - t_fwd) * 1000, 1),
            # the residual vs the per-call step is mostly NOT optimizer
            # math: the tunnel charges ~0.15 ms per OUTPUT buffer and the
            # step returns the whole params+opt_state pytree (measured:
            # a trivial 256-output program costs +40 ms/call vs 1-output)
            "residual_vs_per_call_step": round((med - t_fb) * 1000, 1),
        }
        print(json.dumps({"config": name,
                          "ablation_ms": result["ablation_ms"]}), flush=True)

        # sustained on-chip step: chain S optimizer steps inside ONE jitted
        # program (two-length marginal, like bench.py's decode protocol) —
        # this is what an attached-hardware training loop pays per step,
        # free of the tunnel's per-call + per-output dispatch overhead
        import optax
        from jax import lax
        optimizer = trainer.optimizer

        @jax.jit
        def multi(trainable, opt_state, frozen, b, S):
            def body(i, carry):
                t, s = carry
                bi = dict(b)
                bi["pixel_values"] = b["pixel_values"] * (
                    1.0 + i.astype(jnp.float32) * 1e-3)
                loss, grads = jax.value_and_grad(loss_fn)(t, frozen, bi)
                updates, s = optimizer.update(grads, s, t)
                return optax.apply_updates(t, updates), s

            t, s = lax.fori_loop(0, S, body, (trainable, opt_state))
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree_util.tree_leaves(t)[:4])

        dev = {k: policy.cast(jnp.asarray(v)) if k == "pixel_values"
               else jnp.asarray(v) for k, v in batch0.items()}

        def t_multi(S, reps=3):
            S = jnp.int32(S)
            float(multi(trainer.trainable, trainer.opt_state,
                        trainer.frozen, dev, S))   # compile once (traced S)
            samples = []
            for i in range(reps):
                dv = dict(dev, pixel_values=dev["pixel_values"]
                          * (1.0 + (i + 1) * 1e-3))
                t0 = time.perf_counter()
                float(multi(trainer.trainable, trainer.opt_state,
                            trainer.frozen, dv, S))
                samples.append(time.perf_counter() - t0)
            return min(samples)

        S = 16
        t_full = t_multi(S)
        t_half = t_multi(S // 2)
        onchip = (t_full - t_half) / (S - S // 2)
        result["step_ms_onchip"] = round(onchip * 1000, 1)
        result["samples_per_sec_onchip"] = round(batch / onchip, 2)
        print(json.dumps({"config": name,
                          "step_ms_onchip": result["step_ms_onchip"],
                          "samples_per_sec_onchip":
                              result["samples_per_sec_onchip"]}), flush=True)

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

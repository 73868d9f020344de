#!/usr/bin/env python
"""Extended benchmark: the five driver configs from BASELINE.json.

  1. flamingo-tiny  (GPT-2 small + ViT-B/32)  greedy captioning
  2. flamingo-mini  (GPT-2 medium + ViT-L/14) beam-search captioning, bs=32
  3. OPT-1.3B backbone, xattn_every=2, top-k sampling
  4. few-shot: 4 interleaved (image, text) shots in one sequence
  5. video: 8-frame clips through resampler_num_time_embeds=8

All on random weights (zero-egress: no hub checkpoints), bf16, real device.
Writes BENCH_EXTENDED.json and prints one line per config.

Env: FLAMINGO_BENCH_CONFIGS=1,2,... to restrict. Deployment defaults are
int8 weight-only (LM + gated xattn) and prefix_block=32 live-prefix decode;
FLAMINGO_BENCH_INT8=0 / FLAMINGO_BENCH_PREFIX_BLOCK=0 disable them.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def run_config(name, config, *, batch, prompt_len, decode_tokens, n_images=1,
               frames=1, num_beams=1, do_sample=False, top_k=0, media_count=1,
               repeats=3):
    import jax
    from flamingo_mini_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()  # warm re-runs skip the ~minutes TPU compile
    import jax.numpy as jnp
    from flamingo_mini_tpu.generation import DecodeConfig
    from flamingo_mini_tpu.models import flamingo as F
    from flamingo_mini_tpu.ops.layers import FAST, FAST_PALLAS
    if os.environ.get("FLAMINGO_BENCH_PALLAS") == "1":
        FAST = FAST_PALLAS  # noqa: F811 — Pallas prefill/vision attention

    params = F.init_flamingo(jax.random.PRNGKey(0), config)
    # deployment defaults match bench.py: int8 weight-only + live-prefix
    # segments; FLAMINGO_BENCH_INT8=0 / FLAMINGO_BENCH_PREFIX_BLOCK=0 disable
    if os.environ.get("FLAMINGO_BENCH_INT8", "1") == "1":
        from flamingo_mini_tpu.ops.quant import (quantize_gpt2_lm,
                                                 quantize_opt_lm,
                                                 quantize_xattn_blocks)
        lm = params["lm"]
        params["lm"] = quantize_gpt2_lm(lm) if "wte" in lm else quantize_opt_lm(lm)
        params["xattn"] = quantize_xattn_blocks(params["xattn"])
    from flamingo_mini_tpu.ops.quant import cast_params_bf16
    params = cast_params_bf16(params)  # bf16 storage: halve weight streaming

    arch = config.vision_arch
    rs = np.random.RandomState(0)
    input_ids = jnp.asarray(rs.randint(0, 1000, (batch, prompt_len)), jnp.int32)
    media = jnp.zeros((batch, prompt_len), jnp.int32)
    step = max(prompt_len // max(media_count, 1), 1)
    for m in range(media_count):
        media = media.at[:, m * step].set(1)
    mask = jnp.ones((batch, prompt_len), jnp.int32)
    if frames > 1:
        px_shape = (batch, n_images, frames, 3, arch.image_size, arch.image_size)
    else:
        px_shape = (batch, n_images, 3, arch.image_size, arch.image_size)
    pixels = jnp.asarray(rs.randn(*px_shape), jnp.bfloat16)

    lm = params["lm"]
    vocab = int((lm.get("wte") if "wte" in lm else
                 lm.get("embed_tokens") if "embed_tokens" in lm else
                 (lm.get("wte_q") or lm["embed_tokens_q"])["w8"]).shape[0])
    pb = int(os.environ.get("FLAMINGO_BENCH_PREFIX_BLOCK", "32"))
    int8_kv = os.environ.get("FLAMINGO_BENCH_INT8_KV") == "1"
    # whole-step megakernel: the r4 deployment fast path wherever it pays
    # (int8 GPT-2 trunks, single-beam, bf16 KV). OPT-1.3B bs=8 was measured
    # SLOWER through it (27.4 vs 36.9 captions/s: xattn_every=2 makes half
    # the layers stream 40 MB of zero xattn chunks each — +33 % bytes — and
    # B=8 rows leave the serialized chunk-dots at ~6 % MXU utilization;
    # w8a8 reads the same 27.0, so it is bytes, not the convert), so OPT
    # keeps the per-layer flat-kernel path by default;
    # FLAMINGO_BENCH_MEGA=all forces it, =0 disables everywhere.
    from flamingo_mini_tpu.configuration_flamingo import GPT2Arch
    from flamingo_mini_tpu.ops import pallas_megadecode as _mega
    mega_env = os.environ.get("FLAMINGO_BENCH_MEGA", "1")
    use_mega = (mega_env != "0"
                and not int8_kv
                and _mega.supports_arch(config.lm_arch)
                and (isinstance(config.lm_arch, GPT2Arch)
                     or mega_env == "all")
                and ("wte_q" in params["lm"]
                     or "embed_tokens_q" in params["lm"]))
    # beams (r5): _beam_impl runs the megakernel trunk with the in-kernel
    # ancestry mask when lcm(8, k) divides b*k, else silently keeps the
    # per-layer path — the knob is safe to leave on
    if num_beams > 1 and mega_env == "0":
        use_mega = False
    dc = DecodeConfig(max_length=prompt_len + decode_tokens,
                      eos_token_id=vocab + 1, pad_token_id=0,
                      num_beams=num_beams, do_sample=do_sample, top_k=top_k,
                      int8_kv_cache=int8_kv,
                      prefix_block=pb,
                      megakernel=use_mega,
                      w8a8=use_mega
                      and os.environ.get("FLAMINGO_BENCH_W8A8") == "1",
                      beam_reorder=os.environ.get(
                          "FLAMINGO_BENCH_BEAM_REORDER", "lazy"))

    # two-length fixed-cache methodology (see bench.py / BENCH.md):
    # structurally-identical programs decoding N vs N/2 tokens; per-step
    # s = (t_full - t_half)/(N - N/2); cost = max(t_full - t_null, N*s)
    from dataclasses import replace as _replace
    from flamingo_mini_tpu.generation import _generate_impl
    from flamingo_mini_tpu.beam_search import _beam_impl

    dc_full = _replace(dc, max_new_tokens=decode_tokens)
    dc_half = _replace(dc, max_new_tokens=decode_tokens // 2)

    def run(d, ps, ids, media, mask, px, seed):
        px = px + seed.astype(px.dtype) * 1e-3
        impl = _beam_impl if d.num_beams > 1 else _generate_impl
        out = impl(ps, config, d, FAST, ids, media, mask, None, px,
                   jax.random.PRNGKey(0))[0]
        return out

    decode_full = jax.jit(lambda *a: run(dc_full, *a))
    decode_half = jax.jit(lambda *a: run(dc_half, *a))

    @jax.jit
    def null_prog(ps, ids, media, mask, px, seed):
        tot = sum(jnp.sum(leaf.astype(jnp.float32))
                  for leaf in jax.tree_util.tree_leaves(ps))
        return (tot + ids.sum() + media.sum() + mask.sum()
                + px.astype(jnp.float32).sum() + seed)

    def timed(fn):
        f = lambda s: np.asarray(fn(params, input_ids, media, mask, pixels,
                                    jnp.asarray(s, jnp.float32)))
        f(0.0)
        ts = []
        for i in range(repeats):
            t0 = time.perf_counter()
            f(float(i + 1))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t0 = time.time()
    t_null = timed(null_prog)
    t_half = timed(decode_half)
    t_full = timed(decode_full)
    compile_s = time.time() - t0 - (t_null + t_half + t_full) * repeats
    n_extra = decode_tokens - decode_tokens // 2
    step = (t_full - t_half) / n_extra
    cost = max(t_full - t_null, decode_tokens * step)
    if cost <= 0:
        cost = t_full
    protocol = "two-length"

    # Sustained-chain protocol (r5, VERDICT #6): when the whole program's
    # on-chip cost is within 3x of the null-program transfer floor, the
    # two-length subtraction is noise-dominated (config 5 used to swing
    # ±25 % run to run). Chain K complete generate programs inside ONE
    # jitted fori_loop with a scalar carry feeding each iteration's pixels
    # (so XLA cannot CSE the iterations) — the same sustained protocol
    # bench_train.py uses — and take the K-vs-K/2 marginal per decode.
    if cost < 3.0 * t_null:
        from jax import lax

        def make_chained(K):
            impl = _beam_impl if dc.num_beams > 1 else _generate_impl

            @jax.jit
            def chained(ps, ids, media, mask, px, seed):
                def body(_i, acc):
                    px_i = px + (acc * 1e-9 + seed * 1e-3).astype(px.dtype)
                    out = impl(ps, config, dc_full, FAST, ids, media, mask,
                               None, px_i, jax.random.PRNGKey(0))[0]
                    return acc + out.sum().astype(jnp.float32)
                return lax.fori_loop(0, K, body, seed)
            return chained

        K, K2 = 8, 4
        t_k2 = timed(make_chained(K2))
        t_k = timed(make_chained(K))
        cost_chained = (t_k - t_k2) / (K - K2)
        if cost_chained > 0:
            cost = cost_chained
            protocol = f"chained-fori K={K}/{K2}"

    result = {
        "config": name,
        "captions_per_sec": round(batch / cost, 3),
        "batch": batch,
        "decode_tokens": decode_tokens,
        "num_beams": num_beams,
        "cost_s": round(cost, 4),
        "t_null_s": round(t_null, 4),
        "step_ms": round(step * 1000, 3),
        "compile_s": round(compile_s, 1),
        "protocol": protocol,
    }
    print(json.dumps(result), flush=True)
    return result


def main():
    from flamingo_mini_tpu import FlamingoConfig

    tiny = FlamingoConfig(       # flamingo-tiny: GPT-2 small + ViT-B/32
        lm="gpt2", clip_model_type="openai/clip-vit-base-patch32",
        dim=768, dim_visual=768, compute_dtype="bfloat16")
    mini = FlamingoConfig(       # flamingo-mini: GPT-2 medium + ViT-L/14
        lm="gpt2-medium", clip_model_type="openai/clip-vit-large-patch14",
        dim=1024, dim_visual=1024, compute_dtype="bfloat16")
    opt13 = FlamingoConfig(      # OPT-1.3B, xattn_every=2
        lm="facebook/opt-1.3b", clip_model_type="openai/clip-vit-large-patch14",
        dim=2048, dim_visual=1024, xattn_every=2, compute_dtype="bfloat16")
    video = FlamingoConfig(      # 8-frame video resampler
        lm="gpt2", clip_model_type="openai/clip-vit-base-patch32",
        dim=768, dim_visual=768, resampler_num_time_embeds=8,
        compute_dtype="bfloat16")

    configs = {
        "1": ("flamingo-tiny greedy bs=32", tiny,
              dict(batch=32, prompt_len=4, decode_tokens=64)),
        "2": (f"flamingo-mini beam{os.environ.get('FLAMINGO_BENCH_BEAMS', '3')} bs=32",
              mini,
              dict(batch=32, prompt_len=4, decode_tokens=64,
                   # FLAMINGO_BENCH_BEAMS: width A/Bs (e.g. beam-4, whose
                   # families align with the kernel group without a 24-row
                   # group) — r5 serving-recommendation ladder
                   num_beams=int(os.environ.get("FLAMINGO_BENCH_BEAMS",
                                                "3")))),
        "3": ("OPT-1.3B xattn_every=2 top-k bs=8", opt13,
              dict(batch=8, prompt_len=8, decode_tokens=64, do_sample=True,
                   top_k=50, repeats=2)),
        "4": ("few-shot 4 images interleaved bs=8", mini,
              dict(batch=8, prompt_len=64, decode_tokens=32, n_images=4,
                   media_count=4)),
        "5": ("video 8-frame bs=8", video,
              dict(batch=8, prompt_len=4, decode_tokens=32, frames=8)),
    }
    selected = os.environ.get("FLAMINGO_BENCH_CONFIGS", "1,2,3,4,5").split(",")
    results = []
    for key in selected:
        name, config, kw = configs[key.strip()]
        try:
            results.append(run_config(name, config, **kw))
        except Exception as e:  # keep going; record the failure
            results.append({"config": name, "error": f"{type(e).__name__}: {e}"})
            print(json.dumps(results[-1]), flush=True)

    out_path = os.environ.get("FLAMINGO_BENCH_OUT",
                              os.path.join(REPO, "BENCH_EXTENDED.json"))
    with open(out_path, "w") as f:
        json.dump({"results": results,
                   "pallas": os.environ.get("FLAMINGO_BENCH_PALLAS") == "1",
                   "int8": os.environ.get("FLAMINGO_BENCH_INT8", "1") == "1",
                   "prefix_block": int(os.environ.get(
                       "FLAMINGO_BENCH_PREFIX_BLOCK", "32")),
                   "methodology": "two-length fixed-cache on-chip time "
                                  "(max(t_full - t_null, N*step); see BENCH.md)"},
                  f, indent=2)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""In-situ probe: per-step cost of the int8 tied lm_head + greedy argmax.

Mimics the real decode loop's data flow: a fori_loop whose body computes the
next token from the hidden row and feeds it back (so nothing folds away).
Trip count is a traced bound; per-step = (t_hi - t_lo) / (hi - lo). Fresh
random hidden per process (tunnel caching, BENCH.md measurement notes).

Variants: the XLA convert-fused int8 matmul + argmax (what generation.py's
megakernel branch runs today) vs ops/pallas_lmhead.lm_head_argmax at several
vocab-chunk sizes.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from flamingo_mini_tpu.ops.pallas_lmhead import (lm_head_argmax,
                                                 pad_head_weights)

B, D, V = 32, 1024, 50258   # flamingo-mini headline shape (+<EOC> row)
NEG = float(jnp.finfo(jnp.float32).min)


def xla_head(w8, scale, x):
    logits = jnp.matmul(x, jnp.swapaxes(w8.astype(x.dtype), 0, 1),
                        preferred_element_type=jnp.float32)
    logits = (logits * scale.reshape(1, -1)[:, :V]).astype(x.dtype)
    return jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(jnp.int32)


def make_loop(head, padded):
    @jax.jit
    def run(w8, scale, x0, reps, seed):
        x0 = x0 + seed.astype(x0.dtype) * 1e-6

        def body(i, x):
            if padded:
                tok = head(w8, scale, x)
            else:
                tok = head(w8[:V], scale, x)
            return x + (tok[:, None] & 1).astype(x.dtype) * 1e-6

        x = lax.fori_loop(0, reps, body, x0)
        return jnp.sum(x.astype(jnp.float32))
    return run


def timed(run, ops, reps):
    def once():
        seed = jnp.float32(time.time_ns() % (1 << 30))
        return np.asarray(run(*ops, jnp.int32(reps), seed))
    once()
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        once()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rs = np.random.RandomState(time.time_ns() % (1 << 31))
    x0 = jnp.asarray(rs.randn(B, D) * 0.1, jnp.bfloat16)
    w8 = jnp.asarray(rs.randint(-127, 128, (V, D)), jnp.int8)
    scale = jnp.asarray(np.abs(rs.randn(V)) * 0.01 + 1e-4, jnp.float32)
    results = {}

    def measure(name, run, ops, bytes_per_step):
        t_lo = timed(run, ops, 64)
        t_hi = timed(run, ops, 576)
        us = (t_hi - t_lo) / 512 * 1e6
        gbs = bytes_per_step / (us * 1e-6) / 1e9
        results[name] = round(us, 1)
        print(f"{name:24s} {us:7.1f} us/step  {gbs:5.0f} GB/s", flush=True)

    measure("xla_int8", make_loop(xla_head, padded=False),
            (w8, scale, x0), V * D)
    for bv in (1024, 2048, 4096):
        padded = pad_head_weights({"w8": w8, "scale": scale}, bv)

        def head(w8p, sp, x, bv=bv):
            return lm_head_argmax(w8p, sp, x, n_valid=V, block_v=bv)
        measure(f"pallas_bv{bv}", make_loop(head, padded=True),
                (padded["w8"], padded["scale"], x0),
                padded["w8"].shape[0] * D)

    print(json.dumps({"us_per_step": results, "shape": f"B{B} D{D} V{V}"}))


if __name__ == "__main__":
    main()

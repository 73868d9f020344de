#!/usr/bin/env python
"""Raw HBM streaming-bandwidth probe (Pallas vs XLA) on the attached chip.

Establishes the honest roofline for the decode-attention rework: how fast can
a Pallas kernel stream bytes from HBM at all, at several block sizes, vs an
XLA reduce over the same buffer. Protocol: R repeats chained inside ONE jitted
fori_loop (trip count traced, so two lengths share a compile); marginal
(T(R2)-T(R1))/(R2-R1) per repeat; every repeat depends on the carry so XLA
cannot hoist or CSE the body (tpu-bench-protocol rules, BENCH.md).
"""
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_stream(x, acc, chunk_rows):
    """Sum-reduce x (N, 1024) reading every byte once; acc defeats CSE."""
    N, D = x.shape
    grid = (N // chunk_rows,)

    def kernel(s_ref, x_ref, o_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        part = jnp.sum(x_ref[:].astype(jnp.float32), axis=0, keepdims=True)
        o_ref[:] = o_ref[:] + part[:, :128] + s_ref[0, 0] * 1e-30

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk_rows, D), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
    )(acc.reshape(1, 1), x)
    return out.sum()


def xla_stream(x, acc, _chunk_rows):
    return jnp.sum((x.astype(jnp.float32) + acc * 1e-30))


@functools.partial(jax.jit, static_argnames=("fn", "chunk_rows"))
def probe(x, reps, seed, fn, chunk_rows):
    # seed varies per timed call: the tunnel caches same-(program, buffers)
    # repeats server-side, so identical calls read ~0 s (BENCH.md)
    def body(_i, acc):
        return acc + fn(x, acc, chunk_rows)
    return lax.fori_loop(0, reps, body, seed)


def timed(x, reps, fn, chunk_rows):
    def once():
        # seed must be unique across ALL runs ever: the tunnel's server-side
        # cache persists across processes and keys on (program, input values)
        seed = float(time.time_ns() % (1 << 30))
        return probe(x, jnp.int32(reps), jnp.float32(seed), fn=fn,
                     chunk_rows=chunk_rows).block_until_ready()
    once(); once()  # compile + settle
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        once()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    N = n_mb * 1024 * 1024 // 2048   # bf16 rows of 1024
    # fresh buffer VALUES every process: the tunnel's server-side cache
    # persists across processes and can serve repeat calls over previously
    # seen buffers at ~0 s (measured; see BENCH.md measurement integrity)
    x = jnp.asarray(np.random.RandomState(time.time_ns() % (1 << 31))
                    .randn(N, 1024), jnp.bfloat16)
    x = jax.device_put(x)
    bytes_per_rep = N * 1024 * 2
    results = {}
    for name, fn, chunks in [
        ("pallas", pallas_stream, (512, 1024, 2048)),
        ("xla", xla_stream, (0,)),
    ]:
        for c in chunks:
            label = f"{name}_c{c}" if c else name
            t4 = timed(x, 4, fn, c)
            t8 = timed(x, 36, fn, c)
            per = (t8 - t4) / 32
            gbs = bytes_per_rep / per / 1e9
            results[label] = round(gbs, 1)
            print(label, f"per-rep {per*1e3:.1f} ms  {gbs:.0f} GB/s", flush=True)
    print(json.dumps({"stream_GBps": results, "buffer_MB": n_mb}))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Megakernel weight-stream pipeline probe (round 5, VERDICT #1).

The r4 megakernel streams int8 weight chunks through a depth-2 VMEM
ping-pong: ``next_chunk`` starts chunk c+1 then waits on chunk c, so at
most ONE DMA is ever in flight during compute. If per-DMA issue/grant
latency is ~1 us on top of the ~1.4 us transfer of a 1 MB chunk, the
effective stream rate is ~60 % of the chip's measured 700 GB/s — which is
exactly the "issue/sync-bound at M=32" signature the r4 w8a8 probe found
(int8-dot vs convert+bf16-dot vs convert-only all within 10 %).

This probe emulates the megakernel's weight stream in isolation and
varies the two pipelining levers:

  * ring depth R (slots in the VMEM ring; R-1 DMAs outstanding)
  * per-chunk compute on/off (convert + (32, D) x (D, D) dot, the real
    per-chunk work at the headline shape)

Protocol: tpu-bench-protocol (BENCH.md) — reps chained in ONE jitted
fori_loop with a carry dependency, two-length marginal, fresh buffer
values per process, fenced.
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

D = 1024
NC_INNER = 24          # chunks per grid step; divisible by every R probed
N_OUTER = 10           # grid steps -> 240 chunks = 240 MB per rep


def make_stream_fn(R, compute):
    def kernel(x_ref, w_ref, o_ref, wbuf, acc, wsem):
        outer = pl.program_id(0)
        base = outer * NC_INNER

        @pl.when(outer == 0)
        def _():
            # seed the accumulator from x so the output depends on the
            # fori carry even in stream-only mode (else XLA hoists the call)
            acc[...] = x_ref[...].astype(jnp.float32) * 1e-30

        def wdma(slot, c):
            return pltpu.make_async_copy(
                w_ref.at[pl.ds(base + c, 1)], wbuf.at[pl.ds(slot, 1)],
                wsem.at[slot])

        for j in range(R - 1):
            wdma(j, j).start()
        x = x_ref[...]
        a = acc[...]
        for c in range(NC_INNER):
            slot = c % R
            if c + R - 1 < NC_INNER:
                wdma((c + R - 1) % R, c + R - 1).start()
            wdma(slot, c).wait()
            if compute:
                w8 = wbuf[slot]
                a = a + lax.dot_general(
                    x, w8.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                # touch one lane so the DMA isn't dead
                a = a + wbuf[slot, :32, :].astype(jnp.float32) * 1e-30
        acc[...] = a

        @pl.when(outer == pl.num_programs(0) - 1)
        def _():
            o_ref[...] = acc[...]

    def fn(x, w8):
        return pl.pallas_call(
            kernel,
            grid=(N_OUTER,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((32, D), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((R, D, D), jnp.int8),
                pltpu.VMEM((32, D), jnp.float32),
                pltpu.SemaphoreType.DMA((R,)),
            ],
        )(x, w8)
    return fn


@functools.partial(jax.jit, static_argnames=("R", "compute"))
def probe(w8, x0, reps, seed, R, compute):
    # scalar f32 carry, exactly probe_stream.py's loop shape (an array
    # carry misbehaved on this platform's executor — r5 log)
    fn = make_stream_fn(R, compute)

    def body(_i, acc):
        x = (x0 * (1.0 + acc * 1e-9)).astype(jnp.bfloat16)
        return acc + jnp.sum(fn(x, w8)) * 1e-9

    return lax.fori_loop(0, reps, body, seed)


def timed(w8, x0, reps, R, compute):
    def once():
        # seed unique across all runs ever: the tunnel's server-side cache
        # keys on (program, input values) and persists across processes
        seed = float(time.time_ns() % (1 << 30))
        return probe(w8, x0, jnp.int32(reps), jnp.float32(seed), R=R,
                     compute=compute).block_until_ready()
    once(); once()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        once()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    rng = np.random.RandomState(time.time_ns() % (1 << 31))
    w8 = jax.device_put(jnp.asarray(
        rng.randint(-127, 127, (N_OUTER * NC_INNER, D, D)), jnp.int8))
    x0 = jax.device_put(jnp.asarray(rng.randn(32, D), jnp.bfloat16))
    bytes_per_rep = N_OUTER * NC_INNER * D * D
    results = {}
    for compute in (True, False):
        for R in (2, 3, 4, 6, 8):
            t_lo = timed(w8, x0, 4, R, compute)
            t_hi = timed(w8, x0, 36, R, compute)
            per = (t_hi - t_lo) / 32
            gbs = bytes_per_rep / per / 1e9
            us_chunk = per / (N_OUTER * NC_INNER) * 1e6
            label = f"R{R}_{'dot' if compute else 'stream'}"
            results[label] = {"GBps": round(gbs, 1),
                              "us_per_chunk": round(us_chunk, 3)}
            print(label, f"{gbs:.0f} GB/s  {us_chunk:.2f} us/chunk",
                  flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

"""Probe HBM streaming rates: XLA reduce vs Pallas auto-pipeline vs manual
multi-buffer DMA pipeline, on the msda g tensor (310 MB bf16).

Answers whether the pallas copy floor (~1.58 ms = ~196 GB/s) is a DMA-depth
artifact (fixable with more outstanding copies) or the platform ceiling.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/stream_probe.py
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tair_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

R, C = 9472 * 128, 128  # 310 MB bf16
REPS = 10

g = jax.random.normal(jax.random.PRNGKey(0), (R, C), jnp.bfloat16)


def bench(label, fn, bytes_moved):
    @jax.jit
    def run(g):
        def body(i, acc):
            return acc + fn(g + acc.astype(g.dtype) * 0)

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

    float(run(g))
    t0 = time.perf_counter()
    float(run(g))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{label:44s} {dt*1e3:7.3f} ms  {bytes_moved/dt/1e9:7.1f} GB/s")


# --- XLA baseline: full-array reduce (reads everything once) ---
bench("xla sum(g)", lambda g: jnp.sum(g.astype(jnp.float32)), R * C * 2)
bench(
    "xla sum(g, axis=0) (lane reduce)",
    lambda g: jnp.sum(jnp.sum(g.astype(jnp.float32), axis=0)),
    R * C * 2,
)


# --- pallas auto-pipeline copy at several block sizes ---
def _autocopy_kernel(g_ref, o_ref):
    s = jnp.sum(g_ref[:].astype(jnp.float32), axis=0, keepdims=True)
    o_ref[:] = jnp.broadcast_to(s, (8, C))


def autocopy(rows_per_block):
    def fn(g):
        out = pl.pallas_call(
            _autocopy_kernel,
            grid=(R // rows_per_block,),
            in_specs=[
                pl.BlockSpec(
                    (rows_per_block, C), lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (8, C), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct(
                (R // rows_per_block * 8, C), jnp.float32
            ),
        )(g)
        return jnp.sum(out[:4])

    return fn


for rpb in (8192, 16384, 32768):
    bench(f"pallas auto-pipeline rows/blk={rpb}", autocopy(rpb), R * C * 2)


# --- pallas manual multi-buffer DMA pipeline ---
def _manual_kernel(g_hbm, o_ref, *, chunk_rows, n_buffers):
    num_chunks = R // chunk_rows

    def body(scratch, sems):
        def get_dma(slot, i):
            return pltpu.make_async_copy(
                g_hbm.at[pl.ds(i * chunk_rows, chunk_rows), :],
                scratch.at[slot],
                sems.at[slot],
            )

        for s in range(n_buffers):
            get_dma(s, s).start()

        def loop(i, acc):
            slot = i % n_buffers
            get_dma(slot, i).wait()
            chunk = scratch[slot]
            part = jnp.sum(chunk[:1, :8].astype(jnp.float32))

            @pl.when(i + n_buffers < num_chunks)
            def _():
                get_dma(slot, i + n_buffers).start()

            return acc + part

        acc = jax.lax.fori_loop(0, num_chunks, loop, jnp.float32(0))
        o_ref[0, 0] = acc

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((n_buffers, chunk_rows, C), jnp.bfloat16),
        sems=pltpu.SemaphoreType.DMA((n_buffers,)),
    )


def manual(chunk_rows, n_buffers):
    kernel = functools.partial(
        _manual_kernel, chunk_rows=chunk_rows, n_buffers=n_buffers
    )

    def fn(g):
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        )(g)
        return out[0, 0]

    return fn


for chunk_rows, n_buf in ((8192, 2), (8192, 4), (4096, 8), (16384, 4)):
    bench(
        f"pallas manual DMA chunk={chunk_rows} bufs={n_buf}",
        manual(chunk_rows, n_buf),
        R * C * 2,
    )

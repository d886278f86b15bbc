"""Probe tpu.dynamic_gather (jnp.take_along_axis in Pallas) on the chip.

Checks: (1) does axis=1 take_along_axis lower at all, (2) which dtypes,
(3) correctness vs numpy, (4) rate in elements/s at msda-like shapes
(x [32, 9472] value slab, 64 gather calls per layer-head equivalent).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/dyngather_probe.py
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

MEM = {"memory_space": pltpu.VMEM}


def _gather_kernel(x_ref, idx_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)


def gather_once(x, idx):
    return pl.pallas_call(
        _gather_kernel,
        in_specs=[pl.BlockSpec(**MEM), pl.BlockSpec(**MEM)],
        out_specs=pl.BlockSpec(**MEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, idx)


def check(dtype):
    d, s = 32, 1024
    x = jax.random.normal(jax.random.PRNGKey(0), (d, s)).astype(dtype)
    idx = jax.random.randint(jax.random.PRNGKey(1), (d, s), 0, s, jnp.int32)
    try:
        out = np.asarray(gather_once(x, idx))
    except Exception as e:
        print(f"dtype {dtype.__name__}: FAILED - {str(e)[:200]}")
        return False
    ref = np.take_along_axis(
        np.asarray(x, np.float32), np.asarray(idx), axis=1
    )
    err = np.abs(out.astype(np.float32) - ref).max()
    print(f"dtype {dtype.__name__}: ok, max err {err}")
    return True


# ---- rate at msda shapes: grid over (head, tile), x [D, S] resident ----
D, S, H = 32, 9472, 8
CALLS = 64  # gathers per head to cover Q*16samples*4corners / S


def _rate_kernel(x_ref, idx_ref, o_ref):
    x = x_ref[:]
    o_ref[:] = jnp.take_along_axis(x, idx_ref[:], axis=1).astype(jnp.float32)


def rate_fn(x, idx):
    # grid: (H, CALLS); x block per head stays resident across the call dim
    return pl.pallas_call(
        _rate_kernel,
        grid=(H, CALLS),
        in_specs=[
            pl.BlockSpec((None, D, S), lambda h, c: (h, 0, 0), **MEM),
            pl.BlockSpec((None, None, D, S), lambda h, c: (h, c, 0, 0), **MEM),
        ],
        out_specs=pl.BlockSpec(
            (None, None, D, S), lambda h, c: (h, c, 0, 0), **MEM
        ),
        out_shape=jax.ShapeDtypeStruct((H, CALLS, D, S), jnp.float32),
    )(x, idx)


def bench_rate(dtype):
    x = jax.random.normal(jax.random.PRNGKey(0), (H, D, S)).astype(dtype)
    idx = jax.random.randint(
        jax.random.PRNGKey(1), (H, CALLS, D, S), 0, S, jnp.int32
    )

    @jax.jit
    def run(x, idx):
        return jnp.sum(rate_fn(x, idx)[:, :, :1, :1])

    float(run(x, idx))
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        float(run(x, idx))
    dt = (time.perf_counter() - t0) / reps
    elems = H * CALLS * D * S
    print(
        f"rate {dtype.__name__}: {dt*1e3:.3f} ms for {elems/1e6:.1f}M elems"
        f" -> {elems/dt/1e9:.1f} G elem/s"
    )


for dt in (jnp.float32, jnp.bfloat16, jnp.int32):
    check(dt)
bench_rate(jnp.float32)
try:
    bench_rate(jnp.bfloat16)
except Exception as e:
    print("bf16 rate failed:", str(e)[:200])

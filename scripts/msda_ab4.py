"""Decoder-shape msda A/B with the MXU reduce; pick the decoder core."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tair_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from tair_tpu.spotter.ms_deform_attn import (
    ms_deform_attn_core_flat,
    ms_deform_attn_core_flatpatch,
)

shapes = ((16, 16), (32, 32), (64, 64), (64, 64))
S = sum(h * w for h, w in shapes)
B, H, D, P, L = 1, 8, 32, 4, 4
REPS = 20

value = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D), jnp.bfloat16)


def bench(name, core, q, n=5):
    locs = jax.random.uniform(jax.random.PRNGKey(1), (B, q, H, L, P, 2))
    wts = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(2), (B, q, H, L, P)).reshape(B, q, H, -1)
    ).reshape(B, q, H, L, P)

    def repeated(v, l, w):
        def body(i, acc):
            out = core(v, shapes, l, w * (1.0 + 1e-6 * i))
            return acc + jnp.mean(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, REPS, body, 0.0)

    jf = jax.jit(repeated)
    float(jf(value, locs, wts))
    t0 = time.perf_counter()
    for _ in range(n):
        float(jf(value, locs, wts))
    dt = (time.perf_counter() - t0) / n / REPS * 1000
    print(f"{name} q={q}: {dt:.2f} ms/call", flush=True)


for q in (1600, 2500):
    bench("flat", lambda v, s, l, w: ms_deform_attn_core_flat(v, s, l, w), q)
    bench("flatpatch-mxu",
          lambda v, s, l, w: ms_deform_attn_core_flatpatch(v, s, l, w,
                                                           q_chunk=16384), q)

"""A/B the msda cores with in-graph repetition (amortizes the remote-relay
dispatch overhead that dominates single-call timings)."""

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
            # iteration-dependent weights defeat CSE across repetitions
            out = core(v, shapes, l, w * (1.0 + 1e-6 * i))
            return acc + jnp.mean(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, REPS, body, 0.0)

    jf = jax.jit(repeated)
    float(jf(value, locs, wts))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n):
        float(jf(value, locs, wts))
    dt = (time.perf_counter() - t0) / n / REPS * 1000
    print(f"{name} q={q}: {dt:.2f} ms/call", flush=True)


def baseline_noop(n=20):
    jf = jax.jit(lambda v: jnp.mean(v.astype(jnp.float32)))
    float(jf(value))
    t0 = time.perf_counter()
    for _ in range(n):
        float(jf(value))
    print(f"dispatch+mean overhead: {(time.perf_counter() - t0) / n * 1000:.2f} ms",
          flush=True)


baseline_noop()
for q in (9472, 1600):
    bench("flat", ms_deform_attn_core_flat, q)
    bench("flatpatch", ms_deform_attn_core_flatpatch, q)
    bench("flatpatch q_chunk=9472",
          lambda v, s, l, w: ms_deform_attn_core_flatpatch(v, s, l, w, q_chunk=9472),
          q)

"""Isolate the packed-table (patchify) build cost on the chip.

pack_ab.py measures the whole msda module, where the ~0.2 ms pack is below
run-to-run noise (+-0.1 ms). This times ONLY the pack — value varies per
rep so it cannot hoist — plus a same-bytes reshape/copy floor, resolving
whether patchify_value_roll actually beats the concat pack (the round-2
trace attributes 10.3 ms/img per module, 187 ms/img total, to the concat
pack fusions).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/pack_only_ab.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tair_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from tair_tpu.spotter.ms_deform_attn import (
    patchify_value,
    patchify_value_roll,
)

REPS = 100
SHAPES = ((16, 16), (32, 32), (64, 64), (64, 64))
S = sum(h * w for h, w in SHAPES)
B, H, D = 1, 8, 32


def bench(label, fn):
    value = jax.random.normal(
        jax.random.PRNGKey(0), (B, S, H, D), jnp.bfloat16
    )

    @jax.jit
    def run(value):
        def body(i, acc):
            vp = fn(value + acc * 0)
            return acc + jnp.mean(vp.astype(jnp.float32))

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

    float(run(value))
    t0 = time.perf_counter()
    float(run(value))
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{label:40s} {ms:7.3f} ms/pack", flush=True)


bench("concat (patchify_value)", lambda v: patchify_value(v, SHAPES))
bench("roll   (patchify_value_roll)", lambda v: patchify_value_roll(v, SHAPES))
# floor: same output bytes, no corner shifts — one transpose+reshape+scale
bench(
    "floor  (transpose+broadcast to 4D)",
    lambda v: jnp.concatenate([v.transpose(0, 2, 1, 3)] * 4, -1).reshape(
        B * H * S, 4 * D
    ),
)

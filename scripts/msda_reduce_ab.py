"""Micro-A/B the Pallas corner-reduce kernel variants at encoder geometry.

Isolates the reduce stage (no gather): g [NQ*128, 128] bf16 + four [NQ,128]
f32 corner-weight tensors -> [NQ*8, 32] f32. Compares kernel variants
against the pure-XLA mxu formulation of the same math. "noweights" is a
timing diagnostic only (weights = 1.0).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/msda_reduce_ab.py [qt ...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tair_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from tair_tpu.ops.msda_reduce import msda_corner_reduce

NQ, LANES, D, K = 9472, 128, 32, 16
REPS = 20

key = jax.random.PRNGKey(0)
g = jax.random.normal(key, (NQ * LANES, 4 * D), jnp.bfloat16)
ws = [
    jax.random.uniform(jax.random.PRNGKey(i + 1), (NQ, LANES), jnp.float32)
    for i in range(4)
]


def mxu_ref(g, w0, w1, w2, w3):
    import numpy as np

    h = LANES // K
    g5 = g.reshape(1, NQ, h, K, 4 * D)
    w4 = jnp.stack(
        [w.reshape(1, NQ, h, K) for w in (w0, w1, w2, w3)], axis=-1
    )
    spread = jnp.repeat(jnp.eye(4, dtype=g.dtype), D, axis=1)
    seg = jnp.tile(jnp.eye(D, dtype=jnp.float32), (4, 1))
    w_lanes = jax.lax.dot_general(
        w4.astype(g.dtype), spread, (((4,), (0,)), ((), ())),
        preferred_element_type=g.dtype,
    )
    out = jnp.einsum(
        "bqhkC,Cd->bqhd", g5 * w_lanes, seg,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(NQ * h, D)


def bench(label, fn):
    @jax.jit
    def run(g, w0, w1, w2, w3):
        def body(i, acc):
            o = fn(g, w0 + acc * 0, w1, w2, w3)
            return acc + jnp.mean(o[:8]) * 1e-9

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

    float(run(g, *ws))
    t0 = time.perf_counter()
    float(run(g, *ws))
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{label:40s} {ms:7.3f} ms/call")


bench("xla mxu reduce", mxu_ref)
qts = [int(a) for a in sys.argv[1:]] or [32]
for qt in qts:
    for variant in ("bcast", "mxt", "noweights"):
        bench(
            f"pallas {variant} qt={qt}",
            lambda g, w0, w1, w2, w3, qt=qt, v=variant: msda_corner_reduce(
                g, w0, w1, w2, w3, K, qt, False, v
            ),
        )

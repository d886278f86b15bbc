"""A/B the flatlanes corner-reduce modes inside the msda module on the chip.

fused (one XLA reduce fusion, no g*w materialization) vs mxu (spread/segment
matmuls, the round-2 default until now) at encoder and decoder shapes.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/reduce_ab.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from flax import linen as nn

from tair_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from tair_tpu.spotter.ms_deform_attn import MSDeformAttn

REPS = 20
SHAPES = ((16, 16), (32, 32), (64, 64), (64, 64))
S = sum(h * w for h, w in SHAPES)


def bench(label, q, ref_dim, reduce_mode):
    class Wrap(nn.Module):
        @nn.compact
        def __call__(self, src, query, ref):
            return MSDeformAttn(
                256, 4, 8, 4, dtype=jnp.bfloat16, core="flatlanes",
                reduce_mode=reduce_mode, q_chunk=16384,
            )(query, ref, src, SHAPES)

    m = Wrap()
    src = jax.random.normal(jax.random.PRNGKey(0), (1, S, 256), jnp.bfloat16)
    query = jax.random.normal(jax.random.PRNGKey(1), (1, q, 256), jnp.bfloat16)
    ref = jax.random.uniform(jax.random.PRNGKey(2), (1, q, 4, ref_dim))
    params = m.init(jax.random.PRNGKey(3), src, query, ref)
    # non-zero offsets so sampling locations vary (defeats index hoisting)
    params = jax.tree.map(
        lambda x: x + 0.02 * jax.random.normal(jax.random.PRNGKey(4), x.shape, x.dtype),
        params,
    )

    @jax.jit
    def run(p, src, query, ref):
        def body(i, acc):
            o = m.apply(p, src, query + acc * 0, ref)
            return acc + jnp.mean(o.astype(jnp.float32))

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

    float(run(params, src, query, ref))
    t0 = time.perf_counter()
    float(run(params, src, query, ref))
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{label:44s} {ms:7.2f} ms/call")


import sys as _sys

modes = _sys.argv[1:] or ["mxu", "fused", "pallas"]
for mode in modes:
    bench(f"encoder self-attn Q=S={S}  reduce={mode}", S, 2, mode)
for mode in modes:
    bench(f"decoder cross-attn Q=1600 reduce={mode}", 1600, 4, mode)

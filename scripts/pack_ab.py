"""A/B the packed-table construction (patchify) inside the msda module.

Round-2 trace finding: the patchify_value pack fusions cost 187 ms/img
across the 18 msda modules (10.3 ms/img each; ~4x lane-padded reads of the
D=32-minor value view), and jnp.take's default fill-mode select costs
another ~95 ms/img across the decoder cross-attns. This measures, on the
chip, the roll-based lane-aligned pack (patchify="roll") vs the pad/concat
pack (patchify="concat") at encoder and decoder shapes — with the value
VARYING per rep so the pack cannot be hoisted out of the timing loop
(the documented microbenchmark trap, docs/PERFORMANCE.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/pack_ab.py [variants...]
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


def bench(label, q, ref_dim, patchify):
    class Wrap(nn.Module):
        @nn.compact
        def __call__(self, src, query, ref):
            return MSDeformAttn(
                256, 4, 8, 4, dtype=jnp.bfloat16, core="flatlanes",
                reduce_mode="mxu", q_chunk=16384, patchify=patchify,
            )(query, ref, src, SHAPES)

    m = Wrap()
    src = jax.random.normal(jax.random.PRNGKey(0), (1, S, 256), jnp.bfloat16)
    query = jax.random.normal(jax.random.PRNGKey(1), (1, q, 256), jnp.bfloat16)
    ref = jax.random.uniform(jax.random.PRNGKey(2), (1, q, 4, ref_dim))
    params = m.init(jax.random.PRNGKey(3), src, query, ref)
    params = jax.tree.map(
        lambda x: x + 0.02 * jax.random.normal(jax.random.PRNGKey(4), x.shape, x.dtype),
        params,
    )

    @jax.jit
    def run(p, src, query, ref):
        def body(i, acc):
            # vary BOTH query (index math) and src (value/pack) per rep so
            # neither the sampling indices nor the packed table get hoisted
            o = m.apply(p, src + acc * 0, query + acc * 0, ref)
            return acc + jnp.mean(o.astype(jnp.float32))

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

    float(run(params, src, query, ref))
    t0 = time.perf_counter()
    float(run(params, src, query, ref))
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{label:52s} {ms:7.2f} ms/call", flush=True)


variants = sys.argv[1:] or ["concat", "roll"]
for v in variants:
    bench(f"encoder self-attn Q=S={S}  patchify={v}", S, 2, v)
for v in variants:
    bench(f"decoder cross-attn Q=2500 patchify={v}", 2500, 4, v)
for v in variants:
    bench(f"decoder cross-attn Q=1600 patchify={v}", 1600, 4, v)

"""Reduce-mode A/B + full-TESTR timing with the flatpatch encoder core."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tair_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from tair_tpu.spotter.ms_deform_attn import ms_deform_attn_core_flatpatch
from tair_tpu.spotter.testr import TESTR, TESTRConfig

shapes = ((16, 16), (32, 32), (64, 64), (64, 64))
S = sum(h * w for h, w in shapes)
B, H, D, P, L = 1, 8, 32, 4, 4
REPS = 20

value = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D), jnp.bfloat16)
locs = jax.random.uniform(jax.random.PRNGKey(1), (B, S, H, L, P, 2))
wts = jax.nn.softmax(
    jax.random.normal(jax.random.PRNGKey(2), (B, S, H, L, P)).reshape(B, S, H, -1)
).reshape(B, S, H, L, P)


def bench(name, core, n=5):
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
    print(f"{name}: {dt:.2f} ms/call", flush=True)


bench("flatpatch einsum unchunked",
      lambda v, s, l, w: ms_deform_attn_core_flatpatch(v, s, l, w, q_chunk=16384,
                                                       reduce="einsum"))
bench("flatpatch mxu unchunked",
      lambda v, s, l, w: ms_deform_attn_core_flatpatch(v, s, l, w, q_chunk=16384,
                                                       reduce="mxu"))

# full TESTR with the new encoder default
feats = tuple(
    jnp.zeros((B, s, s, c), jnp.bfloat16)
    for s, c in [(16, 1280), (32, 1280), (64, 640), (64, 320)]
)
m = TESTR(TESTRConfig(), dtype=jnp.bfloat16)
p = m.init(jax.random.PRNGKey(0), feats)


def timeit(name, f, *args, n=5):
    jf = jax.jit(f)
    float(jnp.mean(jnp.asarray(jax.tree.leaves(jf(*args))[0], jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        float(jnp.mean(jnp.asarray(jax.tree.leaves(jf(*args))[0], jnp.float32)))
    print(f"{name}: {(time.perf_counter() - t0) / n * 1000:.1f} ms", flush=True)


timeit("testr full (flatpatch enc)", lambda p, f: m.apply(p, f)["pred_logits"],
       p, feats)

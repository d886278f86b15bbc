"""A/B the ms-deform-attn formulations at encoder shapes on the chip."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tair_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from tair_tpu.spotter.ms_deform_attn import (
    ms_deform_attn_core,
    ms_deform_attn_core_flat,
    ms_deform_attn_core_flatpatch,
    ms_deform_attn_core_patch,
)

shapes = ((16, 16), (32, 32), (64, 64), (64, 64))
S = sum(h * w for h, w in shapes)
B, H, D, P, L = 1, 8, 32, 4, 4
key = jax.random.PRNGKey(0)
value = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
locs = jax.random.uniform(jax.random.PRNGKey(1), (B, S, H, L, P, 2))
weights = jax.nn.softmax(
    jax.random.normal(jax.random.PRNGKey(2), (B, S, H, L, P)).reshape(B, S, H, -1)
).reshape(B, S, H, L, P)


def timeit(name, f, n=10):
    jf = jax.jit(f)
    a = float(jnp.mean(jf(value, locs, weights).astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        float(jnp.mean(jf(value, locs, weights).astype(jnp.float32)))
    print(f"{name}: {(time.perf_counter() - t0) / n * 1000:.1f} ms (mean={a:.5f})",
          flush=True)


timeit("row-gather core", lambda v, l, w: ms_deform_attn_core(v, shapes, l, w))
timeit("patch-gather core", lambda v, l, w: ms_deform_attn_core_patch(v, shapes, l, w))
timeit("flat-take core", lambda v, l, w: ms_deform_attn_core_flat(v, shapes, l, w))
timeit("flatpatch core", lambda v, l, w: ms_deform_attn_core_flatpatch(v, shapes, l, w))
timeit("flatpatch q4736", lambda v, l, w: ms_deform_attn_core_flatpatch(v, shapes, l, w, q_chunk=4736))
timeit("flat q4736", lambda v, l, w: ms_deform_attn_core_flat(v, shapes, l, w, q_chunk=4736))

# decoder cross-attn shapes
qd = 100 * 41
locs_d = jax.random.uniform(jax.random.PRNGKey(3), (B, qd, H, L, P, 2))
w_d = jax.nn.softmax(
    jax.random.normal(jax.random.PRNGKey(4), (B, qd, H, L, P)).reshape(B, qd, H, -1)
).reshape(B, qd, H, L, P)

def timeit_d(name, f, n=10):
    jf = jax.jit(f)
    a = float(jnp.mean(jf(value, locs_d, w_d).astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        float(jnp.mean(jf(value, locs_d, w_d).astype(jnp.float32)))
    print(f"{name}: {(time.perf_counter() - t0) / n * 1000:.1f} ms (mean={a:.5f})",
          flush=True)

timeit_d("dec flat-take", lambda v, l, w: ms_deform_attn_core_flat(v, shapes, l, w))
timeit_d("dec flatpatch", lambda v, l, w: ms_deform_attn_core_flatpatch(v, shapes, l, w))

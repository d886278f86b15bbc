"""Break down TESTR encoder-layer cost: core vs module vs full layer."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tair_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from tair_tpu.spotter.ms_deform_attn import MSDeformAttn, ms_deform_attn_core_patch
from tair_tpu.spotter.transformer import EncoderLayer, encoder_reference_points

shapes = ((16, 16), (32, 32), (64, 64), (64, 64))
S = sum(h * w for h, w in shapes)
B, H, D, P, L, C = 1, 8, 32, 4, 4, 256
value = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D), jnp.bfloat16)
locs = jax.random.uniform(jax.random.PRNGKey(1), (B, S, H, L, P, 2))
weights = jax.nn.softmax(
    jax.random.normal(jax.random.PRNGKey(2), (B, S, H, L, P)).reshape(B, S, H, -1)
).reshape(B, S, H, L, P)
src = jax.random.normal(jax.random.PRNGKey(3), (B, S, C), jnp.bfloat16)
ref = jnp.asarray(encoder_reference_points(shapes))[None]
ref = jnp.broadcast_to(ref, (B, S, L, 2))

msda = MSDeformAttn(C, L, H, P, dtype=jnp.bfloat16)
mp = msda.init(jax.random.PRNGKey(4), src, ref, src, shapes)
layer = EncoderLayer(C, 1024, L, H, P, dtype=jnp.bfloat16)
lp = layer.init(jax.random.PRNGKey(5), src, src, ref, shapes)


def timeit(name, f, *args, n=10):
    jf = jax.jit(f)
    float(jnp.mean(jf(*args).astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        float(jnp.mean(jf(*args).astype(jnp.float32)))
    print(f"{name}: {(time.perf_counter() - t0) / n * 1000:.1f} ms", flush=True)


def loop6(f):
    def g(x, *a):
        for _ in range(6):
            x = f(x, *a)
        return x
    return g


timeit("noop fetch", lambda v: v[0, 0], value)
timeit("6x core", loop6(lambda v: ms_deform_attn_core_patch(
    v.reshape(B, S, H, D), shapes, locs, weights).reshape(B, S, H, D)), value)
timeit("6x msda module", loop6(lambda s: msda.apply(mp, s, ref, s, shapes)), src)
timeit("6x encoder layer", loop6(lambda s: layer.apply(lp, s, s, ref, shapes)), src)

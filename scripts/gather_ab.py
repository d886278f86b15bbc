"""A/B raw gather idioms at deformable-attention scale on the chip."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tair_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

S, H, D, Q, P = 4096, 8, 32, 9472, 4
N = Q * P * 4  # samples incl corners, per head

v_hsd = jax.random.normal(jax.random.PRNGKey(0), (H * S, D), jnp.bfloat16)
v_shd = jax.random.normal(jax.random.PRNGKey(0), (S, H * D), jnp.bfloat16)
v_bhsd = v_hsd.reshape(1, H, S, D)
idx_flat = jax.random.randint(jax.random.PRNGKey(1), (H * N,), 0, H * S)
idx_h = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, S)
idx_bh = jax.random.randint(jax.random.PRNGKey(1), (1, H, N), 0, S)


def timeit(name, f, *args, n=10):
    jf = jax.jit(f)
    float(jnp.mean(jf(*args).astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        float(jnp.mean(jf(*args).astype(jnp.float32)))
    print(f"{name}: {(time.perf_counter() - t0) / n * 1000:.1f} ms", flush=True)


timeit("noop", lambda v: v[0, 0], v_hsd)
# (1) 2D row-take, 64B rows, all heads flattened into operand
timeit("take [H*S, 32]", lambda v, i: jnp.take(v, i, axis=0), v_hsd, idx_flat)
# (2) 2D row-take, 512B rows, 8x overfetch (heads share the row)
timeit("take [S, 256] (8x waste)", lambda v, i: jnp.take(v, i, axis=0),
       v_shd, idx_h)
# (3) batched take_along_axis (current-style)
timeit(
    "take_along_axis [1,H,S,D]",
    lambda v, i: jnp.take_along_axis(v, i[..., None], axis=2),
    v_bhsd, idx_bh,
)
# (4) one-hot matmul for a small level (S=1024)
S2 = 1024
v2 = jax.random.normal(jax.random.PRNGKey(2), (1, H, S2, D), jnp.bfloat16)
idx2 = jax.random.randint(jax.random.PRNGKey(3), (1, H, N), 0, S2)


def onehot_mm(v, i):
    oh = jax.nn.one_hot(i, S2, dtype=jnp.bfloat16)  # [1,H,N,S2]
    return jnp.einsum("bhns,bhsd->bhnd", oh, v, preferred_element_type=jnp.float32)


timeit("one-hot matmul S=1024", onehot_mm, v2, idx2)

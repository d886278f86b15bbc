"""Encoder-shape msda core timing, amortized in-graph (where does the
~4.5ms/encoder-layer go: the gather core or the surrounding layer?)."""

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
    patchify_value,
    patchify_value_conv,
)

shapes = ((16, 16), (32, 32), (64, 64), (64, 64))
S = sum(h * w for h, w in shapes)
B, H, D, P, L = 1, 8, 32, 4, 4
REPS = 20

value = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D), jnp.bfloat16)
q = S
locs = jax.random.uniform(jax.random.PRNGKey(1), (B, q, H, L, P, 2))
wts = jax.nn.softmax(
    jax.random.normal(jax.random.PRNGKey(2), (B, q, H, L, P)).reshape(B, q, H, -1)
).reshape(B, q, H, L, P)


def bench(name, fn, *args, n=5):
    def repeated(*a):
        def body(i, acc):
            out = fn(*a[:-1], a[-1] * (1.0 + 1e-6 * i))
            return acc + jnp.mean(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, REPS, body, 0.0)

    jf = jax.jit(repeated)
    float(jf(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        float(jf(*args))
    dt = (time.perf_counter() - t0) / n / REPS * 1000
    print(f"{name}: {dt:.2f} ms/call", flush=True)


bench("flatpatch-mxu/concat enc (Q=S)",
      lambda v, l, w: ms_deform_attn_core_flatpatch(
          v, shapes, l, w, q_chunk=16384, patchify="concat"),
      value, locs, wts)
bench("flatpatch-mxu/conv enc (Q=S)",
      lambda v, l, w: ms_deform_attn_core_flatpatch(
          v, shapes, l, w, q_chunk=16384, patchify="conv"),
      value, locs, wts)
bench("flat enc (Q=S)",
      lambda v, l, w: ms_deform_attn_core_flat(v, shapes, l, w, q_chunk=16384),
      value, locs, wts)
bench("patchify concat only",
      lambda v, w: patchify_value(v, shapes) * 1.0 + w * 0,
      value, jnp.zeros((B * H * S, 4 * D), jnp.bfloat16))
bench("patchify conv only",
      lambda v, w: patchify_value_conv(v, shapes) * 1.0 + w * 0,
      value, jnp.zeros((B * H * S, 4 * D), jnp.bfloat16))
# the take alone (indices fixed): isolates gather cost from weighting math
vp = patchify_value(value, shapes)
idx = jax.random.randint(jax.random.PRNGKey(3), (B * q * H * P * L,), 0, B * H * S)
bench("raw row-take 128-lane",
      lambda i, t: jnp.take(t, i, axis=0),
      idx, vp)

from tair_tpu.ops.patchify import patchify_value_pallas

bench("patchify pallas only",
      lambda v, w: patchify_value_pallas(v, shapes) * 1.0 + w * 0,
      value, jnp.zeros((B * H * S, 4 * D), jnp.bfloat16))
bench("flatpatch-mxu/pallas enc (Q=S)",
      lambda v, l, w: ms_deform_attn_core_flatpatch(
          v, shapes, l, w, q_chunk=16384, patchify="pallas"),
      value, locs, wts)

"""Locate the TESTR hotspot: encoder vs decoder vs raw ms-deform-attn."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tair_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from tair_tpu.spotter.ms_deform_attn import ms_deform_attn_core
from tair_tpu.spotter.testr import TESTR, TESTRConfig


def timeit(name, f, *args, n=5):
    jf = jax.jit(f)
    float(jnp.mean(jnp.asarray(jax.tree.leaves(jf(*args))[0], jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        float(jnp.mean(jnp.asarray(jax.tree.leaves(jf(*args))[0], jnp.float32)))
    print(f"{name}: {(time.perf_counter() - t0) / n * 1000:.1f} ms", flush=True)


def feats(b=1):
    return tuple(
        jnp.zeros((b, s, s, c), jnp.bfloat16)
        for s, c in [(16, 1280), (32, 1280), (64, 640), (64, 320)]
    )


# raw core at encoder shapes: S=Q=5440... wait actual: 16^2+32^2+64^2+64^2=9472
shapes = ((16, 16), (32, 32), (64, 64), (64, 64))
S = sum(h * w for h, w in shapes)
B, H, D, P, L = 1, 8, 32, 4, 4
value = jnp.zeros((B, S, H, D), jnp.bfloat16)
locs = jnp.full((B, S, H, L, P, 2), 0.5, jnp.float32)
weights = jnp.full((B, S, H, L, P), 1.0 / (L * P), jnp.float32)
timeit("msda core enc (Q=S)", lambda v, l, w: ms_deform_attn_core(v, shapes, l, w),
       value, locs, weights)

qd = 100 * 16
locs_d = jnp.full((B, qd, H, L, P, 2), 0.5, jnp.float32)
w_d = jnp.full((B, qd, H, L, P), 1.0 / (L * P), jnp.float32)
timeit("msda core dec-loc (Q=1600)",
       lambda v, l, w: ms_deform_attn_core(v, shapes, l, w), value, locs_d, w_d)

for enc, dec, tag in [(6, 6, "full"), (0, 6, "enc0"), (6, 0, "dec0"), (1, 1, "1+1")]:
    cfg = TESTRConfig(num_encoder_layers=enc, num_decoder_layers=dec)
    if dec == 0:
        continue  # model requires >=1 decoder layer
    m = TESTR(cfg, dtype=jnp.bfloat16)
    p = m.init(jax.random.PRNGKey(0), feats())
    timeit(f"testr {tag}", lambda p, f: m.apply(p, f)["pred_logits"], p, feats())

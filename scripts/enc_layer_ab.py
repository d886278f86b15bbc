"""Encoder layer anatomy: full layer vs core-only vs projections-only."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tair_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from flax import linen as nn

from tair_tpu.spotter.ms_deform_attn import MSDeformAttn
from tair_tpu.spotter.transformer import EncoderLayer, encoder_reference_points

shapes = ((16, 16), (32, 32), (64, 64), (64, 64))
S = sum(h * w for h, w in shapes)
B, C = 1, 256
REPS = 20

src = jax.random.normal(jax.random.PRNGKey(0), (B, S, C), jnp.bfloat16)
pos = jax.random.normal(jax.random.PRNGKey(1), (B, S, C), jnp.bfloat16)
ref = jnp.broadcast_to(
    jnp.asarray(encoder_reference_points(shapes))[None], (B, S, 4, 2)
)


def bench(name, mod, apply_fn, n=4):
    p = mod.init(jax.random.PRNGKey(2), src)

    def repeated(p_, s_):
        def body(i, x):
            out = apply_fn(p_, x * (1 + 1e-6 * i))
            return x + (jnp.mean(out.astype(jnp.float32)) * 0).astype(x.dtype)

        return jax.lax.fori_loop(0, REPS, body, s_)

    jf = jax.jit(repeated)
    float(jnp.mean(jnp.asarray(jf(p, src), jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        float(jnp.mean(jnp.asarray(jf(p, src), jnp.float32)))
    print(f"{name}: {(time.perf_counter() - t0) / n / REPS * 1000:.2f} ms",
          flush=True)


class LayerWrap(nn.Module):
    @nn.compact
    def __call__(self, s):
        return EncoderLayer(256, 1024, 4, 8, 4, dtype=jnp.bfloat16,
                            msda_q_chunk=16384)(s, pos, ref, shapes)


class MSDAWrap(nn.Module):
    @nn.compact
    def __call__(self, s):
        return MSDeformAttn(256, 4, 8, 4, dtype=jnp.bfloat16,
                            core="flatpatch", q_chunk=16384)(
            s + pos, ref, s, shapes)


class FFNWrap(nn.Module):
    @nn.compact
    def __call__(self, s):
        h = nn.relu(nn.Dense(1024, dtype=jnp.bfloat16)(s))
        h = nn.Dense(256, dtype=jnp.bfloat16)(h)
        return nn.LayerNorm(dtype=jnp.float32)(s + h).astype(jnp.bfloat16)


bench("encoder layer full", LayerWrap(), lambda p, s: LayerWrap().apply(p, s))
bench("msda module only", MSDAWrap(), lambda p, s: MSDAWrap().apply(p, s))
bench("ffn+ln only", FFNWrap(), lambda p, s: FFNWrap().apply(p, s))


class MSDAPreWrap(nn.Module):
    """MSDeformAttn with the gather core stubbed: isolates projections +
    sampling-location/weight math."""

    @nn.compact
    def __call__(self, s):
        from tair_tpu.spotter import ms_deform_attn as M

        saved = M.ms_deform_attn_core_flatpatch

        def stub(value, shapes_, locs, wts, **kw):
            b, S_, h, d = value.shape
            q = locs.shape[1]
            # touch all inputs so nothing is DCE'd
            t = (jnp.mean(locs.astype(jnp.float32))
                 + jnp.mean(wts.astype(jnp.float32)))
            return (jnp.zeros((b, q, h * d), value.dtype)
                    + t.astype(value.dtype))

        M.ms_deform_attn_core_flatpatch = stub
        try:
            out = MSDeformAttn(256, 4, 8, 4, dtype=jnp.bfloat16,
                               core="flatpatch", q_chunk=16384)(
                s + pos, ref, s, shapes)
        finally:
            M.ms_deform_attn_core_flatpatch = saved
        return out


bench("msda pre-core only", MSDAPreWrap(),
      lambda p, s: MSDAPreWrap().apply(p, s))


class MSDAWrapLanes(nn.Module):
    @nn.compact
    def __call__(self, s):
        return MSDeformAttn(256, 4, 8, 4, dtype=jnp.bfloat16,
                            core="flatlanes", q_chunk=16384)(
            s + pos, ref, s, shapes)


bench("msda module flatlanes", MSDAWrapLanes(),
      lambda p, s: MSDAWrapLanes().apply(p, s))

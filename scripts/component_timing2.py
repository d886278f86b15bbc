"""Per-component latency with in-graph repetition (amortizes the ~30ms
remote-relay dispatch overhead that polluted single-call timings)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tair_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from tair_tpu.models.tokenizer import tokenize
from tair_tpu.pipeline import build_default_model

REPS = 10


def main():
    model = build_default_model(dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), latent_hw=8)
    b = 1
    lq = jax.random.uniform(jax.random.PRNGKey(1), (b, 512, 512, 3))
    toks = jnp.asarray(tokenize([""] * b))
    z = jax.random.normal(jax.random.PRNGKey(2), (b, 64, 64, 4))
    ctx = jnp.zeros((b, 77, 1024))
    t = jnp.full((b,), 500, jnp.int32)
    cond = dict(c_txt=ctx, c_img=z)

    def timeit(name, step, init, n=3):
        """step: (carry, i) -> carry, same shape; fori-looped REPS times."""

        def repeated(params, x0):
            return jax.lax.fori_loop(
                0, REPS, lambda i, x: step(params, x, i), x0
            )

        jf = jax.jit(repeated)
        r = jf(params, init)
        float(jnp.mean(jnp.asarray(jax.tree.leaves(r)[0], jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(n):
            r = jf(params, init)
            float(jnp.mean(jnp.asarray(jax.tree.leaves(r)[0], jnp.float32)))
        print(f"{name}: {(time.perf_counter() - t0) / n / REPS * 1000:.2f} ms",
              flush=True)

    # chained where output shape == input shape; else scale input by i
    timeit("cldm step (unet+controlnet)",
           lambda p, x, i: model.cldm.apply(p, x, t, cond)[0].astype(x.dtype), z)
    timeit("unet only",
           lambda p, x, i: model.cldm.unet.apply(
               {"params": p["unet"]}, x, t, ctx
           ).astype(x.dtype),
           z)
    timeit("swinir 512",
           lambda p, x, i: model.clean(p, x).astype(x.dtype), lq)
    timeit("vae encode 512",
           lambda p, x, i: jnp.broadcast_to(
               jnp.mean(model.cldm.vae_encode(p, x * (1 + 1e-6 * i),
                                              sample=False)), x.shape
           ).astype(x.dtype) + x,
           lq)
    timeit("vae decode",
           lambda p, x, i: jnp.broadcast_to(
               jnp.mean(model.cldm.vae_decode(p, x * (1 + 1e-6 * i))), x.shape
           ).astype(x.dtype) + x,
           z)
    timeit("clip encode",
           lambda p, x, i: jnp.broadcast_to(
               jnp.mean(model.cldm.clip_encode_tokens(p, toks + (i - i))),
               x.shape,
           ).astype(x.dtype) + x,
           jnp.zeros((8, 128), jnp.float32))

    feats = tuple(
        jax.random.normal(jax.random.PRNGKey(3 + i), (b, s, s, c), jnp.bfloat16)
        for i, (s, c) in enumerate([(16, 1280), (32, 1280), (64, 640), (64, 320)])
    )
    timeit("testr fwd",
           lambda p, x, i: jnp.broadcast_to(
               jnp.mean(
                   model.spotter_apply(
                       p, tuple(f * (1 + 1e-6 * i) for f in feats)
                   )["pred_logits"].astype(jnp.float32)
               ),
               x.shape,
           ).astype(x.dtype) + x,
           jnp.zeros((8, 128), jnp.float32))


if __name__ == "__main__":
    main()

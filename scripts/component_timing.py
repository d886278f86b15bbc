"""Per-component latency measurement on the current backend (dev tool)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tair_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from tair_tpu.models.tokenizer import tokenize
from tair_tpu.pipeline import build_default_model


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

    def timeit(name, fn, *args, n=5):
        f = jax.jit(fn)
        float(jnp.mean(jnp.asarray(jax.tree.leaves(f(params, *args))[0],
                                   jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(n):
            float(jnp.mean(jnp.asarray(jax.tree.leaves(f(params, *args))[0],
                                       jnp.float32)))
        print(f"{name}: {(time.perf_counter() - t0) / n * 1000:.1f} ms",
              flush=True)

    timeit("cldm step", lambda p, z, t: model.cldm.apply(p, z, t, cond)[0], z, t)
    timeit("unet only",
           lambda p, z, t: model.cldm.unet.apply({"params": p["unet"]}, z, t, ctx),
           z, t)
    timeit("swinir 512", lambda p, x: model.clean(p, x), lq)
    timeit("vae encode 512",
           lambda p, x: model.cldm.vae_encode(p, x, sample=False), lq)
    timeit("vae decode", lambda p, z: model.cldm.vae_decode(p, z), z)
    timeit("clip encode", lambda p, tk: model.cldm.clip_encode_tokens(p, tk), toks)
    feats = tuple(
        jnp.zeros((b, s, s, c), jnp.bfloat16)
        for s, c in [(16, 1280), (32, 1280), (64, 640), (64, 320)]
    )
    timeit("testr fwd", lambda p, f: model.spotter_apply(p, f)["pred_logits"],
           feats)


if __name__ == "__main__":
    main()

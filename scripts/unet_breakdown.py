"""Where the 21ms cldm step goes: UNet vs ControlNet, attention vs convs.

v5e, batch 1, bf16 (amortized): unet full 14.8ms / no-attn trunk 7.6ms /
controlnet 3.1ms; attention impl is NOT the lever — xla/pallas/einsum all
measure ~14.8-15.4ms (at batch 1 the 4096-token SDPA is memory-bound and
every impl hits the same floor). The conv trunk runs at ~40% practical MXU
utilization; the step is near its memory-bound floor for this geometry."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tair_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from tair_tpu.models.unet import ControlNet, UNetConfig, UNetModel

REPS = 10


def timeit(name, fn, *args, n=3):
    def repeated(*a):
        def body(i, x):
            out = fn(a[0], x * (1 + 1e-6 * i), *a[2:])
            leaf = jax.tree.leaves(out)[0]
            return x + jnp.mean(leaf.astype(jnp.float32)) * 0
        return jax.lax.fori_loop(0, REPS, body, a[1])

    jf = jax.jit(repeated)
    r = jf(*args)
    float(jnp.mean(jnp.asarray(jax.tree.leaves(r)[0], jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        float(jnp.mean(jnp.asarray(jax.tree.leaves(jf(*args))[0], jnp.float32)))
    print(f"{name}: {(time.perf_counter() - t0) / n / REPS * 1000:.2f} ms",
          flush=True)


def main():
    b = 1
    x = jnp.zeros((b, 64, 64, 4), jnp.float32)
    t = jnp.full((b,), 500, jnp.int32)
    ctx = jnp.zeros((b, 77, 1024), jnp.bfloat16)
    hint = jnp.zeros((b, 64, 64, 4), jnp.float32)

    unet = UNetModel(UNetConfig(), dtype=jnp.bfloat16)
    p = unet.init(jax.random.PRNGKey(0), x, t, ctx)
    timeit("unet full", lambda p_, x_: unet.apply(p_, x_, t, ctx), p, x)

    # attention everywhere removed: isolates the conv/resblock trunk
    unet_na = UNetModel(UNetConfig(attention_resolutions=()), dtype=jnp.bfloat16)
    pna = unet_na.init(jax.random.PRNGKey(0), x, t, ctx)
    timeit("unet no-attn", lambda p_, x_: unet_na.apply(p_, x_, t, ctx), pna, x)

    cn = ControlNet(UNetConfig(), dtype=jnp.bfloat16)
    pc = cn.init(jax.random.PRNGKey(0), x, hint, t, ctx)
    timeit("controlnet", lambda p_, x_: cn.apply(p_, x_, hint, t, ctx), pc, x)


def attn_ab():
    b = 1
    x = jnp.zeros((b, 64, 64, 4), jnp.float32)
    t = jnp.full((b,), 500, jnp.int32)
    ctx = jnp.zeros((b, 77, 1024), jnp.bfloat16)
    from tair_tpu.ops import attention as A
    from tair_tpu.ops import flash_attention  # noqa: F401

    unet = UNetModel(UNetConfig(), dtype=jnp.bfloat16)
    p = unet.init(jax.random.PRNGKey(0), x, t, ctx)
    for impl in ("xla", "pallas", "einsum"):
        A.set_attn_impl(impl)
        timeit(f"unet full attn={impl}",
               lambda p_, x_: unet.apply(p_, x_, t, ctx), p, x)
    A.set_attn_impl("xla")


if __name__ == "__main__":
    import sys as _sys

    if "--ab" in _sys.argv:
        attn_ab()
    else:
        main()

"""Op-level profiler trace of the UNet(+ControlNet) denoise step on chip.

Times N in-graph repetitions of the cldm apply at production geometry and
prints top self-time device ops from the xplane — finds where the ~21ms
goes relative to the ~5ms weight+activation roofline."""

import glob
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tair_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

REPS = 10


from _xplane import print_top


def summarize(log_dir, top=20):
    print_top(log_dir, top=top, per=REPS, leaf_only=False)


def main():
    from tair_tpu.models.cldm import ControlLDM
    from tair_tpu.ops.attention import enable_inference_kernels

    print("attention impl:", enable_inference_kernels())
    cldm = ControlLDM.create(dtype=jnp.bfloat16)
    params = cldm.init(jax.random.PRNGKey(0), latent_hw=8)
    x = jnp.zeros((1, 64, 64, 4), jnp.float32)
    t = jnp.full((1,), 500, jnp.int32)
    cond = dict(
        c_txt=jnp.zeros((1, 77, 1024), jnp.float32),
        c_img=jnp.zeros((1, 64, 64, 4), jnp.float32),
    )

    @jax.jit
    def run(p, x):
        def body(i, x):
            eps, feats = cldm.apply(p, x, t, cond, extract_features=True)
            # consume feats so taps aren't DCE'd; keep the carry shape
            return eps + 1e-6 * sum(f.mean() for f in feats)

        return jax.lax.fori_loop(0, REPS, body, x)

    jax.block_until_ready(run(params, x))
    t0 = time.perf_counter()
    jax.block_until_ready(run(params, x))
    print(f"cldm step amortized: {(time.perf_counter() - t0) / REPS * 1e3:.2f} ms")

    log_dir = "/tmp/unet_trace"
    with jax.profiler.trace(log_dir):
        jax.block_until_ready(run(params, x))
    summarize(log_dir)


if __name__ == "__main__":
    main()

"""Op-level profiler trace of the TESTR encoder layer on the chip.

For each msda core, times N in-graph repetitions of one encoder layer at
production shapes, captures an xplane trace, and prints the top self-time
device ops — so msda optimization targets are measured, not guessed.

Finding (2026-08-17, v5e): flatpatch spends ~1.5ms/layer relaying out the
[B,Q,H,P,L]-minor index/weight tensors (s32 reshape to T(1,128), two copies
of idx, one of w4) before the 2.24ms gather; the gather itself is row-rate
bound (~540M rows/s, 17% of HBM BW at 256B rows).
"""

import glob
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tair_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from tair_tpu.spotter.transformer import EncoderLayer

REPS = 20


from _xplane import print_top


def summarize(log_dir, top=12):
    print_top(log_dir, top=top, per=REPS, leaf_only=False)


def run_core(core):
    shapes = ((16, 16), (32, 32), (64, 64), (64, 64))
    S = sum(h * w for h, w in shapes)
    c = 256
    layer = EncoderLayer(
        d_model=c, d_ffn=1024, n_levels=4, n_heads=8, n_points=4,
        dtype=jnp.bfloat16, msda_core=core,
    )
    src = jax.random.normal(jax.random.PRNGKey(0), (1, S, c), jnp.bfloat16)
    pos = jax.random.normal(jax.random.PRNGKey(1), (1, S, c), jnp.bfloat16)
    ref = jax.random.uniform(jax.random.PRNGKey(2), (1, S, 4, 2))
    params = layer.init(jax.random.PRNGKey(3), src, pos, ref, shapes)

    @jax.jit
    def run(p, src):
        return jax.lax.fori_loop(
            0, REPS, lambda i, s: layer.apply(p, s, pos, ref, shapes), src
        )

    jax.block_until_ready(run(params, src))
    t0 = time.perf_counter()
    jax.block_until_ready(run(params, src))
    print(f"[{core}] encoder layer amortized: "
          f"{(time.perf_counter() - t0) / REPS * 1e3:.2f} ms")

    log_dir = f"/tmp/enc_trace_{core}"
    with jax.profiler.trace(log_dir):
        jax.block_until_ready(run(params, src))
    summarize(log_dir)


def main():
    for core in sys.argv[1:] or ("flatpatch", "flatlanes"):
        run_core(core)


if __name__ == "__main__":
    main()

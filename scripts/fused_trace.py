"""Op-level trace of the FULL fused TeReDiff loop at different batch sizes.

Round-2 question: why is the fused loop super-linear in batch (b=1 2.87s,
b=2 6.69s = 2.33x)?  This captures an xplane trace of the whole 50-step
program at each batch and prints the top device ops by self time, so the
batch-scaling regression is located, not guessed.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/fused_trace.py [batches...]
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

from tair_tpu.ops.attention import enable_inference_kernels
from tair_tpu.pipeline import build_default_model, cast_params_for_inference

STEPS = 50


from _xplane import print_top


def summarize(log_dir, top=24):
    print_top(log_dir, top=top, per=1, leaf_only=True)


def run_batch(b):
    import os

    enable_inference_kernels()
    # TAIR_TRACE_QUANT=1 traces the w8a8 serving variant (ops/quant.py)
    model = build_default_model(
        dtype=jnp.bfloat16,
        quantized=os.environ.get("TAIR_TRACE_QUANT", "0") == "1",
    )
    params = model.init(jax.random.PRNGKey(0), latent_hw=8)
    params = cast_params_for_inference(params)
    lq = jax.random.uniform(jax.random.PRNGKey(1), (b, 512, 512, 3))

    @jax.jit
    def run(params, lq, rng):
        restored, _ = model.restore_fused_feedback(
            params, lq, rng, steps=STEPS
        )
        return jnp.mean(restored)

    float(run(params, lq, jax.random.PRNGKey(2)))  # compile + warmup
    t0 = time.perf_counter()
    float(run(params, lq, jax.random.PRNGKey(3)))
    wall = time.perf_counter() - t0
    print(f"[b={b}] wall {wall:.2f}s ({b / wall:.3f} img/s)")

    log_dir = f"/tmp/fused_trace_b{b}"
    with jax.profiler.trace(log_dir):
        float(run(params, lq, jax.random.PRNGKey(4)))
    summarize(log_dir)


def main():
    for b in [int(a) for a in sys.argv[1:]] or [1, 2]:
        run_batch(b)


if __name__ == "__main__":
    main()

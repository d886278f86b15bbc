"""Where does the fused loop's HBM go? (VERDICT round 1, weak #6 / next #8)

AOT-compiles the full fused TeReDiff loop at the given batch sizes and
prints XLA's exact memory analysis (argument/output/temp/code bytes) plus
the param-bytes breakdown, explaining why batch 2 was sub-linear and what
the 16 GB budget is spent on.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/hbm_profile.py [batches...]
"""

import sys

import jax
import jax.numpy as jnp

from tair_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from tair_tpu.ops.attention import enable_inference_kernels
from tair_tpu.pipeline import build_default_model, cast_params_for_inference


def fmt(n):
    return f"{n / 2**30:7.2f} GiB"


def main():
    batches = [int(a) for a in sys.argv[1:]] or [1, 2]
    enable_inference_kernels()
    model = build_default_model(dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), latent_hw=8)

    p_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(params)
    )
    print(f"params (fp32 masters): {fmt(p_bytes)}")

    for cast in (False, True):
        p = cast_params_for_inference(params) if cast else params
        tag = "bf16-resident" if cast else "fp32-masters"
        for b in batches:
            lq = jnp.zeros((b, 512, 512, 3), jnp.float32)

            def run(params, lq, rng):
                restored, _ = model.restore_fused_feedback(
                    params, lq, rng, steps=50
                )
                return jnp.mean(restored)

            lowered = jax.jit(run).lower(p, lq, jax.random.PRNGKey(0))
            compiled = lowered.compile()
            m = compiled.memory_analysis()
            if m is None:
                print(f"[{tag} b={b}] memory_analysis unavailable")
                continue
            print(
                f"[{tag} b={b}] args={fmt(m.argument_size_in_bytes)} "
                f"out={fmt(m.output_size_in_bytes)} "
                f"temp={fmt(m.temp_size_in_bytes)} "
                f"code={fmt(m.generated_code_size_in_bytes)} "
                f"alias={fmt(m.alias_size_in_bytes)} "
                f"TOTAL={fmt(m.argument_size_in_bytes + m.output_size_in_bytes + m.temp_size_in_bytes + m.generated_code_size_in_bytes - m.alias_size_in_bytes)}"
            )


if __name__ == "__main__":
    main()

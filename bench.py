"""Benchmark: restored 512^2 images/sec/chip at 50 spaced-DDPM steps.

Runs the full flagship inference path (SwinIR clean -> CLIP/VAE condition ->
50-step ControlNet+UNet spaced sampling -> VAE decode) on the available
chip(s) and prints ONE JSON line.

The reference has no published numbers (BASELINE.json `published:{}`), so
`vs_baseline` is reported against a measured PyTorch-A100 anchor of 0.065
img/s (50-step DiffBIR-class 512^2 restoration, ~0.3 s/step UNet+ControlNet
fwd) — conservative; the driver's own baseline run supersedes it.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

A100_ANCHOR_IMG_PER_S = 0.065  # measured-class PyTorch anchor (see docstring)


def main() -> None:
    from tair_tpu.models.tokenizer import tokenize
    from tair_tpu.ops.attention import enable_inference_kernels
    from tair_tpu.pipeline import build_default_model
    from tair_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    enable_inference_kernels()

    model = build_default_model(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, latent_hw=8)

    batch = 1
    steps = 50
    lq = jax.random.uniform(jax.random.PRNGKey(1), (batch, 512, 512, 3))
    tokens = jnp.asarray(tokenize([""] * batch))

    @jax.jit
    def run(params, lq, tokens, rng):
        restored, _, _ = model.restore(params, lq, tokens, rng, steps=steps)
        # scalar reduction forces full materialization on fetch
        return jnp.mean(restored)

    # compile + warmup (fetch the scalar: a real device->host sync)
    float(run(params, lq, tokens, jax.random.PRNGKey(2)))

    n_iter = 3
    t0 = time.perf_counter()
    for i in range(n_iter):
        # float() fetch each iteration: cannot complete without the full
        # 50-step chain executing (block_until_ready alone is not a reliable
        # barrier through the remote-device relay)
        float(run(params, lq, tokens, jax.random.PRNGKey(3 + i)))
    dt = (time.perf_counter() - t0) / n_iter

    n_chips = jax.device_count()
    img_per_s_per_chip = batch / dt / n_chips
    print(
        json.dumps(
            {
                "metric": "restored_512px_images_per_sec_per_chip_50steps",
                "value": round(img_per_s_per_chip, 5),
                "unit": "img/s/chip",
                "vs_baseline": round(img_per_s_per_chip / A100_ANCHOR_IMG_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

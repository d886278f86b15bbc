"""Benchmark: full TeReDiff 512^2 images/sec/chip at 50 spaced-DDPM steps.

Measures the flagship text-aware loop — every denoising step runs
ControlNet+UNet, the TESTR spotter on the tapped decoder features, on-device
prompt splicing, and CLIP re-encoding (the val_sample semantics,
fully compiled; see tair_tpu/pipeline.py restore_fused_feedback) — plus the
SwinIR clean, VAE encode/decode. Prints ONE JSON line.

The reference has no published numbers (BASELINE.json `published:{}`), so
`vs_baseline` is reported against a measured-class PyTorch-A100 anchor of
0.04 img/s for the same 50-step spotter-in-the-loop workload; the driver's
own baseline run supersedes it.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

A100_ANCHOR_IMG_PER_S = 0.04  # spotter-in-loop anchor (see docstring)


def _wait_for_devices(attempts: int = 4, delay_s: float = 90.0) -> None:
    """The remote-TPU relay occasionally drops for minutes at a time; retry
    backend init instead of recording a bogus bench failure. Retry notices
    go to stderr (stdout is the one-JSON-line contract)."""
    import os
    import sys

    for i in range(attempts):
        try:
            jax.devices()
            break
        except RuntimeError as e:
            if i == attempts - 1:
                raise
            print(f"# backend unavailable ({e}); retry {i + 1}/{attempts}",
                  file=sys.stderr)
            time.sleep(delay_s)
    # after a failed TPU init JAX may have cached the CPU backend and the
    # retry 'succeeds' on it — never record CPU throughput as img/s/chip
    platform = jax.devices()[0].platform
    if platform not in ("tpu", "axon") and not os.environ.get(
        "TAIR_BENCH_ALLOW_CPU"
    ):
        raise RuntimeError(
            f"bench requires a TPU backend, got {platform!r} "
            "(set TAIR_BENCH_ALLOW_CPU=1 to override for debugging)"
        )


def main() -> None:
    from tair_tpu.ops.attention import enable_inference_kernels
    from tair_tpu.pipeline import build_default_model
    from tair_tpu.utils.compile_cache import enable_compile_cache

    _wait_for_devices()
    enable_compile_cache()
    enable_inference_kernels()

    import os

    # sparse encoder update (serving knob like spotter_every; 0 = exact
    # reference semantics, the headline default — see docs/PERFORMANCE.md)
    enc_topk = int(os.environ.get("TAIR_BENCH_ENC_TOPK", "0"))
    overrides = {"enc_topk": enc_topk} if enc_topk else None
    # w8a8 UNet+ControlNet serving quantization (ops/quant.py; approximation
    # knob like enc_topk/spotter_every — never the headline default)
    quantized = os.environ.get("TAIR_BENCH_QUANT", "0") == "1"
    # static activation scale (per-tensor abs-max as a compile-time const):
    # removes the dynamic abs-max reduce that serialized w8a8 against the
    # weight prefetch. Throughput knob here; quality needs calibration.
    static_amax = os.environ.get("TAIR_QUANT_STATIC_AMAX")
    # selective w8a8: quantize only sites with weight bytes >= ratio x
    # activation bytes (the weight-DMA-bound inner blocks), keep the rest
    # bf16 — see ops/quant.selective
    min_ratio = os.environ.get("TAIR_QUANT_MIN_RATIO")
    model = build_default_model(
        dtype=jnp.bfloat16, testr_overrides=overrides, quantized=quantized,
        quant_static_amax=float(static_amax) if static_amax else None,
        quant_min_ratio=float(min_ratio) if min_ratio else None,
    )
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, latent_hw=8)

    # bf16-resident params (default): XLA's AOT memory analysis shows fp32
    # masters cost 6.3 GiB args + 3.7 GiB temps (the hoisted bf16 weight
    # copies) vs 3.2 + 0.8 GiB bf16-resident, and measured throughput is
    # slightly better too (0.348 vs 0.344 img/s/chip at batch 1, round 2) —
    # the serving config. TAIR_BENCH_CAST=0 keeps fp32 masters.
    if os.environ.get("TAIR_BENCH_CAST", "1") == "1":
        from tair_tpu.pipeline import cast_params_for_inference

        params = cast_params_for_inference(params)

    # batch 1 is the throughput-optimal configuration on a v5e chip: the
    # round-2 sweep measured 0.348 (b=1) vs 0.299 (b=2) vs 0.301 (b=4)
    # img/s/chip bf16-resident — the loop is dominated by linearly-scaling
    # msda gathers, and batch>=2 additionally loses ~16%/image to unfused
    # convs + layout copies (scripts/trace_diff.py; docs/PERFORMANCE.md)
    batch = int(os.environ.get("TAIR_BENCH_BATCH", "1"))
    # headline metric runs the spotter EVERY step (reference val_sample
    # semantics, spaced_sampler.py:283-317); >1 is the measured serving
    # trade documented in PERFORMANCE.md, never the reported default
    spotter_every = int(os.environ.get("TAIR_BENCH_SPOTTER_EVERY", "1"))
    steps = 50
    lq = jax.random.uniform(jax.random.PRNGKey(1), (batch, 512, 512, 3))

    @jax.jit
    def run(params, lq, rng):
        restored, _ = model.restore_fused_feedback(
            params, lq, rng, steps=steps, spotter_every=spotter_every
        )
        # scalar reduction forces full materialization on fetch
        return jnp.mean(restored)

    # compile + warmup (fetch the scalar: a real device->host sync); one
    # retry in case the device worker needs a moment to recover from a
    # previous session's fault
    try:
        float(run(params, lq, jax.random.PRNGKey(2)))
    except Exception:
        time.sleep(60)
        float(run(params, lq, jax.random.PRNGKey(2)))

    # median-of-N with per-rep timing: repeat runs through the remote-device
    # relay have shown 3x spread in the past (STATUS round 1), so a single
    # mean is not a defensible number — report median and the full spread
    n_iter = int(os.environ.get("TAIR_BENCH_REPS", "5"))
    times = []
    for i in range(n_iter):
        t0 = time.perf_counter()
        # float() fetch each iteration: cannot complete without the full
        # 50-step chain executing (block_until_ready alone is not a reliable
        # barrier through the remote-device relay)
        float(run(params, lq, jax.random.PRNGKey(3 + i)))
        times.append(time.perf_counter() - t0)

    times.sort()
    median = times[len(times) // 2] if n_iter % 2 else (
        (times[n_iter // 2 - 1] + times[n_iter // 2]) / 2
    )
    n_chips = jax.device_count()
    img_per_s_per_chip = batch / median / n_chips
    print(
        json.dumps(
            {
                "metric": (
                    "terediff_512px_images_per_sec_per_chip_50steps_with_ocr_loop"
                    + (f"_spotter_every{spotter_every}" if spotter_every != 1 else "")
                    + (f"_enc_topk{enc_topk}" if enc_topk else "")
                    + (
                        "_w8a8"
                        + ("_static" if static_amax else "")
                        + (f"_minratio{min_ratio}" if min_ratio else "")
                        if quantized else ""
                    )
                ),
                "value": round(img_per_s_per_chip, 5),
                "unit": "img/s/chip",
                "vs_baseline": round(img_per_s_per_chip / A100_ANCHOR_IMG_PER_S, 3),
                "reps": n_iter,
                "spread_img_per_s": [
                    round(batch / times[-1] / n_chips, 5),  # slowest rep
                    round(batch / times[0] / n_chips, 5),   # fastest rep
                ],
            }
        )
    )


if __name__ == "__main__":
    main()

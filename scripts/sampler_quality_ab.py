"""Sampler family / step-count quality-throughput A/B on a trained ckpt.

The reference ships four sampler families but only SpacedSampler on the TAIR
path (/root/reference/terediff/pipeline.py:178-200 for the DiffBIR dispatch;
dpms/edm are broken-by-bitrot there, SURVEY §2.3). This measures the actual
serving decision their presence implies: how few steps can each solver run
at matched PSNR/SSIM, and what does that buy in wall time.

Rows run the plain restoration path (empty prompt, no OCR feedback —
alternative samplers have no val_sample loop in the reference either) via
DiffBIRPipeline.run; compare against the spaced-sampler feedback-loop rows
from scripts/serving_quality_ab.py --steps {10,20,50} for the F-score side.

Usage (chip):
  python scripts/sampler_quality_ab.py --config configs/train_quality_demo.yaml \
      --ckpt runs/quality_demo/params_step_00012000.npz --num-images 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--num-images", type=int, default=8)
    ap.add_argument(
        "--samplers",
        default="spaced,dpm_solver_2,dpm_solver_s2,edm_euler,edm_heun",
    )
    ap.add_argument("--steps-list", default="10,20,50")
    ap.add_argument("--color-fix", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--aot-only", action="store_true",
                    help="cache all compiles, never touch the device")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tair_tpu.config import build_dataset, build_model, load_config
    from tair_tpu.data.batch_transform import degrade_batch
    from tair_tpu.data.satext import collate
    from tair_tpu.diffbir_pipeline import DiffBIRPipeline
    from tair_tpu.models.tokenizer import tokenize
    from tair_tpu.utils.compile_cache import enable_compile_cache
    from tair_tpu.utils.metrics import psnr, ssim

    enable_compile_cache()
    from tair_tpu.ops.attention import enable_inference_kernels

    enable_inference_kernels()

    from serving_quality_ab import load_trained_params  # sibling script

    from tair_tpu.pipeline import cast_params_for_inference

    cfg = load_config(args.config)
    model = build_model(cfg)
    params = None
    if not args.aot_only:
        params = load_trained_params(cfg, model, args.ckpt)
        if cfg.dtype == "bfloat16":
            params = cast_params_for_inference(params)
        params = jax.device_put(params)  # host tree as jit arg re-uploads per call
    pipe = DiffBIRPipeline(model=model)

    if args.aot_only:
        size = cfg.dataset.out_size
        pshape = jax.eval_shape(model.init, jax.random.PRNGKey(0))
        if cfg.dtype == "bfloat16":
            pshape = jax.eval_shape(cast_params_for_inference, pshape)
        key_sd = jax.eval_shape(lambda: jax.random.PRNGKey(0))
        lq_sd = jax.ShapeDtypeStruct((1, size, size, 3), jnp.float32)
        toks_sd = jax.ShapeDtypeStruct((1, 77), jnp.int32)
        for sampler_type in args.samplers.split(","):
            for steps in (int(s) for s in args.steps_list.split(",")):
                t0 = time.time()
                jax.jit(
                    lambda p, lq, toks, r, st=sampler_type, s=steps:
                    pipe.run(p, lq, toks, r, steps=s, sampler_type=st,
                             color_fix=args.color_fix)
                ).lower(pshape, lq_sd, toks_sd, key_sd).compile()
                print(f"# aot: {sampler_type}@{steps} cached "
                      f"({time.time() - t0:.0f}s)", file=sys.stderr,
                      flush=True)
        return

    ds = build_dataset(cfg, "VAL")
    degrade = jax.jit(
        lambda r, hq, k1, k2, sk: degrade_batch(r, hq, k1, k2, sk,
                                                cfg.degradation)
    )
    n = min(args.num_images, len(ds))
    pairs = []
    for i in range(n):
        raw = collate([ds[i]], max_inst=cfg.dataset.max_instances)
        gt, lq = degrade(
            jax.random.fold_in(jax.random.PRNGKey(4242), i),
            jnp.asarray(raw["hq"]), jnp.asarray(raw["kernel1"]),
            jnp.asarray(raw["kernel2"]), jnp.asarray(raw["sinc_kernel"]),
        )
        pairs.append((jnp.clip((gt + 1) / 2, 0, 1), jnp.clip(lq, 0, 1)))

    empty = jnp.asarray(tokenize([""]))

    rows = []
    for sampler_type in args.samplers.split(","):
        for steps in (int(s) for s in args.steps_list.split(",")):
            run = jax.jit(
                lambda p, lq, toks, r, st=sampler_type, s=steps:
                pipe.run(p, lq, toks, r, steps=s, sampler_type=st,
                         color_fix=args.color_fix)
            )
            psnrs, ssims, times = [], [], []
            for i, (gt01, lq) in enumerate(pairs):
                t0 = time.time()
                restored = run(params, lq, empty, jax.random.PRNGKey(7 + i))
                restored.block_until_ready()
                times.append(time.time() - t0)
                psnrs.append(float(psnr(restored, gt01)[0]))
                ssims.append(float(ssim(restored, gt01)[0]))
            steady = times[1:] or times
            row = dict(
                sampler=sampler_type, steps=steps, n_images=n,
                psnr=round(float(np.mean(psnrs)), 3),
                ssim=round(float(np.mean(ssims)), 4),
                sec_per_img=round(float(np.median(steady)), 3),
                img_per_s=round(1.0 / float(np.median(steady)), 4),
            )
            rows.append(row)
            print(json.dumps(row), flush=True)

    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()

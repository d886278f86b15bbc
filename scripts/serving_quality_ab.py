"""Serving-knob quality/throughput A/B on a trained checkpoint.

SERVING.md's knobs (`spotter_every`, `enc_topk`) change the val_sample
semantics (/root/reference/terediff/sampler/spaced_sampler.py:295-317); their
throughput was measured in round 2 but their quality cost was unknown. This
script measures both sides on held-out synthetic SA-Text pairs with an
in-environment-trained checkpoint (scripts/pretrain_demo.py + train.py on
configs/train_quality_demo.yaml):

  per knob config: PSNR/SSIM of the restored image vs GT, detection and
  end-to-end F-scores of the LAST in-loop spotter decode (utils/text_eval
  ICDAR protocol), and steady-state img/s on the same device.

enc_topk is resolution-relative: the production 512^2 values 2048/1024 of
9472 encoder tokens are 21.6%/10.8% sparsity; at this script's eval size the
same ratios are applied to the actual token count (printed per row).

Usage (chip):
  python scripts/serving_quality_ab.py --config configs/train_quality_demo.yaml \
      --ckpt runs/quality_demo/checkpoints/step_XXXXXXXX --num-images 16
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_trained_params(cfg, model, ckpt, rng_seed=0):
    """params from an orbax TrainState dir (train.py checkpoints) or a
    weight-only .npz (train/checkpoint.py save_params)."""
    import jax

    params = model.init(jax.random.PRNGKey(rng_seed))
    if ckpt is None:
        return params
    if ckpt.endswith(".npz"):
        from tair_tpu.train.checkpoint import load_params

        return load_params(ckpt, params)
    from tair_tpu.train.checkpoint import restore_checkpoint
    from tair_tpu.train.step import create_train_state

    state, _ = create_train_state(
        params, cfg.train.stage, cfg.train.learning_rate,
        grad_accum=cfg.train.grad_accum,
    )
    state = restore_checkpoint(ckpt, state)
    print(f"# restored step {int(state.step)} from {ckpt}", file=sys.stderr)
    return state.params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", default=None,
                    help="orbax TrainState dir or weight-only .npz")
    ap.add_argument("--num-images", type=int, default=16)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--score-threshold", type=float, default=0.5)
    ap.add_argument("--out", default=None, help="also write JSON rows here")
    ap.add_argument("--configs", default="exact,se2,se5,topk21,topk11,combo",
                    help="comma list: exact | seK (spotter_every=K) | "
                         "topkP (P%% encoder sparsity) | combo")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tair_tpu.config import build_dataset, build_model, load_config
    from tair_tpu.data.batch_transform import degrade_batch
    from tair_tpu.data.satext import collate
    from tair_tpu.spotter.charset import decode_text
    from tair_tpu.utils.compile_cache import enable_compile_cache
    from tair_tpu.utils.metrics import psnr, ssim
    from tair_tpu.utils.text_eval import SpottingInstance, evaluate_dataset

    enable_compile_cache()
    from tair_tpu.ops.attention import enable_inference_kernels

    enable_inference_kernels()
    cfg = load_config(args.config)
    size = cfg.dataset.out_size
    # encoder token count at this eval size: levels latent/1, /2, /4, /8 of
    # the 8x-downsampled latent (spotter/transformer.py level construction)
    lat = size // 8
    n_tokens = sum((max(1, lat // (2**i))) ** 2 for i in range(4))

    base_model = build_model(cfg)
    params = load_trained_params(cfg, base_model, args.ckpt)
    if cfg.dtype == "bfloat16":
        # measure quality in the exact serving configuration (SERVING.md:
        # bf16-resident weights)
        from tair_tpu.pipeline import cast_params_for_inference

        params = cast_params_for_inference(params)

    # knob configs: (label, spotter_every, enc_topk)
    def resolve(name):
        if name == "exact":
            return ("exact", 1, 0)
        if name.startswith("se"):
            return (name, int(name[2:]), 0)
        if name.startswith("topk"):
            pct = int(name[4:])
            return (f"topk{pct}%", 1, max(1, int(n_tokens * pct / 100)))
        if name == "combo":
            return ("topk21%+se2", 2, max(1, int(n_tokens * 0.216)))
        raise ValueError(name)

    knobs = [resolve(n) for n in args.configs.split(",")]

    # model variants share ONE param tree (enc_topk only gates the runtime
    # token selection, transformer.py:398-403)
    import dataclasses

    def model_with_topk(topk):
        if topk == 0:
            return base_model
        testr = dataclasses.replace(
            base_model.testr,
            cfg=dataclasses.replace(base_model.testr.cfg, enc_topk=topk),
        )
        return dataclasses.replace(base_model, testr=testr, _jit_cache={})

    # held-out pairs (VAL split = synthetic seed 1, unseen in training)
    ds = build_dataset(cfg, "VAL")
    degrade = jax.jit(
        lambda r, hq, k1, k2, sk: degrade_batch(r, hq, k1, k2, sk,
                                                cfg.degradation)
    )
    n = min(args.num_images, len(ds))
    items = [ds[i] for i in range(n)]
    pairs = []
    for i, item in enumerate(items):
        raw = collate([item], max_inst=cfg.dataset.max_instances)
        gt, lq = degrade(
            jax.random.fold_in(jax.random.PRNGKey(4242), i),
            jnp.asarray(raw["hq"]), jnp.asarray(raw["kernel1"]),
            jnp.asarray(raw["kernel2"]), jnp.asarray(raw["sinc_kernel"]),
        )
        pairs.append((jnp.clip((gt + 1) / 2, 0, 1), jnp.clip(lq, 0, 1)))

    rows = []
    for label, s_every, topk in knobs:
        model = model_with_topk(topk)

        run = jax.jit(
            lambda p, lq, r: model.restore_fused_feedback(
                p, lq, r, steps=args.steps,
                score_threshold=args.score_threshold,
                spotter_every=s_every, return_spots=True,
            )
        )
        psnrs, ssims, all_gts, all_spots, times = [], [], [], [], []
        for i, ((gt01, lq), item) in enumerate(zip(pairs, items)):
            t0 = time.time()
            restored, _, spots = run(params, lq, jax.random.PRNGKey(7 + i))
            restored.block_until_ready()
            times.append(time.time() - t0)
            psnrs.append(float(psnr(restored, gt01)[0]))
            ssims.append(float(ssim(restored, gt01)[0]))
            all_spots.append(jax.device_get(spots))
            all_gts.append([
                SpottingInstance(np.asarray(p) * size, t)
                for p, t in zip(item["poly"], item["text"])
            ])
        # steady-state: drop the first (compile) call
        steady = times[1:] or times
        row = dict(
            config=label, spotter_every=s_every, enc_topk=topk,
            n_tokens=n_tokens, steps=args.steps, n_images=n,
            psnr=round(float(np.mean(psnrs)), 3),
            ssim=round(float(np.mean(ssims)), 4),
            img_per_s=round(1.0 / float(np.median(steady)), 4),
            sec_per_img=round(float(np.median(steady)), 3),
        )
        # the in-loop prompt feedback uses the compiled score_threshold; the
        # EVAL threshold re-applies on the raw scores host-side, so a sweep
        # costs no recompile
        for thr in sorted({args.score_threshold, 0.3, 0.5}):
            all_preds = []
            for sp in all_spots:
                sc = sp["scores"][0]
                all_preds.append([
                    SpottingInstance(
                        sp["polygons"][0][j], decode_text(sp["recs"][0][j]),
                        float(sc[j]),
                    )
                    for j in range(len(sc)) if sc[j] >= thr
                ])
            scores = evaluate_dataset(all_gts, all_preds)
            row[f"det_f@{thr}"] = round(scores["det_hmean"], 4)
            row[f"e2e_f@{thr}"] = round(scores["e2e_hmean"], 4)
            row[f"det_p@{thr}"] = round(scores["det_precision"], 4)
            row[f"det_r@{thr}"] = round(scores["det_recall"], 4)
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()

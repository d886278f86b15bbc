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
    ap.add_argument(
        "--aot-only", action="store_true",
        help="lower+compile every fused executable into the persistent "
             "compile cache and exit WITHOUT touching the device — safe to "
             "run while training occupies the chip (compiles go to the "
             "remote compile service); the real run then starts warm",
    )
    ap.add_argument("--configs", default="exact,se2,se5,topk21,topk11,combo",
                    help="comma list: exact | seK (spotter_every=K) | "
                         "topkP (P%% encoder sparsity) | combo | "
                         "hostexact | hostexact_tag (host-tokenized loop, "
                         "CAPTION / TAG prompt; measures the fused "
                         "char-splice approximation against canonical BPE)")
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

    from tair_tpu.pipeline import cast_params_for_inference

    base_model = build_model(cfg)
    params = None
    if not args.aot_only:
        params = load_trained_params(cfg, base_model, args.ckpt)
        if cfg.dtype == "bfloat16":
            # measure quality in the exact serving configuration
            # (SERVING.md: bf16-resident weights)
            params = cast_params_for_inference(params)
        # device-resident ONCE: load_params/cast return host numpy, and a
        # host tree as a jit argument re-uploads every call (measured 63
        # s/img through the remote-chip relay before this line existed)
        params = jax.device_put(params)

    # knob configs: (label, spotter_every, enc_topk)
    def resolve(name):
        if name.startswith("hostexact"):
            return (name, 1, 0)
        if name == "exact":
            return ("exact", 1, 0)
        if name.startswith("se"):
            return (name, int(name[2:]), 0)
        if name.startswith("topk"):
            pct = int(name[4:])
            return (f"topk{pct}%", 1, max(1, int(n_tokens * pct / 100)))
        if name == "combo":
            # same token count as topk21 so the two rows share a compiled
            # executable (spotter_every is a traced arg)
            return ("topk21%+se2", 2, max(1, int(n_tokens * 21 / 100)))
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

    # spotter_every rides as a TRACED arg: {exact, se2, se5} share one
    # executable per enc_topk (3 compiles for the 6-config default sweep
    # instead of 6 — the remote relay charges minutes per program). The
    # jitted callable is memoized per topk so equal-topk rows don't even
    # re-trace.
    _run_cache = {}

    def fused_runner(topk):
        if topk not in _run_cache:
            model = model_with_topk(topk)
            _run_cache[topk] = jax.jit(
                lambda p, lq, r, k: model.restore_fused_feedback(
                    p, lq, r, steps=args.steps,
                    score_threshold=args.score_threshold,
                    spotter_every=k, return_spots=True,
                )
            )
        return _run_cache[topk]

    # held-out pairs (VAL split = synthetic seed 1, unseen in training)
    ds = build_dataset(cfg, "VAL")
    degrade = jax.jit(
        lambda r, hq, k1, k2, sk: degrade_batch(r, hq, k1, k2, sk,
                                                cfg.degradation)
    )

    if args.aot_only:
        pshape = jax.eval_shape(base_model.init, jax.random.PRNGKey(0))
        if cfg.dtype == "bfloat16":
            pshape = jax.eval_shape(cast_params_for_inference, pshape)
        key_sd = jax.eval_shape(lambda: jax.random.PRNGKey(0))
        lq_sd = jax.ShapeDtypeStruct((1, size, size, 3), jnp.float32)
        k_sd = jax.ShapeDtypeStruct((), jnp.int32)
        raw = collate([ds[0]], max_inst=cfg.dataset.max_instances)
        degrade.lower(
            key_sd,
            *(jax.ShapeDtypeStruct(np.asarray(raw[k]).shape,
                                   np.asarray(raw[k]).dtype)
              for k in ("hq", "kernel1", "kernel2", "sinc_kernel")),
        ).compile()
        print("# aot: degrade cached", file=sys.stderr, flush=True)
        for topk in sorted({k[2] for k in knobs if not k[0].startswith("hostexact")}):
            t0 = time.time()
            fused_runner(topk).lower(pshape, lq_sd, key_sd, k_sd).compile()
            print(f"# aot: fused enc_topk={topk} cached "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr, flush=True)
        return
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
        host_loop = label.startswith("hostexact")
        run = None if host_loop else fused_runner(topk)
        psnrs, ssims, all_gts, times = [], [], [], []
        all_spots, host_preds = [], []
        for i, ((gt01, lq), item) in enumerate(zip(pairs, items)):
            t0 = time.time()
            if host_loop:
                # exact-parity loop: host tokenization (canonical BPE),
                # CAPTION/TAG prompt template, per-step dispatch — the
                # reference's val_sample semantics verbatim
                restored, ts_results = base_model.restore_with_ocr_feedback(
                    params, lq, jax.random.PRNGKey(7 + i), steps=args.steps,
                    prompt_style="TAG" if label.endswith("tag") else "CAPTION",
                    score_threshold=args.score_threshold,
                )
                last = ts_results[-1][0]
                host_preds.append([
                    SpottingInstance(
                        np.asarray(poly, np.float32), text, float(s)
                    )
                    for poly, text, s in zip(
                        last["pred_polys"], last["pred_texts"], last["scores"]
                    )
                ])
            else:
                restored, _, spots = run(
                    params, lq, jax.random.PRNGKey(7 + i),
                    jnp.int32(s_every),
                )
                all_spots.append(spots)
            restored.block_until_ready()
            times.append(time.time() - t0)
            psnrs.append(float(psnr(restored, gt01)[0]))
            ssims.append(float(ssim(restored, gt01)[0]))
            if not host_loop:
                all_spots[-1] = jax.device_get(all_spots[-1])
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
        if host_loop:
            # host path keeps only the >= compiled-threshold decodes
            scores = evaluate_dataset(all_gts, host_preds)
            thr = args.score_threshold
            row[f"det_f@{thr}"] = round(scores["det_hmean"], 4)
            row[f"e2e_f@{thr}"] = round(scores["e2e_hmean"], 4)
            row[f"det_p@{thr}"] = round(scores["det_precision"], 4)
            row[f"det_r@{thr}"] = round(scores["det_recall"], 4)
        else:
            # the in-loop prompt feedback uses the compiled score_threshold;
            # the EVAL threshold re-applies on the raw scores host-side, so
            # a sweep costs no recompile
            for thr in sorted({args.score_threshold, 0.3, 0.5}):
                all_preds = []
                for sp in all_spots:
                    sc = sp["scores"][0]
                    all_preds.append([
                        SpottingInstance(
                            sp["polygons"][0][j],
                            decode_text(sp["recs"][0][j]),
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

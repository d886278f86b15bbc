"""Text-spotting-only evaluation: TESTR on diffusion features vs GT.

Counterpart of the reference's TESTR evaluation path
(testr/adet/evaluation/text_evaluation.py + text_eval_script.py), driven the
TAIR way: the spotter consumes UNet decoder features extracted from a single
noised forward pass at a fixed timestep, with the ControlNet conditioned on
a RealESRGAN-degraded LQ (exactly the training-time feature distribution,
train.py:148-164; pass --no-degrade to condition on the clean image
instead), and predictions are scored with the ICDAR-style polygon-IoU
detection / end-to-end F-measure.

Usage:
  python spotter_eval.py --config configs/train_smoke.yaml [--ckpt w.npz]
"""

from __future__ import annotations

import argparse


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--timestep", type=int, default=200)
    parser.add_argument("--num-images", type=int, default=16)
    parser.add_argument("--score-threshold", type=float, default=0.5)
    parser.add_argument(
        "--lexicon", default=None,
        help="optional word-list file for lexicon-constrained decoding",
    )
    parser.add_argument(
        "--lexicon-from-gt", action="store_true",
        help="ICDAR 'weak lexicon' protocol: constrain transcription to the "
             "union of the eval set's GT words (the reference's lexicon "
             "mode, lexicon_procesor.py; the synthetic dataset has no fixed "
             "vocabulary so the weak list is the only constructible one). "
             "Reported as e2e_f_lex alongside the unconstrained e2e.",
    )
    parser.add_argument(
        "--no-degrade", action="store_true",
        help="condition the ControlNet on the clean HQ image instead of the "
             "training-time RealESRGAN-degraded LQ",
    )
    parser.add_argument(
        "--dump-dir", default=None,
        help="also write the interchange bundle there: text_results.json "
             "(COCO format) + det.zip/gt.zip (RRC submission format, as "
             "consumed by the published benchmark servers and the "
             "reference's evaluate_method)",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tair_tpu.config import build_dataset, build_model, load_config
    from tair_tpu.data.satext import collate
    from tair_tpu.diffusion import Diffusion
    from tair_tpu.spotter.charset import decode_text
    from tair_tpu.spotter.testr import spotter_inference
    from tair_tpu.utils.text_eval import (
        LexiconMatcher,
        SpottingInstance,
        evaluate_dataset,
    )

    lexicon = None
    if args.lexicon:
        with open(args.lexicon) as f:
            lexicon = LexiconMatcher([w.strip() for w in f if w.strip()])

    cfg = load_config(args.config)
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    if args.ckpt:
        from tair_tpu.train.checkpoint import load_params

        params = load_params(args.ckpt, params)
        params = jax.device_put(params)  # host tree as jit arg re-uploads per call

    diffusion = Diffusion(schedule=model.schedule, parameterization="v")
    ds = build_dataset(cfg, "VAL")
    size = cfg.dataset.out_size

    # params as a jit argument (a closure capture would bake the weights
    # into the executable as constants)
    @jax.jit
    def _spot(params, batch, rng):
        k_vae, k_noise = jax.random.split(rng)
        clean = model.clean(params, batch["lq"])
        z_0 = model.cldm.vae_encode(params, batch["gt"], rng=k_vae, sample=True)
        cond = dict(
            c_txt=model.cldm.clip_encode_tokens(params, batch["tokens"]),
            c_img=model.cldm.vae_encode(params, clean * 2 - 1, sample=False),
        )
        t = jnp.full((z_0.shape[0],), args.timestep, jnp.int32)
        noise = jax.random.normal(k_noise, z_0.shape)
        z_t = diffusion.q_sample(z_0, t, noise)
        _, feats = model.cldm.apply(params, z_t, t, cond)
        out = model.spotter_apply(params, feats)
        return spotter_inference(out, args.score_threshold, image_size=size)

    from tair_tpu.data.batch_transform import degrade_batch

    degrade = jax.jit(
        lambda r, hq, k1, k2, sk: degrade_batch(r, hq, k1, k2, sk, cfg.degradation)
    )
    deg_base = jax.random.PRNGKey(cfg.train.seed + 1)

    all_gts, all_preds = [], []
    n = min(args.num_images, len(ds))
    for i in range(0, n, 2):
        items = [ds[j] for j in range(i, min(i + 2, n))]
        raw = collate(items, max_inst=cfg.dataset.max_instances)
        hq = jnp.asarray(raw["hq"])
        if args.no_degrade:
            gt, lq = hq * 2 - 1, hq
        else:
            gt, lq = degrade(
                jax.random.fold_in(deg_base, i), hq,
                jnp.asarray(raw["kernel1"]), jnp.asarray(raw["kernel2"]),
                jnp.asarray(raw["sinc_kernel"]),
            )
        batch = {"gt": gt, "lq": lq, "tokens": jnp.asarray(raw["tokens"])}
        res = jax.device_get(_spot(params, batch, jax.random.PRNGKey(i)))
        for bi, item in enumerate(items):
            gts = [
                SpottingInstance(np.asarray(p) * size, t)
                for p, t in zip(item["poly"], item["text"])
            ]
            keep = res["keep"][bi]
            preds = []
            for j in range(len(keep)):
                if not keep[j]:
                    continue
                text = decode_text(res["recs"][bi][j])
                preds.append(
                    SpottingInstance(
                        res["polygons"][bi][j], text, float(res["scores"][bi][j])
                    )
                )
            all_gts.append(gts)
            all_preds.append(preds)

    if args.lexicon_from_gt and lexicon is None:
        words = sorted({g.text for gts in all_gts for g in gts})
        lexicon = LexiconMatcher(words)

    if args.dump_dir:
        from tair_tpu.utils.submission import dump_submission

        paths = dump_submission(
            args.dump_dir, all_preds, list(range(1, len(all_preds) + 1)),
            gts_per_image=all_gts,
            confidence_threshold=args.score_threshold,
        )
        import sys

        print(f"# submission bundle: {paths}", file=sys.stderr)

    scores = evaluate_dataset(all_gts, all_preds)
    out = {k: round(v, 4) if isinstance(v, float) else v for k, v in scores.items()}

    if lexicon is not None:
        lex_preds = []
        for preds in all_preds:
            row = []
            for p in preds:
                matched = lexicon.find_match_word(p.text)
                if matched is None:
                    continue
                row.append(SpottingInstance(p.polygon, matched, p.score))
            lex_preds.append(row)
        lex_scores = evaluate_dataset(all_gts, lex_preds)
        out["lexicon_words"] = len(lexicon.lexicon)
        for k in ("e2e_precision", "e2e_recall", "e2e_hmean"):
            out[f"{k}_lex"] = round(lex_scores[k], 4)

    import json

    print(json.dumps(out))


if __name__ == "__main__":
    main()

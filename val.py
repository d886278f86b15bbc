"""TAIR-TPU whole-image restoration demo/eval.

Counterpart of /root/reference/val.py:24-265: per-image restoration with
per-step OCR prompt recycling (the TeReDiff loop), restored PNG + predicted
text visualization, PSNR/SSIM metrics vs GT when available.

Usage:
  python val.py --config configs/val_smoke.yaml
  python val.py --config configs/val.yaml --ckpt runs/stage3/checkpoints/...
"""

from __future__ import annotations

import argparse
import os


IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def list_images(directory: str) -> list[str]:
    """Image files only, sorted (the reference filters extensions too,
    val.py:90 — a stray README/.DS_Store must not abort the eval)."""
    return sorted(
        n for n in os.listdir(directory) if n.lower().endswith(IMG_EXTS)
    )


def load_image(path: str, size: int | None = None):
    import numpy as np
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if size is not None and (img.height != size or img.width != size):
        img = img.resize((size, size), Image.BICUBIC)
    return np.asarray(img, np.float32) / 255.0


def save_image(path: str, arr) -> None:
    import numpy as np
    from PIL import Image

    arr = np.asarray(arr)
    Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8)).save(path)


def draw_predictions(image, infos):
    """Overlay predicted polygons + texts (counterpart of text_to_image +
    TextVisualizer output, val.py:176-181)."""
    from tair_tpu.utils.visualizer import TextVisualizer

    return TextVisualizer().draw_spotter_output(image, infos)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--ckpt", default=None, help="params .npz or orbax dir")
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--image-size", type=int, default=512)
    parser.add_argument(
        "--fused", action="store_true",
        help="fully-compiled loop with on-device prompt splicing (TAG style) "
             "instead of the host-tokenized CAPTION feedback",
    )
    parser.add_argument(
        "--spotter-every", type=int, default=1,
        help="(fused only) refresh the OCR prompt every k-th denoise step; "
             "1 = reference val_sample semantics. Quality/throughput trade "
             "measured in docs/SERVING.md",
    )
    parser.add_argument(
        "--enc-topk", type=int, default=None,
        help="sparse spotter encoder: only the top-K salient tokens are "
             "msda queries per layer (0/None = exact). See docs/SERVING.md",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tair_tpu.config import build_model, load_config
    from tair_tpu.ops.attention import enable_inference_kernels
    from tair_tpu.utils.logging import MetricLogger
    from tair_tpu.utils.metrics import psnr, ssim

    from tair_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    enable_inference_kernels()
    cfg = load_config(args.config)
    if args.enc_topk:
        cfg.testr_overrides = dict(
            cfg.testr_overrides or {}, enc_topk=args.enc_topk
        )
    vc = cfg.val
    steps = args.steps or vc.steps
    os.makedirs(vc.output_dir, exist_ok=True)
    logger = MetricLogger(vc.output_dir, "val_metrics.jsonl")

    # perceptual metrics unlock with external checkpoints
    # (docs/METRIC_WEIGHTS.md); "backbone.pth:head.pth" per config field
    lpips_metric = dists_metric = clipiqa_metric = None
    if vc.lpips_weights:
        from tair_tpu.utils.lpips import LPIPSMetric

        lpips_metric = LPIPSMetric.from_torch(*vc.lpips_weights.split(":"))
    if vc.dists_weights:
        from tair_tpu.utils.dists import DISTSMetric

        dists_metric = DISTSMetric.from_torch(*vc.dists_weights.split(":"))
    if vc.clipiqa_weights:
        from tair_tpu.utils.clipiqa import CLIPIQAMetric

        clipiqa_metric = CLIPIQAMetric.from_torch(vc.clipiqa_weights)
    maniqa_metric = None
    if vc.maniqa_weights:
        from tair_tpu.utils.maniqa import MANIQAMetric

        maniqa_metric = MANIQAMetric.from_torch(vc.maniqa_weights)
    musiq_metric = None
    if vc.musiq_weights:
        from tair_tpu.utils.musiq import MUSIQMetric

        musiq_metric = MUSIQMetric.from_torch(vc.musiq_weights)

    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    if args.ckpt:
        from tair_tpu.train.checkpoint import load_params

        params = load_params(args.ckpt, params)
        # device-resident ONCE (a host tree as a jit argument re-uploads
        # the full weight set through the relay on every call)
        params = jax.device_put(params)
        print(f"loaded weights from {args.ckpt}")

    niqe_params = None
    if vc.niqe_params:
        from tair_tpu.utils.niqe import NIQEParams, niqe

        niqe_params = NIQEParams.load(vc.niqe_params)

    fused_fn = None
    if args.fused:
        from functools import partial as _partial

        # jit once outside the loop: every image shares the compiled program
        fused_fn = jax.jit(_partial(
            model.restore_fused_feedback, steps=steps,
            score_threshold=vc.score_threshold,
            spotter_every=args.spotter_every, return_spots=True,
        ))

    names = list_images(vc.lq_dir)
    for i, name in enumerate(names):
        lq = load_image(os.path.join(vc.lq_dir, name), args.image_size)
        lq_b = jnp.asarray(lq)[None]
        rng = jax.random.PRNGKey(vc.seed + i)
        if args.fused:
            from tair_tpu.spotter.charset import decode_text

            restored, tokens, spots = fused_fn(params, lq_b, rng)
            sp = jax.device_get(spots)
            keep = sp["keep"][0]
            final = {
                "pred_texts": [
                    decode_text(sp["recs"][0][j])
                    for j in range(len(keep)) if keep[j]
                ],
                "pred_polys": sp["polygons"][0][keep].astype(np.int32),
                "scores": sp["scores"][0][keep],
            }
        else:
            restored, ts_results = model.restore_with_ocr_feedback(
                params, lq_b, rng, steps=steps,
                prompt_style=vc.prompt_style,
                score_threshold=vc.score_threshold,
            )
            final = ts_results[-1][0]
        restored = np.asarray(restored[0])

        stem = os.path.splitext(name)[0]
        save_image(os.path.join(vc.output_dir, f"restored_{stem}.png"), restored)
        overlay = draw_predictions(restored, final)
        save_image(os.path.join(vc.output_dir, f"pred_texts_{stem}.png"), overlay)

        metrics = {"image": name, "pred_texts": final["pred_texts"]}
        if niqe_params is not None:
            metrics["niqe"] = niqe(restored, niqe_params)
        if clipiqa_metric is not None:  # no-reference, needs no GT
            metrics["clipiqa"] = float(
                clipiqa_metric(jnp.asarray(restored)[None])[0]
            )
        if maniqa_metric is not None:  # no-reference, needs no GT
            metrics["maniqa"] = float(
                maniqa_metric(jnp.asarray(restored)[None])[0]
            )
        if musiq_metric is not None:  # no-reference, needs no GT
            metrics["musiq"] = float(
                musiq_metric(jnp.asarray(restored)[None])[0]
            )
        if vc.gt_dir:
            gt = load_image(os.path.join(vc.gt_dir, name), args.image_size)
            metrics["psnr"] = float(psnr(jnp.asarray(restored)[None],
                                         jnp.asarray(gt)[None])[0])
            metrics["ssim"] = float(ssim(jnp.asarray(restored)[None],
                                         jnp.asarray(gt)[None])[0])
            if lpips_metric is not None:
                metrics["lpips"] = float(
                    lpips_metric(jnp.asarray(restored)[None],
                                 jnp.asarray(gt)[None])[0]
                )
            if dists_metric is not None:
                metrics["dists"] = float(
                    dists_metric(jnp.asarray(restored)[None],
                                 jnp.asarray(gt)[None])[0]
                )
        logger.log(i, metrics)

    print(f"wrote results to {vc.output_dir}")


if __name__ == "__main__":
    main()

"""TAIR-TPU tiled restoration (the fork's val_patches path, batched).

Counterpart of /root/reference/val_patches.py:209-475: split LQ into 128^2
patches with 16-px overlap, restore each at 512^2, merge with linear
edge-fade blending at 64-px overlap — except patches are restored as ONE
BATCH (sharded across chips) instead of the reference's serial Python loop.

Usage:
  python val_patches.py --config configs/val_smoke.yaml
"""

from __future__ import annotations

import argparse
import os
from functools import partial


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument(
        "--spotter-every", type=int, default=1,
        help="(tiled_ocr_loop) refresh the OCR prompt every k-th step; "
             "quality/throughput trade in docs/SERVING.md",
    )
    parser.add_argument(
        "--enc-topk", type=int, default=None,
        help="sparse spotter encoder top-K (0/None = exact), docs/SERVING.md",
    )
    parser.add_argument(
        "--dump-dir", default=None,
        help="write the benchmark-server interchange bundle there "
             "(text_results.json COCO + det.zip RRC, utils/submission.py) "
             "from the per-patch spotter decodes mapped into merged-image "
             "coordinates; requires val.tiled_ocr_loop",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tair_tpu.config import build_model, load_config
    from tair_tpu.models.tokenizer import tokenize
    from tair_tpu.ops.attention import enable_inference_kernels
    from tair_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    enable_inference_kernels()
    from tair_tpu.tiling import restore_tiled
    from tair_tpu.utils.logging import MetricLogger
    from tair_tpu.utils.metrics import psnr, ssim
    from val import list_images, load_image, save_image

    cfg = load_config(args.config)
    if args.enc_topk:
        cfg.testr_overrides = dict(
            cfg.testr_overrides or {}, enc_topk=args.enc_topk
        )
    vc = cfg.val
    steps = args.steps or vc.steps
    os.makedirs(vc.output_dir, exist_ok=True)
    logger = MetricLogger(vc.output_dir, "val_patches_metrics.jsonl")

    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    if args.ckpt:
        from tair_tpu.train.checkpoint import load_params

        params = load_params(args.ckpt, params)
        params = jax.device_put(params)  # host tree as jit arg re-uploads per call

    empty_tokens = jnp.asarray(tokenize([""]))

    # shard the patch batch over all chips (the reference restores patches
    # serially on one GPU, val_patches.py:316)
    n_dev = len(jax.devices())
    if n_dev > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tair_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(n_data=n_dev)
        data_sh = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        shard_kwargs = dict(
            in_shardings=(repl, data_sh, repl), out_shardings=data_sh
        )
    else:
        shard_kwargs = {}

    dump_spots = bool(args.dump_dir)
    if dump_spots and not vc.tiled_ocr_loop:
        raise SystemExit(
            "--dump-dir needs the spotter in the loop: set val.tiled_ocr_loop"
        )

    # params enter as a jit ARGUMENT (donated into neither side), not a
    # captured constant — closing over them would bake ~7GB of weights into
    # the executable as constants (slow compile, duplicated HBM)
    @partial(jax.jit, **shard_kwargs)
    def _restore_batch(params, lq_batch, rng):
        if vc.tiled_ocr_loop:
            # reference parity: full 50-step val_sample incl. spotter-driven
            # prompt recycling PER PATCH (val_patches.py:334-369), here as
            # the fused on-device loop over the whole patch batch
            restored, _, spots = model.restore_fused_feedback(
                params, lq_batch, rng, steps=steps,
                score_threshold=vc.score_threshold,
                spotter_every=args.spotter_every,
                return_spots=True,
            )
        else:
            toks = jnp.broadcast_to(empty_tokens, (lq_batch.shape[0], 77))
            restored, _, _ = model.restore(
                params, lq_batch, toks, rng, steps=steps
            )
            spots = None
        return (restored, spots) if dump_spots else restored

    def restore_batch(lq_batch, rng):
        return _restore_batch(params, lq_batch, rng)

    names = list_images(vc.lq_dir)
    all_preds = []
    for i, name in enumerate(names):
        lq = load_image(os.path.join(vc.lq_dir, name))
        from tair_tpu.tiling import split_grid

        n_h, n_w, _, _ = split_grid(
            lq.shape[0], lq.shape[1], vc.patch_size, vc.overlap
        )
        n_patches = n_h * n_w
        chunk = vc.chunk
        if n_dev > 1:
            # sharded batches must divide evenly across chips
            chunk = -(-(chunk or n_patches) // n_dev) * n_dev
        out = restore_tiled(
            restore_batch,
            jnp.asarray(lq),
            jax.random.PRNGKey(vc.seed + i),
            patch=vc.patch_size,
            overlap=vc.overlap,
            out_scale=vc.out_scale,
            chunk=chunk,
            return_aux=dump_spots,
        )
        if dump_spots:
            out, spots = out
            all_preds.append(_spots_to_image_preds(
                jax.device_get(spots), n_w, vc.patch_size, vc.overlap,
                vc.out_scale, np.asarray(out).shape[:2],
            ))
        out = np.asarray(out)
        stem = os.path.splitext(name)[0]
        save_image(os.path.join(vc.output_dir, f"restored_{stem}.png"), out)

        metrics = {"image": name, "out_hw": list(out.shape[:2])}
        if vc.gt_dir:
            gt = load_image(os.path.join(vc.gt_dir, name))
            gt = jax.image.resize(
                jnp.asarray(gt), out.shape, "cubic"
            )
            metrics["psnr"] = float(
                psnr(jnp.asarray(out)[None], gt[None])[0]
            )
            metrics["ssim"] = float(
                ssim(jnp.asarray(out)[None], gt[None])[0]
            )
        logger.log(i, metrics)

    if dump_spots:
        from tair_tpu.utils.submission import dump_submission

        paths = dump_submission(
            args.dump_dir, all_preds, list(range(1, len(all_preds) + 1)),
            confidence_threshold=vc.score_threshold,
        )
        print(f"submission bundle: {paths}")

    print(f"wrote results to {vc.output_dir}")


def _spots_to_image_preds(
    spots, n_w, patch, overlap, out_scale, canvas_hw, iou_dedup=0.5
):
    """Per-patch spotter decodes -> one deduplicated per-image prediction
    list in merged-canvas pixel coordinates.

    Each patch's polygons are emitted at the restored-patch frame
    (patch*out_scale square, pipeline.py restore_fused_feedback ->
    spotter_inference image_size); the patch at grid (r, c) starts at
    (r, c)*stride in LQ coords, i.e. *out_scale in canvas coords. Instances
    re-detected in overlapping patches are merged with a greedy
    score-ordered polygon-IoU suppression (same IoU primitive as the
    ICDAR protocol, utils/text_eval.polygon_iou)."""
    import numpy as np

    from tair_tpu.spotter.charset import decode_text
    from tair_tpu.utils.text_eval import SpottingInstance, polygon_iou

    stride = (patch - overlap) * out_scale
    cand = []
    n_patches = spots["scores"].shape[0]
    for p in range(n_patches):
        r, c = p // n_w, p % n_w
        off = np.array([c * stride, r * stride], np.float32)  # (x, y)
        keep = np.asarray(spots["keep"][p])
        for j in np.nonzero(keep)[0]:
            poly = np.asarray(spots["polygons"][p][j], np.float32) + off
            poly[:, 0] = poly[:, 0].clip(0, canvas_hw[1] - 1)
            poly[:, 1] = poly[:, 1].clip(0, canvas_hw[0] - 1)
            cand.append(SpottingInstance(
                poly, decode_text(np.asarray(spots["recs"][p][j])),
                float(spots["scores"][p][j]),
            ))
    cand.sort(key=lambda s: -(s.score or 0.0))
    kept = []
    for s in cand:
        if all(polygon_iou(s.polygon, k.polygon) <= iou_dedup for k in kept):
            kept.append(s)
    return kept


if __name__ == "__main__":
    main()

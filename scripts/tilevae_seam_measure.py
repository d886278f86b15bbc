"""Re-anchor the tiled-VAE seam measurement on REAL (in-env pretrained)
VAE weights (VERDICT r3 weak #6 / next-round #7).

The round-3 numbers (blend-only vs cross-tile GN, docs/PERFORMANCE.md
"Tiled VAE seams") were measured on a random-init tiny VAE; per-tile
statistics behavior depends on learned feature distributions, so this
repeats the exact protocol on the default-size VAE with the weights from
scripts/pretrain_demo.py (runs/pretrain/frozen.npz).

  scripts/cpu_run.sh python scripts/tilevae_seam_measure.py \
      --pretrain runs/pretrain/frozen.npz [--size 1024]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrain", default="runs/pretrain/frozen.npz")
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--tile-size", type=int, default=512)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tair_tpu.pipeline import build_default_model
    from tair_tpu.train.checkpoint import load_params
    from tair_tpu.utils.tilevae import tiled_vae_decode, tiled_vae_encode

    model = build_default_model(dtype=jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    if os.path.exists(args.pretrain):
        params = load_params(args.pretrain, params)
    else:
        print(f"# WARNING: {args.pretrain} missing - random-init smoke run",
              file=sys.stderr)

    h = w = args.size
    yy, xx = np.mgrid[0:h, 0:w] / h
    rng = np.random.RandomState(0)
    # same non-stationary content class as tests/test_tilevae_seam.py
    img = (
        0.8 * xx
        + 0.15 * np.sin(37 * yy * 6.28) * np.sin(29 * xx * 6.28)
        + 0.05 * rng.rand(h, w)
    )
    img = np.stack([img, 1 - img, 0.5 + 0.4 * (yy - 0.5)], -1)
    x = jnp.asarray(np.clip(img, 0, 1)[None].astype(np.float32)) * 2 - 1

    z_full = model.cldm.vae_encode(params, x, sample=False)
    z_range = float(np.ptp(np.asarray(z_full)))

    def err(a, b):
        d = np.abs(np.asarray(a - b, np.float32))[0]
        col = d.mean(axis=(0, 2))
        return dict(
            mean=round(float(d.mean()), 4),
            col_max=round(float(col.max()), 4),
            col_median=round(float(np.median(col)), 4),
        )

    res = {
        "size": args.size, "tile_size": args.tile_size,
        "weights": args.pretrain, "z_range": round(z_range, 3),
    }
    for ct in (False, True):
        ze = tiled_vae_encode(
            model.cldm, params, x, tile_size=args.tile_size, cross_tile_gn=ct
        )
        res[f"encode_cross_tile_{ct}"] = err(ze, z_full)
    y_full = model.cldm.vae_decode(params, z_full)
    for ct in (False, True):
        yd = tiled_vae_decode(
            model.cldm, params, z_full, cross_tile_gn=ct
        )
        res[f"decode_cross_tile_{ct}"] = err(yd, y_full)

    print(json.dumps(res, indent=1))
    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()

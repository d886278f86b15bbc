"""Build a from-scratch-trainable warm-start npz for the quality demo.

The reference's stage masks freeze every UNet conv (only attention trains,
initialize.py:171-216) because the UNet arrives PRETRAINED. Training from
scratch in this environment hits a degenerate corner: the UNet's out_conv
kernels are zero-initialized for LDM parity (models/unet.py:85,320, like
ldm's zero_module) — frozen at zero, the model output is identically zero
and the diffusion loss sits at E[v^2] ~= 1.0 forever (measured: flat
0.996 over 3.8k steps). The fix that keeps the parity masks AND the proven
HBM budget untouched: re-randomize the FROZEN zero-init UNet convs (they
would have carried pretrained values) in the warm-start export. The
trainable ControlNet zero-convs stay zero — that is their correct training
init per ControlNet.

The export is a PARTIAL tree — train.py's init_params load is non-strict
(train/checkpoint.py load_params), so it only needs the leaves that differ
from jitted init: the pretrained swinir/vae (scripts/pretrain_demo.py) and
the re-randomized conv kernels. Shapes come from jax.eval_shape: no init
program runs, no device is touched (the previous full-init version cost a
>10-min single-core CPU compile while the chip sat idle).

  python scripts/make_warmstart.py --config configs/train_quality_demo.yaml \
      --pretrain runs/pretrain/frozen.npz --out runs/pretrain/warmstart.npz
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--pretrain", default="runs/pretrain/frozen.npz")
    ap.add_argument("--out", default="runs/pretrain/warmstart.npz")
    ap.add_argument("--scale", type=float, default=0.2,
                    help="xavier multiplier for the re-randomized convs")
    args = ap.parse_args()

    import jax
    import numpy as np

    from tair_tpu.config import build_model, load_config

    cfg = load_config(args.config)
    model = build_model(cfg)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(cfg.train.seed))

    out = {}
    data = np.load(args.pretrain)
    for key in data.files:
        leaf = data[key]
        # ADVICE r4: a bfloat16-saved pretrain leaf lands in npz as void16
        # and would propagate uncast (train.py's load_params dtype-cast
        # skips void dtypes); insist on a real float here.
        assert np.issubdtype(leaf.dtype, np.floating), (
            f"{key}: non-float pretrain leaf dtype {leaf.dtype}; re-save the "
            "pretrain npz as float32/float16"
        )
        out[key] = leaf
    print(f"carried {len(out)} pretrained leaves from {args.pretrain}")

    # every unet out_conv kernel is zero_init structurally
    # (models/unet.py:85,320) — select by path, values never materialize
    rng = np.random.RandomState(7)
    fixed = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(shapes)[0]:
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        if (key.startswith("unet/") and "out_conv" in key
                and key.endswith("kernel")):
            fan_in = int(np.prod(leaf.shape[:-1]))
            std = args.scale * np.sqrt(2.0 / max(1, fan_in))
            out[key] = rng.normal(0.0, std, leaf.shape).astype(np.float32)
            fixed += 1
    assert fixed > 0, "no out_conv kernels found under unet/"

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez(args.out, **out)
    print(f"re-randomized {fixed} frozen zero-init unet convs -> {args.out}")


if __name__ == "__main__":
    main()

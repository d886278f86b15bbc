"""Build a from-scratch-trainable warm-start npz for the quality demo.

The reference's stage masks freeze every UNet conv (only attention trains,
initialize.py:171-216) because the UNet arrives PRETRAINED. Training from
scratch in this environment hits a degenerate corner: the UNet's final
out_conv is zero-initialized for LDM parity (models/unet.py:320, like
ldm's zero_module) — frozen at zero, the model output is identically zero
and the diffusion loss sits at E[v^2] ~= 1.0 forever (measured: flat
0.996 over 3.8k steps). The fix that keeps the parity masks AND the proven
HBM budget untouched: re-randomize the FROZEN zero-init UNet convs (they
would have carried pretrained values) in the warm-start export. The
trainable ControlNet zero-convs stay zero — that is their correct training
init per ControlNet.

Inputs: the pretrained swinir+vae npz (scripts/pretrain_demo.py) and
optionally an orbax TrainState checkpoint whose params to carry over
(salvages spotter/attention progress from a previous run).

  python scripts/make_warmstart.py --config configs/train_quality_demo.yaml \
      --pretrain runs/pretrain/frozen.npz \
      --from-ckpt runs/quality_demo/checkpoints/step_00002000 \
      --out runs/pretrain/warmstart.npz
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
    ap.add_argument("--from-ckpt", default=None)
    ap.add_argument("--out", default="runs/pretrain/warmstart.npz")
    ap.add_argument("--scale", type=float, default=0.2,
                    help="xavier multiplier for the re-randomized convs")
    args = ap.parse_args()

    import jax
    import numpy as np

    from tair_tpu.config import build_model, load_config
    from tair_tpu.train.checkpoint import load_params, save_params

    cfg = load_config(args.config)
    model = build_model(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(cfg.train.seed))
    if args.from_ckpt:
        from tair_tpu.train.checkpoint import restore_checkpoint
        from tair_tpu.train.step import create_train_state

        state, _ = create_train_state(
            params, cfg.train.stage, cfg.train.learning_rate,
            grad_accum=cfg.train.grad_accum,
        )
        state = restore_checkpoint(args.from_ckpt, state)
        params = jax.device_get(state.params)
        print(f"carried params from {args.from_ckpt} (step {int(state.step)})")
    params = load_params(args.pretrain, params)

    rng = np.random.RandomState(7)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    fixed = 0
    out = {}
    for path, leaf in flat:
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        arr = np.asarray(leaf)
        if (key.startswith("unet/") and "out_conv" in key
                and key.endswith("kernel") and not arr.any()):
            fan_in = int(np.prod(arr.shape[:-1]))
            std = args.scale * np.sqrt(2.0 / max(1, fan_in))
            arr = rng.normal(0.0, std, arr.shape).astype(arr.dtype)
            fixed += 1
        out[key] = arr
    assert fixed > 0, "no zero out_conv kernels found under unet/"
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez(args.out, **out)
    print(f"re-randomized {fixed} frozen zero-init unet convs -> {args.out}")


if __name__ == "__main__":
    main()

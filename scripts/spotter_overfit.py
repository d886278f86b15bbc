"""Single-batch overfit check for the spotter's recognition pathway.

Decisive bug-vs-data diagnostic for the degenerate recognizer state
(docs/measurements/spotter_diag_step15000.json: every top prediction is a
repeated marginal letter). Trains the REAL stage-2 step function — same
make_train_step, same param mask, same loss — on ONE frozen batch at a
fixed low timestep for N steps:

  - loss_ocr_texts -> ~0 and decoded predictions == GT words
        => the pathway (features -> factorized text decoder -> CE) carries
           glyph-discriminative gradient; the plateau is a DATA/curriculum
           problem (uniform-t noise), fixed by TrainConfig.timestep_max.
  - loss_ocr_texts plateaus even here
        => an architectural bug (collapsed char cross-attn etc.).

Writes docs/measurements/spotter_overfit.json.

Usage:
  python scripts/spotter_overfit.py --config configs/train_spotter_demo.yaml \
      --init-params runs/spotter_demo/params_step_00015000.npz --steps 300
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--init-params", default=None)
    parser.add_argument("--steps", type=int, default=300)
    # default matches train_spotter_demo.yaml's curriculum bound so the
    # jitted step program (t_hi is a baked constant) is shared with the
    # chain's — the overfit check then doubles as the chain's prewarm
    parser.add_argument("--timestep-max", type=int, default=250)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--out", default="docs/measurements/spotter_overfit.json")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tair_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from tair_tpu.config import build_dataset, build_model, load_config
    from tair_tpu.data.batch_transform import degrade_batch
    from tair_tpu.data.satext import collate
    from tair_tpu.diffusion import Diffusion
    from tair_tpu.parallel.mesh import create_mesh, replicate
    from tair_tpu.spotter.charset import decode_text
    from tair_tpu.spotter.losses import CriterionConfig
    from tair_tpu.spotter.testr import spotter_inference
    from tair_tpu.train.checkpoint import load_params
    from tair_tpu.train.step import create_train_state, make_train_step

    cfg = load_config(args.config)
    model = build_model(cfg)
    diffusion = Diffusion(schedule=model.schedule, parameterization="v")
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    if args.init_params:
        params = load_params(args.init_params, params)
        print(f"init from {args.init_params}")

    mesh = create_mesh(n_data=1)
    state, tx = create_train_state(params, "stage2", args.lr)
    del params
    spotter_fn = model.spotter_loss_fn(criterion_cfg=CriterionConfig())
    step_fn = make_train_step(
        model, diffusion, tx, mesh=mesh, spotter_loss_fn=spotter_fn,
        ocr_loss_weight=cfg.train.ocr_loss_weight,
        timestep_max=args.timestep_max,
    )

    # one frozen batch
    ds = build_dataset(cfg, "TRAIN")
    raw = collate([ds[0]], max_inst=cfg.dataset.max_instances)
    gt, lq = jax.jit(
        lambda r, hq, k1, k2, sk: degrade_batch(r, hq, k1, k2, sk, cfg.degradation)
    )(
        jax.random.PRNGKey(7), jnp.asarray(raw["hq"]),
        jnp.asarray(raw["kernel1"]), jnp.asarray(raw["kernel2"]),
        jnp.asarray(raw["sinc_kernel"]),
    )
    batch = {
        "gt": gt, "lq": lq, "tokens": jnp.asarray(raw["tokens"]),
        "texts": jnp.asarray(raw["texts"]),
        "boxes": jnp.asarray(raw["boxes"]),
        "ctrl_points": jnp.asarray(raw["ctrl_points"]),
        "inst_mask": jnp.asarray(raw["inst_mask"]),
    }
    gt_words = raw["raw_texts"][0]
    print(f"GT words: {gt_words}")

    curve = []
    with mesh:
        state = replicate(mesh, state)
        rng = replicate(mesh, jax.random.PRNGKey(3))
        for i in range(args.steps):
            state, aux = step_fn(state, batch, rng)
            if i % 25 == 0 or i == args.steps - 1:
                a = {k: float(jax.device_get(v)) for k, v in aux.items()}
                row = {
                    "step": i,
                    "loss_texts": round(a.get("loss_ocr_texts", -1.0), 4),
                    "loss_ce": round(a.get("loss_ocr_ce", -1.0), 4),
                    "loss_ocr": round(a.get("loss_ocr", -1.0), 4),
                }
                curve.append(row)
                print(row, flush=True)

        # decode predictions on the SAME batch at a matching low timestep
        @jax.jit
        def _spot(params, batch, rng):
            k_vae, k_noise = jax.random.split(rng)
            clean = model.clean(params, batch["lq"])
            z_0 = model.cldm.vae_encode(params, batch["gt"], rng=k_vae, sample=True)
            cond = dict(
                c_txt=model.cldm.clip_encode_tokens(params, batch["tokens"]),
                c_img=model.cldm.vae_encode(params, clean * 2 - 1, sample=False),
            )
            t = jnp.full((z_0.shape[0],), args.timestep_max // 2, jnp.int32)
            z_t = diffusion.q_sample(z_0, t, jax.random.normal(k_noise, z_0.shape))
            _, feats = model.cldm.apply(params, z_t, t, cond)
            return spotter_inference(
                model.spotter_apply(params, feats), 0.0,
                image_size=cfg.dataset.out_size,
            )

        dec = jax.device_get(_spot(state.params, batch, jax.random.PRNGKey(11)))

    s = dec["scores"][0]
    top = np.argsort(s)[::-1][: max(3, len(gt_words))]
    preds = [
        {"text": decode_text(dec["recs"][0][j]), "score": round(float(s[j]), 3)}
        for j in top
    ]
    report = {
        "init_params": args.init_params,
        "timestep_max": args.timestep_max,
        "steps": args.steps,
        "gt_words": gt_words,
        "curve": curve,
        "top_preds_after": preds,
        "overfit_ok": bool(
            curve[-1]["loss_texts"] >= 0
            and curve[-1]["loss_texts"] < 0.25 * max(curve[0]["loss_texts"], 1e-6)
        ),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()

"""Measure production train-step time on the chip (stage1 and stage3)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tair_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from tair_tpu.data.satext import SyntheticSAText, collate
from tair_tpu.diffusion import Diffusion
from tair_tpu.pipeline import build_default_model
from tair_tpu.spotter.losses import CriterionConfig
from tair_tpu.train.step import create_train_state, make_train_step


def main(stage="stage1", batch=2, size=512, matcher="greedy"):
    model = build_default_model(dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    diffusion = Diffusion(schedule=model.schedule, parameterization="v")
    state, tx = create_train_state(params, stage, 1e-4)
    del params

    spotter_fn = None
    w = 0.0
    if stage in ("stage2", "stage3"):
        w = 0.01
        base_fn = model.spotter_loss_fn()
        if matcher == "greedy":
            from functools import partial

            from tair_tpu.spotter.losses import set_criterion

            def spotter_fn(params, feats, batch):
                out = model.spotter_apply(params, feats)
                targets = {k: batch[k] for k in
                           ("inst_mask", "boxes", "ctrl_points", "texts")}
                losses = set_criterion(
                    out, targets, CriterionConfig(matcher="greedy")
                )
                return losses["loss_total"], {}
        else:
            spotter_fn = base_fn

    step = make_train_step(
        model, diffusion, tx, spotter_loss_fn=spotter_fn,
        ocr_loss_weight=w, donate=False,
    )

    ds = SyntheticSAText(size=size, length=batch)
    raw = collate([ds[i] for i in range(batch)], max_inst=32)
    b = {
        "gt": jnp.asarray(raw["hq"]) * 2 - 1,
        "lq": jnp.asarray(raw["hq"]),
        "tokens": jnp.asarray(raw["tokens"]),
        "inst_mask": jnp.asarray(raw["inst_mask"]),
        "boxes": jnp.asarray(raw["boxes"]),
        "ctrl_points": jnp.asarray(raw["ctrl_points"]),
        "texts": jnp.asarray(raw["texts"]),
    }
    rng = jax.random.PRNGKey(1)

    state, aux = step(state, b, rng)
    print(f"{stage} compile done, loss={float(aux['loss_total']):.4f}", flush=True)
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        state, aux = step(state, b, rng)
        float(aux["loss_total"])
    dt = (time.perf_counter() - t0) / n
    print(
        f"{stage} batch={batch} {size}px: {dt*1000:.0f} ms/step "
        f"-> {batch/dt:.2f} img/s/chip",
        flush=True,
    )


if __name__ == "__main__":
    main("stage1", batch=2)
    main("stage3", batch=2)

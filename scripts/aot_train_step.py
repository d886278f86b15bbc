"""AOT-prewarm the stage-3 train-step executable into the persistent
compile cache WITHOUT touching the device.

The full train step is the longest cold compile of the round (the relayed
compile service charges minutes); running it while the chip is busy with
the pretrain phases (scripts/pretrain_demo.py) means train.py starts warm.
Mirrors train.py:55-176 shape-for-shape: same config, same mesh (data:1),
same collate shapes, same replicated shardings, donated state.

  python scripts/aot_train_step.py --config configs/train_quality_demo.yaml
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tair_tpu.config import build_dataset, build_model, load_config
    from tair_tpu.data.batch_transform import degrade_batch
    from tair_tpu.data.satext import collate
    from tair_tpu.diffusion import Diffusion
    from tair_tpu.parallel.mesh import create_mesh
    from tair_tpu.spotter.losses import CriterionConfig
    from tair_tpu.train.step import create_train_state, make_train_step
    from tair_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    cfg = load_config(args.config)
    tc = cfg.train
    n_data = tc.n_data_devices or len(jax.devices())
    mesh = create_mesh(n_data=n_data)

    model = build_model(cfg)
    diffusion = Diffusion(schedule=model.schedule, parameterization="v")

    pshape = jax.eval_shape(model.init, jax.random.PRNGKey(tc.seed))
    state_shape = jax.eval_shape(
        lambda p: create_train_state(
            p, tc.stage, tc.learning_rate, grad_accum=tc.grad_accum
        )[0],
        pshape,
    )
    # the tx captured inside step_fn must be the REAL transformation (it is
    # closed over, not traced), built from shapes only
    from tair_tpu.train.step import make_optimizer

    tx = make_optimizer(pshape, tc.stage, tc.learning_rate,
                        grad_accum=tc.grad_accum)

    spotter_fn = (
        model.spotter_loss_fn(criterion_cfg=CriterionConfig(matcher=tc.matcher))
        if tc.stage in ("stage2", "stage3") else None
    )
    step_fn = make_train_step(
        model, diffusion, tx, mesh=mesh,
        spotter_loss_fn=spotter_fn,
        ocr_loss_weight=tc.ocr_loss_weight,
        state_sharding=None,
    )

    # real collate for exact batch shapes/dtypes (host numpy only)
    ds = build_dataset(cfg, "TRAIN")
    raw = collate(
        [ds[i] for i in range(tc.batch_size * n_data)],
        max_inst=cfg.dataset.max_instances,
    )

    # ADVICE r4: attach the NamedShardings train.py's real inputs carry
    # (shard_batch -> data axis, replicate -> P()); plain ShapeDtypeStructs
    # happen to cache-hit on a 1-device mesh but would miss for n_data > 1.
    from tair_tpu.parallel.mesh import data_sharding, replicated

    d_shard = data_sharding(mesh)
    r_shard = replicated(mesh)

    def sd(x, sharding=None):
        a = np.asarray(x)
        return jax.ShapeDtypeStruct(a.shape, a.dtype,
                                    sharding=sharding or d_shard)

    key_sd = sd(jax.random.PRNGKey(0), sharding=r_shard)
    size = cfg.dataset.out_size
    img_sd = jax.ShapeDtypeStruct(
        (tc.batch_size * n_data, size, size, 3), jnp.float32,
        sharding=d_shard,
    )
    batch_sd = {
        "gt": img_sd, "lq": img_sd,
        "tokens": sd(raw["tokens"]),
        "inst_mask": sd(raw["inst_mask"]),
        "boxes": sd(raw["boxes"]),
        "ctrl_points": sd(raw["ctrl_points"]),
        "texts": sd(raw["texts"]),
    }
    state_shape = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=r_shard),
        state_shape,
    )

    with mesh:
        t0 = time.time()
        degrade = jax.jit(
            lambda r, hq, k1, k2, sk: degrade_batch(
                r, hq, k1, k2, sk, cfg.degradation
            )
        )
        degrade.lower(
            key_sd, sd(raw["hq"]), sd(raw["kernel1"]), sd(raw["kernel2"]),
            sd(raw["sinc_kernel"]),
        ).compile()
        print(f"# aot: train degrade cached ({time.time() - t0:.0f}s)",
              flush=True)
        t0 = time.time()
        step_fn.lower(state_shape, batch_sd, key_sd).compile()
        print(f"# aot: train step cached ({time.time() - t0:.0f}s)",
              flush=True)
        # the jitted init program train.py runs first (train.py:72)
        t0 = time.time()
        jax.jit(model.init).lower(key_sd).compile()
        print(f"# aot: model.init cached ({time.time() - t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()

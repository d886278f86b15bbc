"""Matcher A/B: step time of the stage-3 train step on the 8-device CPU mesh
with (a) exact on-device JV Hungarian (default), (b) host-callback Hungarian
(pure_callback -> scipy/native C++), (c) greedy on-device approximation.

Run with JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8.
Results go to docs/PERFORMANCE.md (VERDICT round 1, next #3)."""

import time

import jax
import jax.numpy as jnp

from tair_tpu.data.satext import SyntheticSAText, collate
from tair_tpu.diffusion import Diffusion
from tair_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from tair_tpu.pipeline import build_dryrun_model
from tair_tpu.spotter.losses import CriterionConfig
from tair_tpu.train.step import create_train_state, make_train_step


def run(matcher: str, mesh, model, diffusion, batch, n_steps=20):
    params = model.init(jax.random.PRNGKey(0))
    with mesh:
        state, tx = create_train_state(params, "stage3", 1e-4)
    step = make_train_step(
        model, diffusion, tx, mesh=mesh,
        spotter_loss_fn=model.spotter_loss_fn(
            criterion_cfg=CriterionConfig(matcher=matcher)
        ),
        ocr_loss_weight=0.01, donate=False,
    )
    rng = jax.random.PRNGKey(42)
    with mesh:
        state = replicate(mesh, state)
        sbatch = shard_batch(mesh, batch)
        t0 = time.time()
        state, aux = step(state, sbatch, rng)
        jax.block_until_ready(aux)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(n_steps):
            state, aux = step(state, sbatch, rng)
        jax.block_until_ready(aux)
        step_ms = (time.time() - t0) / n_steps * 1e3
    print(f"{matcher:15s} compile={compile_s:6.1f}s step={step_ms:7.1f}ms "
          f"loss={float(aux['loss_total']):.4f}")


def main():
    mesh = create_mesh(n_data=8, n_model=1)
    model = build_dryrun_model()
    diffusion = Diffusion(schedule=model.schedule, parameterization="v")
    bsz = 8
    ds = SyntheticSAText(size=64, length=bsz)
    raw = collate([ds[i] for i in range(bsz)], max_inst=4)
    batch = {
        "gt": jnp.asarray(raw["hq"]) * 2 - 1,
        "lq": jnp.asarray(raw["hq"]),
        "tokens": jnp.asarray(raw["tokens"]),
        "inst_mask": jnp.asarray(raw["inst_mask"]),
        "boxes": jnp.asarray(raw["boxes"]),
        "ctrl_points": jnp.asarray(raw["ctrl_points"]),
        "texts": jnp.asarray(raw["texts"]),
    }
    for matcher in ("hungarian", "hungarian_host", "greedy"):
        run(matcher, mesh, model, diffusion, batch)


if __name__ == "__main__":
    main()

"""Where does the dryrun's XLA compile time go? Times jit-compiles of the
stage-3 step's pieces on the 8-CPU mesh (sanitized env assumed)."""

import time

import jax
import jax.numpy as jnp

from tair_tpu.data.satext import SyntheticSAText, collate
from tair_tpu.diffusion import Diffusion
from tair_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from tair_tpu.parallel.tp import shard_params_tp
from tair_tpu.pipeline import build_tiny_model
from tair_tpu.train.step import create_train_state, diffusion_loss_fn, make_train_step


def timed(name, fn, *args):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    print(f"{name}: {time.time() - t0:.1f}s")
    return out


def main():
    n = 8
    mesh = create_mesh(n_data=4, n_model=2, devices=jax.devices()[:n])
    model = build_tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    diffusion = Diffusion(schedule=model.schedule, parameterization="v")

    bsz = n
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
    rng = jax.random.PRNGKey(42)

    # 1. diffusion-only loss grad (no spotter), single device
    def diff_only(p, b, r):
        return jax.grad(
            lambda pp: diffusion_loss_fn(model, diffusion, pp, b, r)[0]
        )(p)

    timed("grad(diffusion_loss) single-dev", jax.jit(diff_only).lower(params, batch, rng).compile)

    # 2. spotter loss grad only, single device
    sl = model.spotter_loss_fn()
    feats_shape = jax.eval_shape(
        lambda p, b, r: diffusion_loss_fn(model, diffusion, p, b, r)[1], params, batch, rng
    )

    def spot_only(p, b, r):
        clean = model.clean(p, b["lq"])
        z = model.cldm.vae_encode(p, b["gt"], rng=r, sample=True)
        cond = dict(
            c_txt=model.cldm.clip_encode_tokens(p, b["tokens"]),
            c_img=model.cldm.vae_encode(p, clean * 2 - 1, sample=False),
        )
        t = jnp.zeros((b["gt"].shape[0],), jnp.int32)
        eps, feats = model.cldm.apply(p, z, t, cond, extract_features=True)
        return jax.grad(lambda pp: sl(pp, feats, b)[0])(p)

    timed("grad(spotter_loss) single-dev", jax.jit(spot_only).lower(params, batch, rng).compile)

    # 3. full step, single device (no mesh)
    state, tx = create_train_state(params, "stage3", 1e-4)
    step1 = make_train_step(
        model, diffusion, tx, mesh=None,
        spotter_loss_fn=sl, ocr_loss_weight=0.01, donate=False,
    )
    timed("full step single-dev", step1.lower(state, batch, rng).compile)

    # 4. full step dp-only 8-dev
    mesh_dp = create_mesh(n_data=8, n_model=1, devices=jax.devices()[:n])
    step_dp = make_train_step(
        model, diffusion, tx, mesh=mesh_dp,
        spotter_loss_fn=sl, ocr_loss_weight=0.01, donate=False,
    )
    with mesh_dp:
        state_r = replicate(mesh_dp, state)
        batch_s = shard_batch(mesh_dp, batch)
        timed("full step dp8", step_dp.lower(state_r, batch_s, rng).compile)

    # 5. full step dp4 x tp2
    with mesh:
        params_tp = shard_params_tp(mesh, params)
        state_tp, tx2 = create_train_state(params_tp, "stage3", 1e-4)
    step_tp = make_train_step(
        model, diffusion, tx2, mesh=mesh,
        spotter_loss_fn=sl, ocr_loss_weight=0.01, donate=False,
        infer_sharding=True,
    )
    with mesh:
        batch_s = shard_batch(mesh, batch)
        rng_r = replicate(mesh, rng)
        timed("full step dp4xtp2", step_tp.lower(state_tp, batch_s, rng_r).compile)


if __name__ == "__main__":
    main()

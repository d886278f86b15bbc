"""In-env pretraining of the always-frozen modules (SwinIR cleaner + VAE)
for the serving-knob quality measurement (SERVING.md).

The reference's training protocol ASSUMES these arrive pretrained — its
ControlLDM loads SD-2.1 VAE and DiffBIR SwinIR checkpoints and freezes them
(/root/reference/terediff/model/cldm.py:56-62, initialize.py:171-216). This
environment has no external weights, so stage-3 training on a random frozen
VAE would decode garbage no matter how well the diffusion model learns. This
script creates the "pretrained" modules from the synthetic corpus instead:

  - SwinIR: supervised LQ->HQ on the real on-device RealESRGAN degradation
    pipeline (the exact task DiffBIR trained it for), L1 loss;
  - VAE: reconstruction (L1 + small KL), so encode/decode is a faithful
    round-trip on this image distribution.

Exports a single .npz usable as `train.init_params` (train/checkpoint.py
load_params, non-strict). Run on the chip:

  python scripts/pretrain_demo.py --out runs/pretrain/frozen.npz \
      --swinir-steps 3000 --vae-steps 3000 --batch 4
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/pretrain/frozen.npz")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--swinir-steps", type=int, default=3000)
    ap.add_argument("--vae-steps", type=int, default=3000)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--preset", default="default")
    # one phase per process + per-phase saves: a phase crash (the VAE bwd
    # RESOURCE_EXHAUSTEDs at batch 4 / 256^2 on the 16G chip; use --batch 2
    # for the vae phase) must not lose the other phase's finished weights
    ap.add_argument("--phase", default="both",
                    choices=["both", "swinir", "vae"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from tair_tpu.config import DegradationConfig
    from tair_tpu.data.batch_transform import degrade_batch
    from tair_tpu.data.satext import SyntheticSAText, collate
    from tair_tpu.models.vae import AutoencoderKL
    from tair_tpu.pipeline import build_default_model, build_tiny_model
    from tair_tpu.train.checkpoint import save_params
    from tair_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    model = (
        build_default_model(dtype=jnp.bfloat16)
        if args.preset == "default"
        else build_tiny_model()
    )
    # ONE jitted init program: unjitted init traces ~600 tiny initializers,
    # each a separate compile/load round-trip through the remote-chip relay
    # (minutes of pure latency; same lesson as bench.py init_all)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    print("params initialized", flush=True)
    deg_cfg = DegradationConfig()

    ds = SyntheticSAText(size=args.size, length=4096, seed=0)

    def batch_at(step):
        items = [ds[(step * args.batch + j) % len(ds)] for j in range(args.batch)]
        return collate(items)

    degrade = jax.jit(
        lambda r, hq, k1, k2, sk: degrade_batch(r, hq, k1, k2, sk, deg_cfg)
    )

    # merge into an existing export so single-phase runs compose
    out_tree = {"swinir": params["swinir"], "vae": params["vae"]}
    if os.path.exists(args.out):
        from tair_tpu.train.checkpoint import load_params

        out_tree = load_params(args.out, out_tree)
        print(f"merging into existing {args.out}")

    def save():
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        save_params(args.out, out_tree)
        print(f"saved pretrained modules to {args.out}", flush=True)

    tx = optax.adam(args.lr)

    # ---- SwinIR: cleaner pretraining on real degradation pairs ----------
    if args.phase in ("both", "swinir") and args.swinir_steps:
        sw_params = params["swinir"]

        def swinir_loss(p, lq, gt01):
            out = model.swinir.apply({"params": p}, lq)
            return jnp.abs(out.astype(jnp.float32) - gt01).mean()

        @jax.jit
        def swinir_step(p, opt, lq, gt01):
            loss, g = jax.value_and_grad(swinir_loss)(p, lq, gt01)
            updates, opt = tx.update(g, opt, p)
            return optax.apply_updates(p, updates), opt, loss

        opt = tx.init(sw_params)
        t0 = time.time()
        print("swinir phase: compiling degrade+step...", flush=True)
        for step in range(args.swinir_steps):
            raw = batch_at(step)
            gt, lq = degrade(
                jax.random.fold_in(jax.random.PRNGKey(1), step),
                jnp.asarray(raw["hq"]), jnp.asarray(raw["kernel1"]),
                jnp.asarray(raw["kernel2"]), jnp.asarray(raw["sinc_kernel"]),
            )
            sw_params, opt, loss = swinir_step(
                sw_params, opt, lq, (gt + 1) / 2
            )
            if (step + 1) % args.log_every == 0:
                print(
                    f"[swinir {step + 1}/{args.swinir_steps}] "
                    f"l1={float(loss):.4f} ({time.time() - t0:.1f}s)",
                    flush=True,
                )
        out_tree["swinir"] = jax.device_get(sw_params)
        save()

    # ---- VAE: reconstruction + tiny KL ---------------------------------
    if args.phase == "swinir" or not args.vae_steps:
        return
    vae_params = params["vae"]

    # diffusion downstream needs ~unit-variance SCALED latents; the scale
    # factor is fixed (cldm.py:34, 0.18215 like SD), so pull the raw latent
    # distribution toward mean 0 / std 1/0.18215 — the same condition SD's
    # post-hoc scale factor was chosen to satisfy
    z_target_std = 1.0 / model.cldm.scale_factor

    def vae_loss(p, x, rng):
        mean, logvar = model.cldm.vae.apply(
            {"params": p}, x, method=AutoencoderKL.encode_moments
        )
        mean32 = mean.astype(jnp.float32)
        logvar32 = jnp.clip(logvar.astype(jnp.float32), -30.0, 20.0)
        z = mean32 + jnp.exp(0.5 * logvar32) * jax.random.normal(
            rng, mean32.shape, jnp.float32
        )
        recon = model.cldm.vae.apply(
            {"params": p}, z.astype(x.dtype), method=AutoencoderKL.decode
        )
        l1 = jnp.abs(recon.astype(jnp.float32) - x).mean()
        gmean = mean32.mean()
        gstd = jnp.sqrt(((mean32 - gmean) ** 2).mean() + 1e-8)
        reg = gmean**2 + (jnp.log(gstd) - jnp.log(z_target_std)) ** 2
        return l1 + 0.05 * reg, (l1, gstd)

    @jax.jit
    def vae_step(p, opt, x, rng):
        (loss, (l1, gstd)), g = jax.value_and_grad(vae_loss, has_aux=True)(
            p, x, rng
        )
        updates, opt = tx.update(g, opt, p)
        return optax.apply_updates(p, updates), opt, l1, gstd

    opt = tx.init(vae_params)
    t0 = time.time()
    print("vae phase: compiling step...", flush=True)
    for step in range(args.vae_steps):
        raw = batch_at(step + 100_000)
        x = jnp.asarray(raw["hq"]) * 2.0 - 1.0  # [-1,1], VAE's native range
        vae_params, opt, l1, gstd = vae_step(
            vae_params, opt, x, jax.random.fold_in(jax.random.PRNGKey(2), step)
        )
        if (step + 1) % args.log_every == 0:
            print(
                f"[vae {step + 1}/{args.vae_steps}] l1={float(l1):.4f} "
                f"z_std={float(gstd):.2f}/{z_target_std:.2f} "
                f"({time.time() - t0:.1f}s)",
                flush=True,
            )

    out_tree["vae"] = jax.device_get(vae_params)
    save()


if __name__ == "__main__":
    main()

"""TAIR-TPU training driver (3-stage TeReDiff training).

Counterpart of /root/reference/train.py:24-457: per-step on-device RealESRGAN
degradation synthesis, v-parameterization diffusion loss (+ weighted OCR loss
in stage2/3), periodic in-loop validation sampling with PSNR/SSIM, and
checkpointing — as jitted SPMD programs over a data-parallel mesh.

Usage:
  python train.py --config configs/train_stage1.yaml
  python train.py --config configs/train_smoke.yaml   # tiny CI run
"""

from __future__ import annotations

import argparse
import os
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--max-steps", type=int, default=None,
                        help="override train.train_steps (smoke runs)")
    parser.add_argument("--init-params", default=None,
                        help="override train.init_params (warm-resume from a "
                             "later weight export without editing the config)")
    parser.add_argument("--start-step", type=int, default=None,
                        help="set the starting global step (segmented "
                             "training: exports/logs keep monotonic step "
                             "numbers across warm-resume segments)")
    args = parser.parse_args()

    import jax

    from tair_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    # numerical tripwire (counterpart of the reference's NaN checks):
    # DEBUG_NANS=1 makes every jitted op raise on NaN production.
    if os.environ.get("DEBUG_NANS") == "1":
        jax.config.update("jax_debug_nans", True)

    import jax.numpy as jnp
    import numpy as np

    from tair_tpu.config import build_dataset, build_model, load_config
    from tair_tpu.data.batch_transform import degrade_batch
    from tair_tpu.data.satext import data_iterator
    from tair_tpu.diffusion import Diffusion
    from tair_tpu.parallel.mesh import (
        create_mesh, init_distributed, replicate, shard_batch,
    )
    from tair_tpu.train.checkpoint import (
        latest_checkpoint, load_params, restore_checkpoint, save_checkpoint,
        save_params,
    )
    from tair_tpu.train.step import create_train_state, make_train_step
    from tair_tpu.utils.logging import MetricLogger, is_main_process
    from tair_tpu.utils.metrics import psnr, ssim

    cfg = load_config(args.config)
    tc = cfg.train
    max_steps = args.max_steps or tc.train_steps

    init_distributed()
    n_data = tc.n_data_devices or len(jax.devices())
    mesh = create_mesh(n_data=n_data)
    logger = MetricLogger(tc.exp_dir, log_tool=tc.log_tool)
    if is_main_process():
        print(f"devices={jax.devices()} mesh=data:{n_data} stage={tc.stage}")

    model = build_model(cfg)
    diffusion = Diffusion(schedule=model.schedule, parameterization="v")
    # ONE jitted init program — unjitted init dispatches ~600 tiny
    # initializers, each a compile/load round-trip through a remote-chip
    # relay (measured ~10 min for the default model; same lesson as
    # bench.py init_all)
    params = jax.jit(model.init)(jax.random.PRNGKey(tc.seed))
    init_params_path = args.init_params or tc.init_params
    if init_params_path:
        params = load_params(init_params_path, params)
        if is_main_process():
            print(f"initialized params from {init_params_path}")
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    if is_main_process():
        print(f"total params: {n_params/1e6:.1f}M")

    state, tx = create_train_state(
        params, tc.stage, tc.learning_rate, grad_accum=tc.grad_accum
    )
    del params
    if args.start_step:
        state = state.replace(step=jnp.asarray(args.start_step, jnp.int32))

    ckpt_dir = os.path.join(tc.exp_dir, "checkpoints")
    resume_path = tc.resume or latest_checkpoint(ckpt_dir)
    if resume_path:
        state = restore_checkpoint(resume_path, state)
        if is_main_process():
            print(f"resumed from {resume_path} at step {int(state.step)}")

    if tc.stage in ("stage2", "stage3"):
        from tair_tpu.spotter.losses import CriterionConfig

        spotter_fn = model.spotter_loss_fn(
            criterion_cfg=CriterionConfig(matcher=tc.matcher)
        )
    else:
        spotter_fn = None
    fsdp_sharding = None
    if tc.fsdp:
        from tair_tpu.parallel.fsdp import sharded_fraction, state_shardings

        fsdp_sharding = state_shardings(mesh, state)
        if is_main_process():
            _, tot, per_dev = sharded_fraction(mesh, state)
            print(
                f"fsdp: state {tot / 2**30:.2f} GiB -> "
                f"{per_dev / 2**30:.2f} GiB/device"
            )
    step_fn = make_train_step(
        model, diffusion, tx, mesh=mesh,
        spotter_loss_fn=spotter_fn,
        ocr_loss_weight=tc.ocr_loss_weight,
        timestep_max=tc.timestep_max,
        state_sharding=fsdp_sharding,
    )

    degrade = jax.jit(
        lambda r, hq, k1, k2, sk: degrade_batch(
            r, hq, k1, k2, sk, cfg.degradation
        )
    )

    train_ds = build_dataset(cfg, "TRAIN")
    it = data_iterator(
        train_ds, tc.batch_size * n_data, seed=tc.seed,
        max_inst=cfg.dataset.max_instances,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )

    # independent RNG streams: the train step folds state.step into its key
    # (train/step.py), so the degradation stream must NOT reuse the base key
    # with the same fold_in(step) or the first split keys coincide (the
    # resize/method draws would be bit-identical to k_vae/k_t/k_p every step)
    deg_base, step_base = jax.random.split(jax.random.PRNGKey(tc.seed))
    with mesh:
        if tc.fsdp:
            from tair_tpu.parallel.fsdp import shard_tree_fsdp

            state = shard_tree_fsdp(mesh, state)
        else:
            state = replicate(mesh, state)
        rng_dev = replicate(mesh, step_base)
        t_last = time.time()
        loss_acc = []

        global_step = int(jax.device_get(state.step))
        while global_step < max_steps:
            raw = next(it)
            host_batch = shard_batch(mesh, {
                "hq": jnp.asarray(raw["hq"]),
                "kernel1": jnp.asarray(raw["kernel1"]),
                "kernel2": jnp.asarray(raw["kernel2"]),
                "sinc_kernel": jnp.asarray(raw["sinc_kernel"]),
                "tokens": jnp.asarray(raw["tokens"]),
                "inst_mask": jnp.asarray(raw["inst_mask"]),
                "boxes": jnp.asarray(raw["boxes"]),
                "ctrl_points": jnp.asarray(raw["ctrl_points"]),
                "texts": jnp.asarray(raw["texts"]),
            })
            deg_rng = jax.random.fold_in(deg_base, global_step)
            gt, lq = degrade(
                deg_rng, host_batch["hq"], host_batch["kernel1"],
                host_batch["kernel2"], host_batch["sinc_kernel"],
            )
            batch = {
                "gt": gt, "lq": lq,
                "tokens": host_batch["tokens"],
                "inst_mask": host_batch["inst_mask"],
                "boxes": host_batch["boxes"],
                "ctrl_points": host_batch["ctrl_points"],
                "texts": host_batch["texts"],
            }
            state, aux = step_fn(state, batch, rng_dev)
            loss_acc.append(aux)
            global_step += 1

            if global_step % tc.log_loss_every == 0:
                metrics = {
                    k: float(np.mean([float(a[k]) for a in loss_acc]))
                    for k in loss_acc[-1]
                }
                dt = (time.time() - t_last) / len(loss_acc)
                metrics["sec_per_step"] = dt
                metrics["img_per_sec"] = tc.batch_size * n_data / dt
                logger.log(global_step, metrics, prefix="train/")
                loss_acc, t_last = [], time.time()

            if global_step % tc.ckpt_every == 0 and is_main_process():
                path = save_checkpoint(ckpt_dir, state, global_step)
                print(f"saved checkpoint {path}")

            if (tc.save_params_every
                    and global_step % tc.save_params_every == 0
                    and is_main_process()):
                path = os.path.join(
                    tc.exp_dir, f"params_step_{global_step:08d}.npz"
                )
                save_params(path, state.params, dtype=np.float16)
                print(f"exported weights {path}", flush=True)

            if global_step % tc.log_image_every == 0:
                val_metrics = run_validation(
                    model, state.params, cfg, gt, lq, host_batch["tokens"],
                    n_images=tc.num_val_images,
                    feat_iterations=tc.unet_feat_sampling_timestep,
                    targets={
                        k: host_batch[k]
                        for k in ("inst_mask", "boxes", "ctrl_points", "texts")
                    } if tc.stage in ("stage2", "stage3") else None,
                    image_dir=os.path.join(
                        tc.exp_dir, "val_images", f"step_{global_step}"
                    ),
                )
                logger.log(global_step, val_metrics, prefix="val/")

    if is_main_process():
        # skip the final export when the in-loop one just fired at this step
        if tc.save_params_every and global_step % tc.save_params_every != 0:
            save_params(
                os.path.join(
                    tc.exp_dir, f"params_step_{global_step:08d}.npz"
                ),
                state.params, dtype=np.float16,
            )
        if tc.final_checkpoint:
            save_checkpoint(ckpt_dir, state, global_step)
        print("training done", flush=True)


def _local_rows(x, n):
    """First n rows of the process-local portion of a (possibly) globally
    sharded array. jax.device_get on a mesh-sharded batch raises on
    multi-host runs ('spans non-addressable devices'); validation only needs
    a few sample rows, so gather the addressable shards instead."""
    import numpy as np

    parts = {}
    for s in x.addressable_shards:
        start = s.index[0].start or 0
        parts.setdefault(start, np.asarray(s.data))
    rows = np.concatenate([parts[k] for k in sorted(parts)], axis=0)
    return rows[:n]


_VAL_METRIC_CACHE: dict = {}


def _aux_val_metrics(cfg, restored, gt01):
    """Beyond-PSNR/SSIM metrics for the in-loop validation panel, mirroring
    the reference's 8-metric pyiqa instantiation (train.py:75-82):

    - NIQE always (weightless): scores against the pristine MVG model from
      `val.niqe_params` when configured, else one fitted on the fly from
      this batch's GT rows (a relative naturalness tracker — absolute
      values need the corpus-fitted model, docs/METRIC_WEIGHTS.md);
    - LPIPS/DISTS/CLIPIQA/MANIQA/MUSIQ whenever their checkpoint paths are
      configured on `val.*_weights` (graphs are in-repo; weights external).

    Metric constructors are cached per config path so repeated validations
    reuse the converted weights and jitted graphs."""
    import jax
    import numpy as np

    out = {}
    vc = getattr(cfg, "val", None)
    restored_h = np.asarray(jax.device_get(restored), np.float32)
    gt_h = np.asarray(jax.device_get(gt01), np.float32)

    from tair_tpu.utils.niqe import (
        NIQEParams,
        fit_niqe_params,
        niqe,
        rgb_to_gray255,
    )

    if min(restored_h.shape[1:3]) >= 96:  # NIQE patch size floor
        niqe_src = getattr(vc, "niqe_params", None) if vc else None
        key = ("niqe", niqe_src)
        if key not in _VAL_METRIC_CACHE:
            _VAL_METRIC_CACHE[key] = (
                NIQEParams.load(niqe_src) if niqe_src else None
            )
        nparams = _VAL_METRIC_CACHE[key]
        if nparams is None:
            nparams = fit_niqe_params([rgb_to_gray255(g) for g in gt_h])
        out["niqe"] = float(
            np.mean([niqe(r, nparams) for r in restored_h])
        )

    if vc is None:
        return out
    import jax.numpy as jnp

    def _build(name, path):
        key = (name, path)
        if key not in _VAL_METRIC_CACHE:
            if name == "lpips":
                from tair_tpu.utils.lpips import LPIPSMetric

                _VAL_METRIC_CACHE[key] = LPIPSMetric.from_torch(*path.split(":"))
            elif name == "dists":
                from tair_tpu.utils.dists import DISTSMetric

                _VAL_METRIC_CACHE[key] = DISTSMetric.from_torch(*path.split(":"))
            elif name == "clipiqa":
                from tair_tpu.utils.clipiqa import CLIPIQAMetric

                _VAL_METRIC_CACHE[key] = CLIPIQAMetric.from_torch(path)
            elif name == "maniqa":
                from tair_tpu.utils.maniqa import MANIQAMetric

                _VAL_METRIC_CACHE[key] = MANIQAMetric.from_torch(path)
            elif name == "musiq":
                from tair_tpu.utils.musiq import MUSIQMetric

                _VAL_METRIC_CACHE[key] = MUSIQMetric.from_torch(path)
        return _VAL_METRIC_CACHE[key]

    r_dev, g_dev = jnp.asarray(restored_h), jnp.asarray(gt_h)
    for name, full_ref in (("lpips", True), ("dists", True),
                           ("clipiqa", False), ("maniqa", False),
                           ("musiq", False)):
        path = getattr(vc, f"{name}_weights", None)
        if not path:
            continue
        m = _build(name, path)
        vals = m(r_dev, g_dev) if full_ref else m(r_dev)
        out[name] = float(np.mean(np.asarray(vals)))
    return out


def run_validation(
    model, params, cfg, gt, lq, tokens, n_images=2, steps=10,
    feat_iterations=(), targets=None, image_dir=None,
):
    """In-loop validation: sample a few images, report PSNR/SSIM vs GT, and
    (stage2/3) per-tagged-timestep OCR losses on the captured UNet features
    (counterpart of train.py:246-436's pyiqa + OCR panel)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tair_tpu.spotter.losses import CriterionConfig, set_criterion
    from tair_tpu.utils.metrics import psnr, ssim

    lq_h = _local_rows(lq, n_images)
    n = lq_h.shape[0]
    lq_n = jnp.asarray(lq_h)
    gt_n = jnp.asarray(_local_rows(gt, n))
    tags = tuple(t for t in feat_iterations if t <= steps) if targets else ()
    restored, _, feats = model.restore(
        params, lq_n, jnp.asarray(_local_rows(tokens, n)), jax.random.PRNGKey(0),
        steps=steps, feat_iterations=tags,
    )
    gt01 = (gt_n + 1.0) / 2.0
    metrics = {
        "psnr": float(jnp.mean(psnr(restored, gt01))),
        "ssim": float(jnp.mean(ssim(restored, gt01))),
    }
    metrics.update(_aux_val_metrics(cfg, restored, gt01))
    if image_dir is not None:
        # image panels like the reference's wandb grids (train.py:370-436),
        # saved as PNGs next to the metrics stream
        import os

        from PIL import Image

        from tair_tpu.utils.logging import is_main_process

        if is_main_process():
            os.makedirs(image_dir, exist_ok=True)
            panel = np.concatenate(
                [np.asarray(jax.device_get(a), np.float32)
                 for a in (lq_n, restored, gt01)], axis=2
            )  # [n, H, 3W, 3]: lq | restored | gt
            for bi in range(panel.shape[0]):
                Image.fromarray(
                    (np.clip(panel[bi], 0, 1) * 255).astype(np.uint8)
                ).save(os.path.join(image_dir, f"val_{bi}.png"))
    if tags and model.testr is not None:
        tgt = {k: jnp.asarray(_local_rows(v, n)) for k, v in targets.items()}
        for ti, tag in enumerate(sorted(tags)):
            out = model.spotter_apply(params, tuple(f[ti] for f in feats))
            losses = set_criterion(out, tgt, CriterionConfig())
            metrics[f"ocr_loss_iter{tag}"] = float(losses["loss_total"])
    return metrics


if __name__ == "__main__":
    main()

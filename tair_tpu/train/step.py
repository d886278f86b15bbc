"""Training state + the data-parallel train step.

Parity with the reference hot loop (/root/reference/train.py:121-183):
per-step VAE-encode of GT, SwinIR clean, prepare_condition, uniform timestep
draw, v-parameterization diffusion loss (+ weighted OCR loss in stage2/3),
AdamW update on the stage's trainable subset — all fused into one jitted SPMD
step. Gradient all-reduce is implicit: the batch is sharded on the mesh
"data" axis while params are replicated, so XLA inserts the psum that DDP's
NCCL all-reduce performed (train.py:181).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..diffusion.diffusion import Diffusion
from ..parallel.mesh import DATA_AXIS
from ..pipeline import TeReDiff
from .stages import trainable_mask

Params = Any


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Params
    opt_state: Any


def make_optimizer(
    params: Params, stage: str, learning_rate: float, grad_accum: int = 1
) -> optax.GradientTransformation:
    """AdamW over the stage's trainable subset; frozen leaves get zero updates.

    grad_accum > 1 wraps the whole transformation in optax.MultiSteps: each
    train-step call contributes one micro-batch gradient, and the AdamW
    update fires once every `grad_accum` calls on the micro-batch MEAN —
    large effective batches without the HBM for large per-step batches.
    (Beyond the reference, which has no accumulation — train.py:56,181 —
    and whose effective batch is fixed at bs_per_rank x world_size.)
    """
    mask = trainable_mask(params, stage)
    labels = jax.tree.map(lambda m: "train" if m else "freeze", mask)
    tx = optax.multi_transform(
        {"train": optax.adamw(learning_rate), "freeze": optax.set_to_zero()},
        labels,
    )
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


def create_train_state(
    params: Params, stage: str, learning_rate: float, grad_accum: int = 1
) -> Tuple[TrainState, optax.GradientTransformation]:
    tx = make_optimizer(params, stage, learning_rate, grad_accum=grad_accum)
    return (
        TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)),
        tx,
    )


def diffusion_loss_fn(
    model: TeReDiff,
    diffusion: Diffusion,
    params: Params,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    spotter_loss_fn: Optional[Callable] = None,
    ocr_loss_weight: float = 0.0,
    timestep_max: int = 0,
):
    """batch: gt [B,H,W,3] in [-1,1]; lq [B,H,W,3] in [0,1]; tokens [B,77].

    Returns (total_loss, aux dict). Mirrors train.py:132-173.
    timestep_max > 0 restricts t ~ U(0, timestep_max) (config.py rationale).
    """
    k_vae, k_t, k_p = jax.random.split(rng, 3)
    bsz = batch["gt"].shape[0]

    # Frozen-path computations under stop_gradient (reference: no_grad blocks)
    clean = jax.lax.stop_gradient(model.clean(params, batch["lq"]))
    z_0 = jax.lax.stop_gradient(
        model.cldm.vae_encode(params, batch["gt"], rng=k_vae, sample=True)
    )
    cond = dict(
        c_txt=jax.lax.stop_gradient(
            model.cldm.clip_encode_tokens(params, batch["tokens"])
        ),
        c_img=jax.lax.stop_gradient(
            model.cldm.vae_encode(params, clean * 2.0 - 1.0, sample=False)
        ),
    )
    t_hi = timestep_max if timestep_max > 0 else diffusion.num_timesteps
    t = jax.random.randint(k_t, (bsz,), 0, t_hi)

    model_fn = partial(model.cldm.apply, params)
    diff_loss, feats = diffusion.p_losses(model_fn, z_0, t, cond, k_p)

    aux = {"loss_diffusion": diff_loss}
    total = diff_loss
    if spotter_loss_fn is not None and ocr_loss_weight > 0.0:
        ocr_loss, ocr_aux = spotter_loss_fn(params, feats, batch)
        total = total + ocr_loss_weight * ocr_loss
        aux["loss_ocr"] = ocr_loss
        aux.update(ocr_aux)
    aux["loss_total"] = total
    return total, aux


def make_train_step(
    model: TeReDiff,
    diffusion: Diffusion,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    spotter_loss_fn: Optional[Callable] = None,
    ocr_loss_weight: float = 0.0,
    timestep_max: int = 0,
    donate: bool = True,
    infer_sharding: bool = False,
    state_sharding: Optional[Any] = None,
):
    """Build the jitted SPMD train step: (state, batch, rng) -> (state, aux).

    state_sharding: a NamedSharding pytree for the TrainState (e.g. from
    parallel.fsdp.state_shardings) — pinned as BOTH the input and output
    sharding so ZeRO-sharded params/moments stay sharded across steps instead
    of whatever layout GSPMD would infer for the outputs.
    """

    def step_fn(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, aux), grads = jax.value_and_grad(
            lambda p: diffusion_loss_fn(
                model, diffusion, p, batch, rng,
                spotter_loss_fn=spotter_loss_fn,
                ocr_loss_weight=ocr_loss_weight,
                timestep_max=timestep_max,
            ),
            has_aux=True,
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state),
            aux,
        )

    if state_sharding is not None:
        assert mesh is not None, "state_sharding requires a mesh"
        data = NamedSharding(mesh, P(DATA_AXIS))
        repl = NamedSharding(mesh, P())
        return jax.jit(
            step_fn,
            in_shardings=(state_sharding, data, repl),
            out_shardings=(state_sharding, repl),
            donate_argnums=(0,) if donate else (),
        )

    if mesh is None or infer_sharding:
        # infer_sharding: the caller device_put the state with its own layout
        # (e.g. tensor-parallel param shards, parallel/tp.py) and the batch
        # with P("data"); jit picks the shardings up from the input arrays
        # and GSPMD partitions over BOTH mesh axes.
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )

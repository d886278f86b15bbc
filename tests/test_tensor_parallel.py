"""Tensor-parallel sharding rules and dp x tp train-step equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tair_tpu.parallel.mesh import MODEL_AXIS, create_mesh, replicate, shard_batch
from tair_tpu.parallel.tp import (
    count_sharded,
    shard_params_tp,
    tensor_parallel_specs,
)


def test_spec_rules():
    params = {
        "unet": {
            "attn1": {"to_q": {"kernel": jnp.zeros((64, 64))}},
            "ff": {
                "geglu": {"proj": {"kernel": jnp.zeros((64, 512))}},
                "out": {"kernel": jnp.zeros((256, 64)), "bias": jnp.zeros((64,))},
            },
            "res": {"in_conv": {"kernel": jnp.zeros((3, 3, 64, 64))}},
            "norm1": {"scale": jnp.zeros((64,))},
        },
        "clip": {"attn": {"query": {"kernel": jnp.zeros((64, 4, 16))},
                          "out": {"kernel": jnp.zeros((4, 16, 64))}}},
    }
    specs = tensor_parallel_specs(params, n_model=2)
    assert specs["unet"]["attn1"]["to_q"]["kernel"] == P(None, MODEL_AXIS)
    assert specs["unet"]["ff"]["geglu"]["proj"]["kernel"] == P(None, MODEL_AXIS)
    assert specs["unet"]["ff"]["out"]["kernel"] == P(MODEL_AXIS, None)
    assert specs["unet"]["ff"]["out"]["bias"] == P()
    assert specs["unet"]["res"]["in_conv"]["kernel"] == P()  # convs replicated
    assert specs["unet"]["norm1"]["scale"] == P()
    assert specs["clip"]["attn"]["query"]["kernel"] == P(None, MODEL_AXIS, None)
    assert specs["clip"]["attn"]["out"]["kernel"] == P(MODEL_AXIS, None, None)

    n, sz, tot = count_sharded(params, 2)
    assert n == 5 and 0 < sz < tot


def test_indivisible_shapes_stay_replicated():
    params = {"a": {"to_q": {"kernel": jnp.zeros((8, 6))}}}
    specs = tensor_parallel_specs(params, n_model=4)
    assert specs["a"]["to_q"]["kernel"] == P()  # 6 % 4 != 0


@pytest.mark.slow
def test_tp_inference_restore_matches_single_device():
    """The batch-1 serving claim: the fused TeReDiff restore loop runs
    under a 1(data) x 2(model) mesh with Megatron-sharded weights and
    reproduces the unsharded result (GSPMD is layout-only). score_threshold
    > 1 keeps the OCR prompt empty so the comparison is free of argmax
    discreteness; the spotter forward itself still runs sharded."""
    from tair_tpu.pipeline import build_tiny_model

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")

    model = build_tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    lq = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))

    def run(p, lq, r):
        restored, tokens = model.restore_fused_feedback(
            p, lq, r, steps=2, score_threshold=1.1
        )
        return restored, tokens

    ref, ref_tok = jax.jit(run)(params, lq, jax.random.PRNGKey(2))

    mesh = create_mesh(n_data=1, n_model=2)
    with mesh:
        p_tp = shard_params_tp(mesh, params)
        n, _, _ = count_sharded(params, 2)
        assert n > 0, "tiny model must have at least one TP-sharded kernel"
        lq_r = replicate(mesh, lq)
        rng_r = replicate(mesh, jax.random.PRNGKey(2))
        out, tok = jax.jit(run)(p_tp, lq_r, rng_r)

    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(ref_tok))


@pytest.mark.slow
def test_dp_tp_step_matches_dp_only():
    """One full stage-3 step on a 4x2 mesh must agree with the 8x1 result
    (GSPMD is layout-only; the global program is identical)."""
    from tair_tpu.data.satext import SyntheticSAText, collate
    from tair_tpu.diffusion import Diffusion
    from tair_tpu.pipeline import build_tiny_model
    from tair_tpu.train.step import create_train_state, make_train_step

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    model = build_tiny_model()
    params0 = model.init(jax.random.PRNGKey(0))
    diffusion = Diffusion(schedule=model.schedule, parameterization="v")

    ds = SyntheticSAText(size=64, length=8)
    raw = collate([ds[i] for i in range(8)], max_inst=4)
    host_batch = {
        "gt": jnp.asarray(raw["hq"]) * 2 - 1,
        "lq": jnp.asarray(raw["hq"]),
        "tokens": jnp.asarray(raw["tokens"]),
        "inst_mask": jnp.asarray(raw["inst_mask"]),
        "boxes": jnp.asarray(raw["boxes"]),
        "ctrl_points": jnp.asarray(raw["ctrl_points"]),
        "texts": jnp.asarray(raw["texts"]),
    }

    losses = {}
    for n_model in (1, 2):
        mesh = create_mesh(n_data=8 // n_model, n_model=n_model)
        with mesh:
            params = shard_params_tp(mesh, params0)
            state, tx = create_train_state(params, "stage3", 1e-4)
            step = make_train_step(
                model, diffusion, tx, mesh=mesh,
                spotter_loss_fn=model.spotter_loss_fn(),
                ocr_loss_weight=0.01, donate=False,
                infer_sharding=True,
            )
            batch = shard_batch(mesh, host_batch)
            rng = replicate(mesh, jax.random.PRNGKey(42))
            _, aux = step(state, batch, rng)
            losses[n_model] = float(aux["loss_total"])
    np.testing.assert_allclose(losses[1], losses[2], rtol=2e-4)

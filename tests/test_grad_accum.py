"""Gradient accumulation (optax.MultiSteps wrapping of the stage optimizer).

Beyond the reference (its effective batch is fixed at bs_per_rank x
world_size, /root/reference/train.py:56,181): grad_accum=k averages k
micro-batch gradients before one AdamW update, so large effective batches
fit the per-step HBM of small ones. Asserts (1) no params move before the
k-th micro-step, (2) the k-th update equals plain AdamW applied to the
hand-computed micro-gradient mean.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tair_tpu.diffusion import Diffusion
from tair_tpu.models.tokenizer import tokenize
from tair_tpu.pipeline import build_tiny_model
from tair_tpu.train.step import (
    create_train_state,
    diffusion_loss_fn,
    make_optimizer,
    make_train_step,
)


def make_batch(seed, bsz=2, hw=64):
    k = jax.random.PRNGKey(seed)
    return {
        "gt": jax.random.uniform(k, (bsz, hw, hw, 3)) * 2 - 1,
        "lq": jax.random.uniform(jax.random.PRNGKey(seed + 100), (bsz, hw, hw, 3)),
        "tokens": jnp.asarray(np.repeat(tokenize(["some text"]), bsz, axis=0)),
    }


def test_grad_accum_matches_mean_gradient_update():
    model = build_tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    diffusion = Diffusion(schedule=model.schedule, parameterization="v")

    state, tx = create_train_state(params, "stage1", 1e-3, grad_accum=2)
    step = make_train_step(model, diffusion, tx, donate=False)

    rng = jax.random.PRNGKey(7)
    b0, b1 = make_batch(0), make_batch(1)

    # micro-step 1: gradient accumulated, NO update applied
    state1, aux0 = step(state, b0, rng)
    assert np.isfinite(float(aux0["loss_diffusion"]))
    assert int(state1.step) == 1
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(state1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # micro-step 2: the averaged update fires
    state2, aux1 = step(state1, b1, rng)
    assert int(state2.step) == 2
    assert any(
        np.any(np.asarray(a) != np.asarray(b))
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(state2.params))
    )

    # oracle: mean of the two micro-gradients through the plain (accum=1)
    # optimizer must reproduce state2.params. step_fn folds state.step into
    # the rng, so micro-step i uses fold_in(rng, i).
    def grad_at(batch, micro_step):
        g = jax.grad(
            lambda p: diffusion_loss_fn(
                model, diffusion, p, batch, jax.random.fold_in(rng, micro_step)
            )[0]
        )(params)
        return g

    g_mean = jax.tree.map(
        lambda a, b: (a + b) / 2.0, grad_at(b0, 0), grad_at(b1, 1)
    )
    tx_plain = make_optimizer(params, "stage1", 1e-3)
    updates, _ = tx_plain.update(g_mean, tx_plain.init(params), params)
    expected = optax.apply_updates(params, updates)

    for e, got in zip(jax.tree.leaves(expected), jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(
            np.asarray(e), np.asarray(got), rtol=2e-5, atol=2e-7
        )

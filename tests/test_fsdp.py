"""FSDP (ZeRO-style) sharding of the train state over the data axis.

The reference replicates parameters per DDP rank (train.py:66-67); here the
TPU-native extension shards params + Adam moments across the mesh and XLA
inserts the all-gather / reduce-scatter schedule. These tests assert (a) the
shape-based rule gives a parameter and its moments identical shardings,
(b) the sharded step reproduces the replicated step's loss, and (c) the
per-device state footprint actually shrinks.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from tair_tpu.diffusion import Diffusion
from tair_tpu.models.tokenizer import tokenize
from tair_tpu.parallel.fsdp import (
    fsdp_specs, shard_tree_fsdp, sharded_fraction, state_shardings,
)
from tair_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, create_mesh, replicate, shard_batch
from tair_tpu.pipeline import build_tiny_model
from tair_tpu.train.step import create_train_state, make_train_step

MIN_ELEMS = 128  # tiny-model widths; production default is 8192


def make_batch(bsz=8, hw=64):
    return {
        "gt": jax.random.uniform(jax.random.PRNGKey(0), (bsz, hw, hw, 3)) * 2 - 1,
        "lq": jax.random.uniform(jax.random.PRNGKey(1), (bsz, hw, hw, 3)),
        "tokens": jnp.asarray(np.repeat(tokenize(["some text"]), bsz, axis=0)),
    }


def test_param_and_moments_get_identical_specs():
    model = build_tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    state, _ = create_train_state(params, "stage1", 1e-3)
    specs = fsdp_specs(state, n_data=8, min_elems=MIN_ELEMS)

    flat = jax.tree_util.tree_flatten_with_path(state)[0]
    sflat = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
    assert len(flat) == len(sflat)
    by_shape_suffix = {}
    n_sharded = 0
    for (kp, v), s in zip(flat, sflat):
        path = "/".join(str(getattr(k, "key", k)) for k in kp)
        if not hasattr(v, "shape"):
            continue
        if v.size < MIN_ELEMS or v.ndim == 0:
            assert s == P(), f"small leaf {path} should replicate, got {s}"
            continue
        if any(ax == DATA_AXIS for ax in s):
            n_sharded += 1
        # same (trailing param path, shape) => same spec, wherever in the tree
        tail = "/".join(path.split("/")[-3:])
        key = (tail, tuple(v.shape))
        assert by_shape_suffix.setdefault(key, s) == s, (
            f"{key}: {by_shape_suffix[key]} vs {s}")
    assert n_sharded > 0


def test_fsdp_step_matches_replicated_loss():
    mesh = create_mesh(n_data=8)
    model = build_tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    diffusion = Diffusion(schedule=model.schedule, parameterization="v")
    batch_host = make_batch(bsz=8)
    rng = jax.random.PRNGKey(4)

    def run(fsdp):
        state, tx = create_train_state(params, "stage1", 1e-3)
        with mesh:
            if fsdp:
                state = shard_tree_fsdp(mesh, state, min_elems=MIN_ELEMS)
                step = make_train_step(
                    model, diffusion, tx, mesh=mesh, donate=False,
                    state_sharding=state_shardings(mesh, state, MIN_ELEMS),
                )
            else:
                state = replicate(mesh, state)
                step = make_train_step(model, diffusion, tx, mesh=mesh, donate=False)
            batch = shard_batch(mesh, batch_host)
            r = replicate(mesh, rng)
            losses = []
            for _ in range(2):
                state, aux = step(state, batch, r)
                losses.append(float(aux["loss_total"]))
        return state, losses

    state_f, losses_f = run(fsdp=True)
    _, losses_r = run(fsdp=False)
    assert np.isfinite(losses_f).all()
    np.testing.assert_allclose(losses_f, losses_r, rtol=2e-4)

    # the updated state kept its FSDP layout (out_shardings pinned)
    sharded_leaves = [
        v for v in jax.tree.leaves(state_f.params)
        if any(ax == DATA_AXIS for ax in v.sharding.spec)
    ]
    assert sharded_leaves, "no parameter stayed FSDP-sharded after the step"

    # footprint: per-device bytes must be well below the replicated total
    sharded_b, total_b, per_dev_b = sharded_fraction(mesh, state_f, MIN_ELEMS)
    assert sharded_b > 0.5 * total_b
    assert per_dev_b < 0.6 * total_b


def test_fsdp_composes_with_tensor_parallel():
    mesh = create_mesh(n_data=4, n_model=2)
    model = build_tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    diffusion = Diffusion(schedule=model.schedule, parameterization="v")
    state, tx = create_train_state(params, "stage1", 1e-3)

    with mesh:
        state = shard_tree_fsdp(mesh, state, min_elems=MIN_ELEMS)
        step = make_train_step(
            model, diffusion, tx, mesh=mesh, donate=False,
            state_sharding=state_shardings(mesh, state, MIN_ELEMS),
        )
        batch = shard_batch(mesh, make_batch(bsz=4))
        new_state, aux = step(state, batch, replicate(mesh, jax.random.PRNGKey(4)))
    assert np.isfinite(float(aux["loss_total"]))

    # at least one leaf carries BOTH axes (TP on its path axis, FSDP on another)
    both = [
        v for v in jax.tree.leaves(new_state.params)
        if {DATA_AXIS, MODEL_AXIS} <= {ax for ax in v.sharding.spec if ax}
    ]
    assert both, "no leaf is simultaneously TP- and FSDP-sharded"

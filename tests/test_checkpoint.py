import jax
import jax.numpy as jnp
import numpy as np

from tair_tpu.diffusion import Diffusion
from tair_tpu.pipeline import build_tiny_model
from tair_tpu.train.checkpoint import (
    latest_checkpoint,
    load_params,
    restore_checkpoint,
    save_checkpoint,
    save_params,
)
from tair_tpu.train.step import create_train_state


def test_orbax_roundtrip_exact(tmp_path):
    model = build_tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    state, _ = create_train_state(params, "stage1", 1e-4)

    path = save_checkpoint(str(tmp_path), state, 7)
    assert latest_checkpoint(str(tmp_path)) == path
    # idempotent re-save
    assert save_checkpoint(str(tmp_path), state, 7) == path

    blank_state, _ = create_train_state(
        model.init(jax.random.PRNGKey(99)), "stage1", 1e-4
    )
    restored = restore_checkpoint(path, blank_state)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state round-trips too (the reference never saved it)
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_params_npz_roundtrip_nonstrict(tmp_path):
    model = build_tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    p = str(tmp_path / "w.npz")
    save_params(p, params)
    other = model.init(jax.random.PRNGKey(1))
    loaded = load_params(p, other)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

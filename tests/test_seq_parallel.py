"""Sequence-parallel spotter encoder (token-axis sharding over the model axis).

The encoder's msda gather is row-RATE-bound (docs/PERFORMANCE.md), so the
multi-chip axis that divides per-chip work is the QUERY/token axis — not TP
head sharding, which only narrows each gathered row. `enc_sp_axis` annotates
the encoder's token axis with a mesh axis; GSPMD partitions the gathers by
the sharded indices and all-gathers the (small) value table once per layer.
Asserts: numerics identical to the unconstrained path, and the layer output
actually carries the token sharding (the constraint is live, not elided).
Beyond the reference, whose only parallelism is DDP (SURVEY §2.8).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tair_tpu.parallel.mesh import create_mesh
from tair_tpu.spotter import TESTR
from tair_tpu.spotter.transformer import EncoderLayer, encoder_reference_points

from test_spotter import TINY, tiny_feats


def _setup(sp_axis=None):
    shapes = ((2, 4), (4, 8))  # 40 tokens, divisible by 4
    s = sum(h * w for h, w in shapes)
    layer = EncoderLayer(
        d_model=16, d_ffn=32, n_levels=2, n_heads=4, n_points=2,
        sp_axis=sp_axis,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    src = jax.random.normal(k1, (2, s, 16))
    pos = jax.random.normal(k2, (2, s, 16))
    ref = jnp.broadcast_to(
        jnp.asarray(encoder_reference_points(shapes))[None], (2, s, 2, 2)
    )
    return layer, src, pos, ref, shapes


def test_encoder_layer_sp_matches_unconstrained():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    base, src, pos, ref, shapes = _setup(sp_axis=None)
    params = base.init(jax.random.PRNGKey(1), src, pos, ref, shapes)
    want = base.apply(params, src, pos, ref, shapes)

    mesh = create_mesh(n_data=2, n_model=4)
    sp = _setup(sp_axis="model")[0]
    with mesh:
        got = jax.jit(
            lambda p, a, b, r: sp.apply(p, a, b, r, shapes)
        )(params, src, pos, ref)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), atol=2e-5)
    # the constraint must be live: output token axis sharded over "model"
    assert got.sharding.is_equivalent_to(
        NamedSharding(mesh, P(None, "model", None)), got.ndim
    )


def test_encoder_layer_sp_sparse_branch():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    base, src, pos, ref, shapes = _setup(sp_axis=None)
    params = base.init(jax.random.PRNGKey(1), src, pos, ref, shapes)
    s = src.shape[1]
    sel = jnp.broadcast_to(jnp.arange(0, s, 2)[None], (2, s // 2))
    want = base.apply(params, src, pos, ref, shapes, sel)

    mesh = create_mesh(n_data=2, n_model=4)
    sp = _setup(sp_axis="model")[0]
    with mesh:
        got = jax.jit(
            lambda p, a, b, r, i: sp.apply(p, a, b, r, shapes, i)
        )(params, src, pos, ref, sel)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), atol=2e-5)


def test_full_testr_with_sp_axis():
    """enc_sp_axis threads through TESTRConfig; full spotter forward under a
    dp x model mesh matches the unconstrained forward, and the param tree is
    independent of the knob (checkpoint compatibility)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    feats = tiny_feats(jax.random.PRNGKey(0))
    model = TESTR(TINY)
    params = model.init(jax.random.PRNGKey(1), feats)
    want = model.apply(params, feats)["pred_logits"]

    sp_model = TESTR(dataclasses.replace(TINY, enc_sp_axis="model"))
    mesh = create_mesh(n_data=4, n_model=2)
    with mesh:
        sp_params = sp_model.init(jax.random.PRNGKey(1), feats)
        got = jax.jit(lambda p, f: sp_model.apply(p, f)["pred_logits"])(
            params, feats
        )
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        sp_params
    )
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), atol=2e-5)

"""Sparse encoder update (enc_topk serving knob).

The knob trades spotting quality for msda-gather cost by updating only the
top-N salient encoder tokens per layer (pass-through for the rest); with
enc_topk=0 (default) or enc_topk >= S the graph must be bit-identical to
the exact path, and the parameter tree must not depend on the knob at all
(checkpoint compatibility with the reference converters).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tair_tpu.spotter import TESTR, TESTRConfig
from tair_tpu.spotter.transformer import (
    EncoderLayer,
    encoder_reference_points,
)

from test_spotter import TINY, tiny_feats

S_TINY = 2 * 2 + 4 * 4 + 8 * 8 + 8 * 8  # token count of tiny_feats levels


def _enc_layer_setup():
    shapes = ((2, 3), (4, 6))
    s = sum(h * w for h, w in shapes)
    layer = EncoderLayer(d_model=16, d_ffn=32, n_levels=2, n_heads=4, n_points=2)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    src = jax.random.normal(k1, (2, s, 16))
    pos = jax.random.normal(k2, (2, s, 16))
    ref = jnp.broadcast_to(
        jnp.asarray(encoder_reference_points(shapes))[None], (2, s, 2, 2)
    )
    params = layer.init(jax.random.PRNGKey(1), src, pos, ref, shapes)
    return layer, params, src, pos, ref, shapes, s


def test_full_selection_matches_dense_path():
    layer, params, src, pos, ref, shapes, s = _enc_layer_setup()
    dense = layer.apply(params, src, pos, ref, shapes)
    sel_all = jnp.broadcast_to(jnp.arange(s)[None], (2, s))
    sparse = layer.apply(params, src, pos, ref, shapes, sel_all)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(sparse), atol=1e-5)


def test_unselected_tokens_pass_through():
    layer, params, src, pos, ref, shapes, s = _enc_layer_setup()
    rs = np.random.RandomState(0)
    idx = np.sort(rs.choice(s, size=(2, 7), replace=False), axis=1)
    out = layer.apply(params, src, pos, ref, shapes, jnp.asarray(idx))
    dense = layer.apply(params, src, pos, ref, shapes)
    for b in range(2):
        keep = np.setdiff1d(np.arange(s), idx[b])
        np.testing.assert_array_equal(
            np.asarray(out)[b, keep], np.asarray(src)[b, keep]
        )
        # selected rows get the same update the dense path computes for them
        # (queries only read src, which both paths see identically)
        np.testing.assert_allclose(
            np.asarray(out)[b, idx[b]], np.asarray(dense)[b, idx[b]], atol=1e-5
        )


def test_param_tree_independent_of_enc_topk():
    feats = tiny_feats(jax.random.PRNGKey(0))
    p0 = TESTR(TINY).init(jax.random.PRNGKey(1), feats)
    p1 = TESTR(dataclasses.replace(TINY, enc_topk=16)).init(
        jax.random.PRNGKey(1), feats
    )
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    chex_shapes0 = jax.tree_util.tree_map(lambda x: x.shape, p0)
    chex_shapes1 = jax.tree_util.tree_map(lambda x: x.shape, p1)
    assert chex_shapes0 == chex_shapes1


def test_topk_geq_s_is_exact():
    feats = tiny_feats(jax.random.PRNGKey(0))
    model0 = TESTR(TINY)
    params = model0.init(jax.random.PRNGKey(1), feats)
    out0 = model0.apply(params, feats)
    model1 = TESTR(dataclasses.replace(TINY, enc_topk=S_TINY + 100))
    out1 = model1.apply(params, feats)
    np.testing.assert_array_equal(
        np.asarray(out0["pred_logits"]), np.asarray(out1["pred_logits"])
    )


def test_sparse_forward_runs_and_differs():
    feats = tiny_feats(jax.random.PRNGKey(0))
    model0 = TESTR(TINY)
    params = model0.init(jax.random.PRNGKey(1), feats)
    out0 = model0.apply(params, feats)
    model1 = TESTR(dataclasses.replace(TINY, enc_topk=16))
    out1 = model1.apply(params, feats)
    assert out1["pred_logits"].shape == out0["pred_logits"].shape
    assert np.isfinite(np.asarray(out1["pred_logits"])).all()
    assert not np.array_equal(
        np.asarray(out0["pred_logits"]), np.asarray(out1["pred_logits"])
    )

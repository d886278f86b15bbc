"""Static machinery of the deformable transformer: reference grids, proposal
boxes, sine embeddings."""

import numpy as np

from tair_tpu.spotter.transformer import (
    encoder_reference_points,
    proposal_grid,
    proposal_pos_embed,
    sine_pos_embed_1d,
    sine_pos_embed_2d,
)


def test_encoder_reference_points():
    shapes = ((2, 2), (4, 4))
    ref = encoder_reference_points(shapes)
    s = 4 + 16
    assert ref.shape == (s, 2, 2)
    # first token of level 0 sits at the center of its cell
    np.testing.assert_allclose(ref[0, 0], [0.25, 0.25])
    np.testing.assert_allclose(ref[3, 0], [0.75, 0.75])
    # all normalized
    assert (ref > 0).all() and (ref < 1).all()


def test_proposal_grid_wh_grows_with_level():
    shapes = ((8, 8), (4, 4))
    logit, valid = proposal_grid(shapes)
    assert logit.shape == (80, 4)
    import scipy.special as sp

    wh0 = sp.expit(logit[0, 2])
    wh1 = sp.expit(logit[64, 2])
    np.testing.assert_allclose(wh0, 0.05, atol=1e-6)
    np.testing.assert_allclose(wh1, 0.10, atol=1e-6)
    assert valid.any()


def test_sine_embeddings_shapes_and_range():
    e2 = sine_pos_embed_2d(4, 6, 128)
    assert e2.shape == (4, 6, 256)
    assert np.abs(e2).max() <= 1.0 + 1e-6
    e1 = sine_pos_embed_1d(25, 256)
    assert e1.shape == (25, 256)
    assert np.abs(e1).max() <= 1.0 + 1e-6
    # distinct positions get distinct codes
    assert not np.allclose(e1[0], e1[1])


def test_proposal_pos_embed_shape():
    import jax.numpy as jnp

    boxes = jnp.zeros((2, 5, 4))
    out = proposal_pos_embed(boxes, 256)
    assert out.shape == (2, 5, 256)

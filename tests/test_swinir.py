import jax
import jax.numpy as jnp
import numpy as np

from tair_tpu.models.swinir import (
    SwinIR,
    SwinIRConfig,
    _rel_pos_index,
    _shift_attn_mask,
    pixel_unshuffle,
    window_merge,
    window_partition,
)

TINY = SwinIRConfig(
    embed_dim=16,
    depths=(2, 2),
    num_heads=(2, 2),
    window_size=4,
    sf=8,
    unshuffle=True,
    unshuffle_scale=8,
    num_feat=8,
)


def test_pixel_unshuffle_matches_torch_layout():
    import torch

    x = np.random.RandomState(0).randn(1, 8, 8, 3).astype(np.float32)
    ours = np.asarray(pixel_unshuffle(jnp.asarray(x), 2))
    theirs = (
        torch.pixel_unshuffle(torch.from_numpy(x).permute(0, 3, 1, 2), 2)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs)


def test_window_partition_roundtrip():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    w = window_partition(x, 4)
    assert w.shape == (2 * 4, 16, 3)
    back = window_merge(w, 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_rel_pos_index_properties():
    idx = _rel_pos_index(4)
    assert idx.shape == (16, 16)
    assert idx.min() >= 0 and idx.max() < 49  # (2*4-1)^2
    # symmetric pairs map to mirrored offsets: idx[i,j] + idx[j,i] = const diag*2
    assert (np.diag(idx) == idx[0, 0]).all()


def test_shift_mask_blocks_cross_region_attention():
    m = _shift_attn_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    assert set(np.unique(m)) <= {0.0, -100.0}
    # the first (interior) window has no cross-region pairs... but shifted
    # windows at the boundary must mask something
    assert (m == -100.0).any()


def test_swinir_identity_resolution():
    """TAIR config: unshuffle x8 then upsample x8 => output size == input size."""
    model = SwinIR(TINY)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    y = model.apply(params, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_swinir_window_shift_changes_output():
    """Depth 2 includes one shifted block; masks must be active (smoke)."""
    model = SwinIR(TINY)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    y1 = model.apply(params, x)
    y2 = model.apply(params, jnp.roll(x, 8, axis=1))
    # rolling the input by a non-window multiple must not equal rolled output
    # (window attention is not translation equivariant at window scale)
    assert not np.allclose(np.asarray(jnp.roll(y1, 8, axis=1)), np.asarray(y2))

import jax
import jax.numpy as jnp
import numpy as np

from tair_tpu.tiling import (
    fade_window,
    merge_with_overlap,
    restore_tiled,
    split_grid,
    split_with_overlap,
)


def test_split_grid_geometry():
    # 512x512 with 128/16 -> stride 112: ceil((512-16)/112) = 5 per axis
    n_h, n_w, ph, pw = split_grid(512, 512, 128, 16)
    assert (n_h, n_w) == (5, 5)
    assert ph == 4 * 112 + 128 == 576


def test_split_then_merge_is_identity_for_constant_scale():
    """With identity restoration at scale 1, merge(split(x)) == x exactly
    (blend weights normalize out)."""
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(72, 96, 3), jnp.float32)
    patches = split_with_overlap(img, patch=32, overlap=8)
    n_h, n_w, _, _ = split_grid(72, 96, 32, 8)
    assert patches.shape == (n_h * n_w, 32, 32, 3)
    merged = merge_with_overlap(
        patches, (72, 96), in_patch=32, in_overlap=8, out_patch=32, out_overlap=8
    )
    np.testing.assert_allclose(np.asarray(merged), np.asarray(img), atol=1e-5)


def test_fade_window_properties():
    w = fade_window(64, 16)
    assert w.shape == (64, 64)
    assert w[32, 32] == 1.0
    assert w[0, 32] == 1.0 / 16
    assert w[32, 0] == 1.0 / 16
    assert w[0, 0] == (1.0 / 16) ** 2


def test_restore_tiled_end_to_end_with_fake_restorer():
    """A fake 'restorer' that just returns its (upscaled) input: the tiled
    pipeline must then equal plain bicubic x4 upscaling, up to blend effects."""
    rs = np.random.RandomState(1)
    img = jnp.asarray(rs.rand(48, 64, 3), jnp.float32)

    def fake_restore(batch, rng):
        return batch

    out = restore_tiled(
        fake_restore, img, jax.random.PRNGKey(0), patch=16, overlap=4, out_scale=4
    )
    assert out.shape == (192, 256, 3)
    ref = jnp.clip(jax.image.resize(img, (192, 256, 3), "cubic"), 0, 1)
    # interiors match the plain upscale; patch borders blend resampled copies
    err = float(jnp.abs(out - ref).mean())
    assert err < 0.03


def test_restore_tiled_chunked_matches_unchunked():
    rs = np.random.RandomState(2)
    img = jnp.asarray(rs.rand(40, 40, 3), jnp.float32)

    def fake_restore(batch, rng):
        return batch * 0.5  # rng-independent so chunking cannot diverge

    full = restore_tiled(fake_restore, img, jax.random.PRNGKey(0), 16, 4, 2)
    chunked = restore_tiled(
        fake_restore, img, jax.random.PRNGKey(0), 16, 4, 2, chunk=3
    )
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), atol=1e-6)

"""NIQE from-scratch implementation: fit on pristine corpus, rank by quality."""

import numpy as np
import pytest

from tair_tpu.utils.niqe import (
    NIQEParams,
    fit_niqe_params,
    mscn,
    niqe,
    niqe_features,
    rgb_to_gray255,
)


def _natural_like(seed, size=256):
    """Smooth random field + texture: a crude stand-in for pristine images."""
    rng = np.random.RandomState(seed)
    base = rng.rand(size // 8, size // 8)
    img = np.kron(base, np.ones((8, 8)))
    from tair_tpu.utils.niqe import _filter2, _gauss_kernel

    img = _filter2(img, _gauss_kernel(7, 2.0))
    img = img + 0.02 * rng.randn(size, size)
    return np.clip(img, 0, 1) * 255.0


def test_mscn_is_normalized():
    m, sig = mscn(_natural_like(0))
    assert abs(float(m.mean())) < 0.1
    assert 0.1 < float(m.std()) < 3.0
    assert sig.min() >= 0.0


def test_features_shape_and_finite():
    f = niqe_features(_natural_like(1), patch=64)
    assert f.shape[1] == 36
    assert np.isfinite(f).all()


def test_niqe_ranks_degradations():
    pristine = [_natural_like(s) for s in range(6)]
    params = fit_niqe_params(pristine, patch=64)

    clean = _natural_like(100)
    rng = np.random.RandomState(7)
    noisy = np.clip(clean + 40.0 * rng.randn(*clean.shape), 0, 255)

    s_clean = niqe(clean, params, patch=64)
    s_noisy = niqe(noisy, params, patch=64)
    assert np.isfinite(s_clean) and np.isfinite(s_noisy)
    # heavy noise must score farther from the pristine model
    assert s_noisy > s_clean


def test_params_roundtrip(tmp_path):
    params = fit_niqe_params([_natural_like(2)], patch=64)
    p = str(tmp_path / "niqe_params.npz")
    params.save(p)
    loaded = NIQEParams.load(p)
    np.testing.assert_array_equal(loaded.mu, params.mu)
    np.testing.assert_array_equal(loaded.cov, params.cov)


def test_rgb_input_path():
    rgb = np.stack([_natural_like(3) / 255.0] * 3, -1)
    g = rgb_to_gray255(rgb)
    assert g.max() <= 255.0 and g.shape == rgb.shape[:2]
    params = fit_niqe_params([_natural_like(4)], patch=64)
    assert np.isfinite(niqe(rgb, params, patch=64))


def test_too_small_image_raises():
    with pytest.raises(ValueError):
        niqe_features(np.zeros((32, 32)), patch=96)

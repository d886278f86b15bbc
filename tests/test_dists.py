"""DISTS graph sanity (random weights — calibrated values need external
checkpoints, see docs/METRIC_WEIGHTS.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tair_tpu.utils.dists import DISTSMetric, _l2_pool


def test_dists_identity_is_zero_and_symmetric():
    m = DISTSMetric().init_random()
    a = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    b = jnp.clip(a + 0.2 * jax.random.normal(jax.random.PRNGKey(2), a.shape), 0, 1)

    d_aa = np.asarray(m(a, a))
    # alpha+beta normalization makes the self-similarity sum exactly 1
    np.testing.assert_allclose(d_aa, 0.0, atol=1e-5)

    d_ab = np.asarray(m(a, b))
    d_ba = np.asarray(m(b, a))
    np.testing.assert_allclose(d_ab, d_ba, atol=1e-5)
    assert (np.abs(d_ab) > 1e-6).all()  # differing images score nonzero


def test_dists_raises_without_weights():
    m = DISTSMetric()
    with pytest.raises(RuntimeError, match="weights not loaded"):
        m(jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3)))


def test_l2_pool_downsamples_and_preserves_energy_scale():
    x = jnp.ones((1, 8, 8, 4))
    y = _l2_pool(x)
    assert y.shape == (1, 4, 4, 4)
    # constant input: L2 pool of ones ~= 1 in the interior (hann window sums to 1)
    np.testing.assert_allclose(np.asarray(y[0, 1:3, 1:3]), 1.0, atol=1e-5)


def test_l2_pool_matches_official_torch_formulation():
    """Oracle: the official DISTS L2pooling (Ding et al. repo) — 3-tap
    np.hanning(5)[1:-1] window, stride 2, padding (5-2)//2 — re-expressed
    in torch here; converted official alpha/beta are only calibrated if the
    pooled features agree."""
    import torch
    import torch.nn.functional as F

    rs = np.random.RandomState(3)
    x = rs.rand(2, 6, 9, 9).astype(np.float32)  # NCHW for torch

    a = np.hanning(5)[1:-1]
    g = torch.tensor(np.outer(a, a) / np.outer(a, a).sum(), dtype=torch.float32)
    filt = g[None, None].repeat(6, 1, 1, 1)
    ref = torch.sqrt(
        F.conv2d(torch.tensor(x) ** 2, filt, stride=2, padding=1, groups=6)
        + 1e-12
    ).numpy()

    out = np.asarray(_l2_pool(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2), ref, atol=1e-5)

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tair_tpu.data.batch_transform import DegradationConfig, degrade_batch
from tair_tpu.data.degradation import (
    add_gaussian_noise,
    add_poisson_noise,
    filter2d,
    usm_sharpen,
)
from tair_tpu.data.diffjpeg import diff_jpeg
from tair_tpu.data.kernels import (
    bivariate_gaussian,
    circular_lowpass_kernel,
    pulse_kernel,
    sample_degradation_kernels,
)


def test_filter2d_matches_torch():
    import torch
    import torch.nn.functional as F

    rs = np.random.RandomState(0)
    img = rs.rand(2, 16, 16, 3).astype(np.float32)
    k = rs.rand(2, 5, 5).astype(np.float32)
    k /= k.sum((1, 2), keepdims=True)

    ours = np.asarray(filter2d(jnp.asarray(img), jnp.asarray(k)))

    t = torch.from_numpy(img).permute(0, 3, 1, 2)
    tp = F.pad(t, (2, 2, 2, 2), mode="reflect")
    tk = torch.from_numpy(k).view(2, 1, 5, 5).repeat(1, 3, 1, 1).view(6, 1, 5, 5)
    ref = F.conv2d(tp.reshape(1, 6, 20, 20), tk, groups=6).view(2, 3, 16, 16)
    np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_kernels_are_normalized():
    rs = np.random.RandomState(0)
    for _ in range(5):
        k1, k2, sinc = sample_degradation_kernels(rs)
        for k in (k1, k2, sinc):
            assert k.shape == (21, 21)
            np.testing.assert_allclose(k.sum(), 1.0, atol=1e-4)
    g = bivariate_gaussian(21, 1.5, 1.5, 0.0)
    assert g[10, 10] == g.max()
    s = circular_lowpass_kernel(np.pi / 2, 13, pad_to=21)
    assert s.shape == (21, 21)
    assert pulse_kernel()[10, 10] == 1.0


def test_usm_sharpen_increases_contrast():
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(1, 64, 64, 3), jnp.float32)
    sharp = usm_sharpen(img)
    assert sharp.shape == img.shape
    assert float(jnp.std(sharp)) >= float(jnp.std(img)) * 0.99


def test_noise_ops():
    img = jnp.full((2, 16, 16, 3), 0.5)
    g = add_gaussian_noise(
        jax.random.PRNGKey(0), img, jnp.asarray([10.0, 10.0]), jnp.asarray([0.0, 1.0])
    )
    assert g.shape == img.shape
    # gray element: identical noise across channels
    diff = np.asarray(g[1, :, :, 0] - g[1, :, :, 1])
    np.testing.assert_allclose(diff, 0.0, atol=1e-6)
    # color element: channels differ
    assert np.abs(np.asarray(g[0, :, :, 0] - g[0, :, :, 1])).max() > 1e-4

    p = add_poisson_noise(
        jax.random.PRNGKey(1), img, jnp.asarray([2.0, 2.0]), jnp.asarray([0.0, 0.0])
    )
    assert p.shape == img.shape
    assert float(jnp.abs(p - img).max()) > 0


def test_diffjpeg_quality_ordering():
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(1, 32, 32, 3), jnp.float32)
    hi = diff_jpeg(img, jnp.asarray([95.0]))
    lo = diff_jpeg(img, jnp.asarray([10.0]))
    err_hi = float(jnp.mean((hi - img) ** 2))
    err_lo = float(jnp.mean((lo - img) ** 2))
    assert err_lo > err_hi > 0
    assert float(hi.min()) >= 0 and float(hi.max()) <= 1


def test_diffjpeg_nonmultiple16():
    img = jnp.ones((1, 24, 40, 3)) * 0.3
    out = diff_jpeg(img, jnp.asarray([50.0]))
    assert out.shape == (1, 24, 40, 3)


def test_degrade_batch_end_to_end():
    rs = np.random.RandomState(0)
    b, s = 2, 64
    hq = jnp.asarray(rs.rand(b, s, s, 3), jnp.float32)
    ks = [sample_degradation_kernels(rs) for _ in range(b)]
    k1 = jnp.asarray(np.stack([k[0] for k in ks]))
    k2 = jnp.asarray(np.stack([k[1] for k in ks]))
    sinc = jnp.asarray(np.stack([k[2] for k in ks]))

    fn = jax.jit(lambda r, hq: degrade_batch(r, hq, k1, k2, sinc))
    gt, lq = fn(jax.random.PRNGKey(0), hq)
    assert gt.shape == (b, s, s, 3) and lq.shape == (b, s, s, 3)
    assert float(gt.min()) >= -1.0 and float(gt.max()) <= 1.0
    assert float(lq.min()) >= 0.0 and float(lq.max()) <= 1.0
    # degradation actually degrades
    base = (gt + 1) / 2
    assert float(jnp.mean((lq - base) ** 2)) > 1e-4

    # different keys -> different degradations (random pipeline)
    _, lq2 = fn(jax.random.PRNGKey(1), hq)
    assert float(jnp.abs(lq - lq2).max()) > 1e-3
    # same key -> deterministic
    _, lq3 = fn(jax.random.PRNGKey(0), hq)
    np.testing.assert_array_equal(np.asarray(lq), np.asarray(lq3))

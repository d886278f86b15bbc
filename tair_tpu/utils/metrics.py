"""Image-quality metrics (jittable PSNR/SSIM) + wavelet color fix.

Counterparts of the reference's pyiqa usage (/root/reference/val.py:68-75)
for the full-reference metrics and of wavelet_reconstruction
(/root/reference/terediff/utils/common.py:119-171). Learned no-reference
metrics (NIQE/MUSIQ/MANIQA/CLIPIQA) require pretrained scorer weights that
are not shipped in this environment; see lpips.py for the pluggable
perceptual-metric hook.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Per-image PSNR over NHWC batches -> [B]."""
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2,
                   axis=(1, 2, 3))
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return jnp.outer(g, g)


def _filter_valid(x: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Depthwise VALID conv of NHWC x with one 2D window."""
    c = x.shape[-1]
    k = window.shape[0]
    rhs = jnp.tile(window[:, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, rhs, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def ssim(
    a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0,
    size: int = 11, sigma: float = 1.5,
) -> jnp.ndarray:
    """Standard single-scale SSIM (gaussian window), per image -> [B]."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    w = _gaussian_window(size, sigma)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2

    mu_a = _filter_valid(a, w)
    mu_b = _filter_valid(b, w)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    s_aa = _filter_valid(a * a, w) - mu_aa
    s_bb = _filter_valid(b * b, w) - mu_bb
    s_ab = _filter_valid(a * b, w) - mu_ab

    m = ((2 * mu_ab + c1) * (2 * s_ab + c2)) / (
        (mu_aa + mu_bb + c1) * (s_aa + s_bb + c2)
    )
    return jnp.mean(m, axis=(1, 2, 3))


def _gaussian_blur(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Box-free dyadic blur used by the wavelet decomposition: 3x3 binomial
    kernel with dilation 2^level and reflect padding."""
    kernel_1d = jnp.asarray([0.25, 0.5, 0.25], jnp.float32)
    window = jnp.outer(kernel_1d, kernel_1d)
    c = x.shape[-1]
    rhs = jnp.tile(window[:, :, None, None], (1, 1, 1, c))
    p = radius
    x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        x, rhs, (1, 1), "VALID",
        rhs_dilation=(radius, radius),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def wavelet_decompose(x: jnp.ndarray, levels: int = 5):
    """(high_freq, low_freq) via iterated dilated blurs (common.py:119-150)."""
    high = jnp.zeros_like(x)
    low = x
    for i in range(levels):
        radius = 2**i
        blurred = _gaussian_blur(low, radius)
        high = high + (low - blurred)
        low = blurred
    return high, low


def wavelet_reconstruction(content: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
    """Keep content's high frequencies, adopt style's color (low freq)
    — the DiffBIR color fix (common.py:153-171)."""
    content_high, _ = wavelet_decompose(content)
    _, style_low = wavelet_decompose(style)
    return content_high + style_low

"""Jittable degradation ops: blur, unsharp mask, noise, dynamic-scale resize.

Parity targets:
  - filter2D / USMSharp: /root/reference/terediff/dataset/utils.py:278-327
  - gaussian/poisson noise: /root/reference/terediff/dataset/degradation.py:461-700

TPU notes: filter2D is a grouped NHWC conv with per-image kernels (one conv
call, batch folded into channel groups); dynamic-size resizes become
`jax.image.scale_and_translate` onto FIXED canvases so the whole two-stage
pipeline compiles once (no data-dependent shapes). Poisson noise uses a fixed
256-level quantization instead of the reference's data-dependent
unique-value count (8-bit images saturate at 256 levels anyway).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def filter2d(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """img [B,H,W,C], kernel [B,k,k] (odd k) -> reflect-pad same-size conv."""
    b, h, w, c = img.shape
    k = kernel.shape[-1]
    assert k % 2 == 1
    p = k // 2
    x = jnp.pad(img, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    # fold batch into channel groups: one conv, B*C groups
    x = x.transpose(1, 2, 0, 3).reshape(1, h + 2 * p, w + 2 * p, b * c)
    rhs = jnp.tile(kernel[:, None, :, :], (1, c, 1, 1)).reshape(b * c, 1, k, k)
    rhs = rhs.transpose(2, 3, 1, 0)  # [k, k, 1, B*C]
    out = jax.lax.conv_general_dilated(
        x, rhs, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=b * c,
    )
    return out.reshape(h, w, b, c).transpose(2, 0, 1, 3)


def _gaussian_kernel_1d(radius: int, sigma: float = 0.0) -> np.ndarray:
    """cv2.getGaussianKernel semantics: sigma<=0 -> 0.3*((k-1)*0.5-1)+0.8."""
    k = radius
    if sigma <= 0:
        sigma = 0.3 * ((k - 1) * 0.5 - 1) + 0.8
    x = np.arange(k) - (k - 1) / 2.0
    g = np.exp(-(x**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def usm_sharpen(
    img: jnp.ndarray, radius: int = 51, weight: float = 0.5, threshold: float = 10.0
) -> jnp.ndarray:
    """Unsharp-mask with soft threshold mask (USMSharp, utils.py:307-327)."""
    g1 = _gaussian_kernel_1d(radius)
    kernel = jnp.asarray(np.outer(g1, g1))[None]  # [1, k, k]
    b = img.shape[0]
    kernel = jnp.broadcast_to(kernel, (b,) + kernel.shape[1:])
    blur = filter2d(img, kernel)
    residual = img - blur
    mask = (jnp.abs(residual) * 255.0 > threshold).astype(img.dtype)
    soft_mask = filter2d(mask, kernel)
    sharp = jnp.clip(img + weight * residual, 0.0, 1.0)
    return soft_mask * sharp + (1.0 - soft_mask) * img


def add_gaussian_noise(
    rng: jax.Array,
    img: jnp.ndarray,
    sigma: jnp.ndarray,       # [B] in [0, 255] scale
    gray_mask: jnp.ndarray,   # [B] in {0,1}
    clip: bool = True,
) -> jnp.ndarray:
    b, h, w, c = img.shape
    k1, k2 = jax.random.split(rng)
    sigma = sigma.reshape(b, 1, 1, 1) / 255.0
    noise = jax.random.normal(k1, img.shape, jnp.float32) * sigma
    noise_gray = jax.random.normal(k2, (b, h, w, 1), jnp.float32) * sigma
    g = gray_mask.reshape(b, 1, 1, 1).astype(jnp.float32)
    out = img + noise * (1 - g) + noise_gray * g
    return jnp.clip(out, 0.0, 1.0) if clip else out


def add_poisson_noise(
    rng: jax.Array,
    img: jnp.ndarray,
    scale: jnp.ndarray,       # [B]
    gray_mask: jnp.ndarray,   # [B] in {0,1}
    clip: bool = True,
    levels: float = 256.0,
) -> jnp.ndarray:
    b = img.shape[0]
    k1, k2 = jax.random.split(rng)
    base = jnp.clip(jnp.round(img * 255.0), 0, 255) / 255.0
    noise = jax.random.poisson(k1, base * levels).astype(jnp.float32) / levels - base

    luma = jnp.clip(
        jnp.round(
            (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]) * 255.0
        ),
        0,
        255,
    ) / 255.0
    noise_g = (
        jax.random.poisson(k2, luma * levels).astype(jnp.float32) / levels - luma
    )[..., None]

    g = gray_mask.reshape(b, 1, 1, 1).astype(jnp.float32)
    s = scale.reshape(b, 1, 1, 1)
    out = img + (noise * (1 - g) + noise_g * g) * s
    return jnp.clip(out, 0.0, 1.0) if clip else out


def resize_on_canvas(
    img: jnp.ndarray,      # [B, H, W, C]: content fills the top-left corner
    pixel_scale,           # traced scalar: out_content_px = in_content_px * s
    out_shape: Tuple[int, int],  # static output canvas (H', W')
    method: str = "linear",
) -> jnp.ndarray:
    """Rescale top-left-anchored content between fixed canvases.

    `jax.image.scale_and_translate` maps input pixel i to output coordinate
    i*scale, so content occupying [0:n) pixels lands on [0:n*s) — dynamic
    CONTENT size on static CANVAS shapes. This replaces torch's dynamic-size
    F.interpolate in the degradation pipeline. The canvas region beyond the
    content stays (approximately) zero; the content's right/bottom edge sees
    a few pixels of zero-bleed from the resampling kernel — negligible for
    degradation synthesis.
    """
    b, h, w, c = img.shape
    oh, ow = out_shape
    s = jnp.asarray(pixel_scale, jnp.float32)
    return jax.image.scale_and_translate(
        img,
        (b, oh, ow, c),
        spatial_dims=(1, 2),
        scale=jnp.stack([s, s]),
        translation=jnp.zeros(2, jnp.float32),
        method=method,
        antialias=True,
    )

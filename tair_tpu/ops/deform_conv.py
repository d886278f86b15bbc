"""Deformable convolution v1/v2 (XLA-native).

TPU counterpart of the detectron2 CUDA kernels
(/root/reference/detectron2/detectron2/layers/csrc/deformable/
deform_conv_cuda{_kernel}.cu — flagged native inventory in the survey).
Design: the deformable im2col becomes a batched bilinear gather building
[B, H', W', K*Cin], and the convolution collapses to ONE big matmul with the
[K*Cin, Cout] reshaped weight — exactly the MXU-friendly decomposition of
the CUDA kernel's im2col+gemm, with autodiff providing col2im (scatter-add)
instead of hand-written atomics. Modulated (v2) adds the per-sample mask.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .sampling import bilinear_sample_nhwc


def deform_conv2d(
    x: jnp.ndarray,        # [B, H, W, Cin]
    offsets: jnp.ndarray,  # [B, H', W', K*2] (dy, dx per kernel tap)
    weight: jnp.ndarray,   # [kh, kw, Cin, Cout]
    bias: Optional[jnp.ndarray] = None,   # [Cout]
    mask: Optional[jnp.ndarray] = None,   # [B, H', W', K] modulation (v2)
    stride: int = 1,
    padding: int = 1,
) -> jnp.ndarray:
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    k = kh * kw
    out_h = (h + 2 * padding - kh) // stride + 1
    out_w = (w + 2 * padding - kw) // stride + 1
    assert offsets.shape[:3] == (b, out_h, out_w), (
        f"offsets {offsets.shape} vs output ({b},{out_h},{out_w})"
    )

    # base sampling grid per output position and kernel tap
    ys = jnp.arange(out_h) * stride - padding
    xs = jnp.arange(out_w) * stride - padding
    ky, kx = np.meshgrid(np.arange(kh), np.arange(kw), indexing="ij")
    ky = jnp.asarray(ky.reshape(-1), jnp.float32)  # [K]
    kx = jnp.asarray(kx.reshape(-1), jnp.float32)

    off = offsets.reshape(b, out_h, out_w, k, 2)
    y_pos = ys[None, :, None, None] + ky[None, None, None, :] + off[..., 0]
    x_pos = xs[None, None, :, None] + kx[None, None, None, :] + off[..., 1]

    sampled = bilinear_sample_nhwc(x, x_pos, y_pos)  # [B, H', W', K, Cin]
    if mask is not None:
        sampled = sampled * mask[..., None]

    cols = sampled.reshape(b, out_h, out_w, k * cin)
    wmat = weight.transpose(0, 1, 2, 3).reshape(k * cin, cout)
    out = jnp.einsum(
        "bhwk,ko->bhwo", cols, wmat, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out

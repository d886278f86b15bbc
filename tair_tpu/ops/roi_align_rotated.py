"""ROIAlignRotated (XLA-native bilinear grid sampling).

TPU counterpart of detectron2's ROIAlignRotated CUDA/CPU kernels
(/root/reference/detectron2/detectron2/layers/csrc/ROIAlignRotated/).
Each rotated ROI (cx, cy, w, h, angle_deg in image coords) is pooled to a
fixed PxP output by averaging `sampling_ratio^2` bilinear samples per bin —
one batched gather + mean, no per-ROI loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .sampling import bilinear_sample_nhwc


def roi_align_rotated(
    feats: jnp.ndarray,       # [B, H, W, C]
    rois: jnp.ndarray,        # [N, 6]: (batch_idx, cx, cy, w, h, angle_deg)
    output_size: int = 7,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
) -> jnp.ndarray:             # [N, P, P, C]
    p = output_size
    s = sampling_ratio
    n = rois.shape[0]

    batch_idx = rois[:, 0].astype(jnp.int32)
    cx = rois[:, 1] * spatial_scale
    cy = rois[:, 2] * spatial_scale
    w = jnp.maximum(rois[:, 3] * spatial_scale, 1.0)
    h = jnp.maximum(rois[:, 4] * spatial_scale, 1.0)
    theta = jnp.deg2rad(rois[:, 5])

    # sample grid in ROI-local coords, bin-averaged: p*s points per axis
    gy = (jnp.arange(p * s) + 0.5) / (p * s) - 0.5   # [-0.5, 0.5)
    gx = (jnp.arange(p * s) + 0.5) / (p * s) - 0.5
    ly, lx = jnp.meshgrid(gy, gx, indexing="ij")      # [ps, ps]

    cos_t = jnp.cos(theta)[:, None, None]
    sin_t = jnp.sin(theta)[:, None, None]
    rx = lx[None] * w[:, None, None]
    ry = ly[None] * h[:, None, None]
    x = cx[:, None, None] + rx * cos_t - ry * sin_t   # [N, ps, ps]
    y = cy[:, None, None] + rx * sin_t + ry * cos_t

    # gather per ROI from its batch image
    per_roi_feats = feats[batch_idx]                  # [N, H, W, C]
    sampled = bilinear_sample_nhwc(per_roi_feats, x, y)  # [N, ps, ps, C]
    c = sampled.shape[-1]
    sampled = sampled.reshape(n, p, s, p, s, c)
    return sampled.mean(axis=(2, 4))

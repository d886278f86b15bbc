"""Generic bilinear gather for NHWC images (shared by deformable ops).

Zero-padding semantics outside the image, matching torchvision/detectron2's
bilinear interpolation used by deformable conv and ROIAlign kernels.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample_nhwc(
    img: jnp.ndarray,   # [B, H, W, C]
    x: jnp.ndarray,     # [B, ...] pixel x coords (float, 0..W-1 grid)
    y: jnp.ndarray,     # [B, ...] same shape as x
) -> jnp.ndarray:       # [B, ..., C]
    b, h, w, c = img.shape
    # flat-take idiom: one 2D row-take is ~5x faster than batched
    # take_along_axis on TPU (XLA's vectorized gather path)
    flat = img.reshape(b * h * w, c)
    sample_shape = x.shape[1:]
    x = x.reshape(b, -1)
    y = y.reshape(b, -1)
    boff = jnp.arange(b, dtype=jnp.int32)[:, None] * (h * w)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    rows = []
    wgts = []
    for dx, dy, wgt in (
        (0, 0, (1 - fx) * (1 - fy)),
        (1, 0, fx * (1 - fy)),
        (0, 1, (1 - fx) * fy),
        (1, 1, fx * fy),
    ):
        xi = x0 + dx
        yi = y0 + dy
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = (jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)).astype(
            jnp.int32
        )
        rows.append(boff + idx)
        wgts.append(wgt * valid)

    idx = jnp.stack(rows, -1)                       # [B, N, 4]
    wgt = jnp.stack(wgts, -1)                       # [B, N, 4]
    # in-bounds by construction (clipped y/x, exact batch offsets);
    # "clip" skips jnp.take's fill-mode select — a full extra pass over
    # the gathered rows (see the msda fill-select finding, PERFORMANCE.md)
    g = jnp.take(flat, idx.reshape(-1), axis=0, mode="clip")
    g = g.reshape(b, -1, 4, c)
    out = jnp.einsum("bnkc,bnk->bnc", g, wgt.astype(g.dtype))
    return out.reshape((b,) + sample_shape + (c,))

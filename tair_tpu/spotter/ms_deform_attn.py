"""Multi-scale deformable attention (TPU-native).

The reference's one custom CUDA op (ms_deformable_im2col / col2im,
/root/reference/testr/adet/layers/csrc/DeformAttn/ms_deform_im2col_cuda.cuh:238-1109,
python wrapper /root/reference/testr/adet/layers/ms_deform_attn.py:19-153).

TPU design: the bilinear multi-point gather is expressed as four batched
XLA gathers per feature level with zero-padding masks — identical math to
grid_sample(align_corners=False, padding_mode='zeros') that the CUDA kernel
and the reference's own pure-torch oracle implement. Levels are a static
Python tuple so XLA sees fixed shapes; gradients come from autodiff of the
gather/arithmetic graph (replacing the hand-written col2im atomics with
XLA's scatter-add). A Pallas kernel can be slotted in behind the same
function signature; this XLA formulation is the numerical oracle for it.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def ms_deform_attn_core(
    value: jnp.ndarray,                 # [B, S, H, D]
    spatial_shapes: Sequence[Tuple[int, int]],  # static ((h,w), ...) per level
    sampling_locations: jnp.ndarray,    # [B, Q, H, L, P, 2] normalized [0,1]
    attention_weights: jnp.ndarray,     # [B, Q, H, L, P]
) -> jnp.ndarray:                       # [B, Q, H*D]
    b, s, h, d = value.shape
    _, q, _, n_levels, n_points, _ = sampling_locations.shape
    assert len(spatial_shapes) == n_levels
    assert sum(hh * ww for hh, ww in spatial_shapes) == s

    out = jnp.zeros((b, q, h, d), jnp.float32)
    start = 0
    for lvl, (hl, wl) in enumerate(spatial_shapes):
        v = value[:, start : start + hl * wl]  # [B, hw, H, D]
        start += hl * wl
        v = v.transpose(0, 2, 1, 3)  # [B, H, hw, D]

        loc = sampling_locations[:, :, :, lvl]  # [B, Q, H, P, 2]
        # grid_sample(align_corners=False): pixel centers at (i+0.5)/size
        x = loc[..., 0] * wl - 0.5
        y = loc[..., 1] * hl - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0

        acc = jnp.zeros((b, h, q, n_points, d), jnp.float32)
        for dx, dy, w in (
            (0, 0, (1 - fx) * (1 - fy)),
            (1, 0, fx * (1 - fy)),
            (0, 1, (1 - fx) * fy),
            (1, 1, fx * fy),
        ):
            xi = x0 + dx
            yi = y0 + dy
            valid = (xi >= 0) & (xi < wl) & (yi >= 0) & (yi < hl)
            idx = (
                jnp.clip(yi, 0, hl - 1) * wl + jnp.clip(xi, 0, wl - 1)
            ).astype(jnp.int32)                                # [B, Q, H, P]
            idx = idx.transpose(0, 2, 1, 3).reshape(b, h, q * n_points)
            g = jnp.take_along_axis(v, idx[..., None], axis=2)  # [B,H,QP,D]
            g = g.reshape(b, h, q, n_points, d)
            wm = (w * valid).transpose(0, 2, 1, 3)              # [B,H,Q,P]
            acc = acc + g.astype(jnp.float32) * wm[..., None]

        aw = attention_weights[:, :, :, lvl].transpose(0, 2, 1, 3)  # [B,H,Q,P]
        out = out + jnp.einsum("bhqpd,bhqp->bqhd", acc, aw.astype(jnp.float32))

    return out.reshape(b, q, h * d).astype(value.dtype)


def ms_deform_attn_core_patch(
    value: jnp.ndarray,                 # [B, S, H, D]
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,    # [B, Q, H, L, P, 2] in [0,1]
    attention_weights: jnp.ndarray,     # [B, Q, H, L, P]
) -> jnp.ndarray:
    """Patch-gather variant of ms_deform_attn_core (same math, faster HBM
    traffic): each sample point fetches one contiguous [2, 2, D] patch via
    a single lax.gather instead of four 1-row gathers, so transactions are
    4x larger. Border handling clamps the patch start and zeroes the
    out-of-bounds corner weights (grid_sample zero-padding semantics)."""
    b, s, h, d = value.shape
    _, q, _, n_levels, n_points, _ = sampling_locations.shape

    out = jnp.zeros((b, q, h, d), jnp.float32)
    start = 0
    for lvl, (hl, wl) in enumerate(spatial_shapes):
        v = value[:, start : start + hl * wl]
        start += hl * wl
        # [B, H, Hl, Wl, D]
        v = v.reshape(b, hl, wl, h, d).transpose(0, 3, 1, 2, 4)

        loc = sampling_locations[:, :, :, lvl]  # [B, Q, H, P, 2]
        x = loc[..., 0] * wl - 0.5
        y = loc[..., 1] * hl - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[..., None, None]  # [B,Q,H,P,1,1]
        fy = (y - y0)[..., None, None]

        sx = jnp.clip(x0, 0, max(wl - 2, 0)).astype(jnp.int32)
        sy = jnp.clip(y0, 0, max(hl - 2, 0)).astype(jnp.int32)

        # per-axis weights at the clamped patch positions, zero when the
        # corner is out of bounds (grid_sample zero padding)
        jx = sx[..., None] + jnp.arange(2)  # [B,Q,H,P,2] actual x of patch col
        jy = sy[..., None] + jnp.arange(2)
        wx = jnp.where(
            jx == x0[..., None], 1.0 - fx[..., 0],
            jnp.where(jx == x0[..., None] + 1, fx[..., 0], 0.0),
        )
        wx = wx * ((x0[..., None] + 1 >= 0) & (x0[..., None] <= wl - 1))
        wy = jnp.where(
            jy == y0[..., None], 1.0 - fy[..., 0],
            jnp.where(jy == y0[..., None] + 1, fy[..., 0], 0.0),
        )
        wy = wy * ((y0[..., None] + 1 >= 0) & (y0[..., None] <= hl - 1))
        w2x2 = wy[..., :, None] * wx[..., None, :]  # [B,Q,H,P,2,2]

        # one gather of [2, 2, D] patches: operand [B,H,Hl,Wl,D],
        # indices [B,H,Q*P,2] (y, x starts)
        idx = jnp.stack([sy, sx], -1).transpose(0, 2, 1, 3, 4)  # [B,H,Q,P,2]
        idx = idx.reshape(b, h, q * n_points, 2)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(3, 4, 5),
            collapsed_slice_dims=(),
            start_index_map=(2, 3),
            operand_batching_dims=(0, 1),
            start_indices_batching_dims=(0, 1),
        )
        patches = jax.lax.gather(
            v, idx, dn, slice_sizes=(1, 1, 2, 2, d),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # [B, H, Q*P, 1, 1, 2, 2, D] -> squeeze
        patches = patches.reshape(b, h, q, n_points, 2, 2, d)

        w2x2 = w2x2.transpose(0, 2, 1, 3, 4, 5)  # [B,H,Q,P,2,2]
        aw = attention_weights[:, :, :, lvl].transpose(0, 2, 1, 3)  # [B,H,Q,P]
        # fp32 weights (bilinear fractions need the mantissa); the bf16
        # patches are upcast inside the fused reduction, never materialized
        wgt = (w2x2 * aw[..., None, None]).astype(jnp.float32)
        out = out + jnp.einsum(
            "bhqpyxd,bhqpyx->bqhd", patches, wgt,
            preferred_element_type=jnp.float32,
        )

    return out.reshape(b, q, h * d).astype(value.dtype)


def ms_deform_attn_core_flat(
    value: jnp.ndarray,                 # [B, S, H, D]
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,    # [B, Q, H, L, P, 2] in [0,1]
    attention_weights: jnp.ndarray,     # [B, Q, H, L, P]
    q_chunk: int = 2048,
) -> jnp.ndarray:
    """Flat-take formulation: ALL (level, point, corner) samples become row
    indices into one 2D [B*H*S, D] operand and a single `jnp.take` fetches
    them. Measured ~5-10x faster than batched take_along_axis / sliced
    lax.gather on v5e (XLA lowers the flat 2D row-take to its vectorized
    gather path; the batched forms fall off it). Same math as
    ms_deform_attn_core (grid_sample zero-padding semantics).

    The gathered [_, D=32] intermediate is lane-padded 4x by the TPU layout,
    so long query axes are processed in q_chunk blocks under lax.map to
    bound peak HBM (the encoder's Q=S~9.5k at batch 2 would otherwise cost
    ~2.5 GB per layer)."""
    b, s, h, d = value.shape
    _, q, _, n_levels, n_points, _ = sampling_locations.shape
    assert len(spatial_shapes) == n_levels

    if q > q_chunk:
        pad = (-q) % q_chunk
        locs = jnp.pad(
            sampling_locations, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0), (0, 0))
        )
        wts = jnp.pad(attention_weights, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0)))
        n_chunks = (q + pad) // q_chunk
        locs = locs.reshape(b, n_chunks, q_chunk, h, n_levels, n_points, 2)
        wts = wts.reshape(b, n_chunks, q_chunk, h, n_levels, n_points)
        out = jax.lax.map(
            lambda args: ms_deform_attn_core_flat(
                value, spatial_shapes, args[0], args[1], q_chunk
            ),
            (locs.transpose(1, 0, 2, 3, 4, 5, 6), wts.transpose(1, 0, 2, 3, 4, 5)),
        )  # [n_chunks, B, q_chunk, H*D]
        out = out.transpose(1, 0, 2, 3).reshape(b, q + pad, h * d)
        return out[:, :q]

    v2d = value.transpose(0, 2, 1, 3).reshape(b * h * s, d)

    rows = []
    wgts = []
    start = 0
    for lvl, (hl, wl) in enumerate(spatial_shapes):
        loc = sampling_locations[:, :, :, lvl]  # [B, Q, H, P, 2]
        x = loc[..., 0] * wl - 0.5
        y = loc[..., 1] * hl - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        aw = attention_weights[:, :, :, lvl]  # [B, Q, H, P]
        for dx, dy, wc in (
            (0, 0, (1 - fx) * (1 - fy)),
            (1, 0, fx * (1 - fy)),
            (0, 1, (1 - fx) * fy),
            (1, 1, fx * fy),
        ):
            xi = x0 + dx
            yi = y0 + dy
            valid = (xi >= 0) & (xi < wl) & (yi >= 0) & (yi < hl)
            pos = (
                start
                + jnp.clip(yi, 0, hl - 1) * wl
                + jnp.clip(xi, 0, wl - 1)
            ).astype(jnp.int32)                          # [B, Q, H, P]
            bh = (
                jnp.arange(b)[:, None, None, None] * h
                + jnp.arange(h)[None, None, :, None]
            )
            rows.append(bh * s + pos)
            wgts.append((wc * valid * aw).astype(jnp.float32))
        start += hl * wl

    idx = jnp.stack(rows, axis=-1)    # [B, Q, H, P, L*4]
    wgt = jnp.stack(wgts, axis=-1)    # [B, Q, H, P, L*4]
    # indices are in-bounds by construction (clipped y/x, exact bh offsets):
    # mode="clip" skips jnp.take's default fill path, whose out-of-bounds
    # select materializes as a full extra pass over the gathered tensor
    # (measured 95 ms/img across the decoder cross-attns, round-2 trace)
    g = jnp.take(v2d, idx.reshape(-1), axis=0, mode="clip")
    g = g.reshape(b, q, h, n_points, n_levels * 4, d)
    out = jnp.einsum(
        "bqhpcd,bqhpc->bqhd", g, wgt, preferred_element_type=jnp.float32
    )
    return out.reshape(b, q, h * d).astype(value.dtype)


def patchify_value(
    value: jnp.ndarray,                 # [B, S, H, D]
    spatial_shapes: Sequence[Tuple[int, int]],
) -> jnp.ndarray:                       # [B*H*S, 4*D]
    """Pack each position's 2x2 bilinear neighborhood into one row:
    row(y, x) = [v(y,x), v(y,x+1), v(y+1,x), v(y+1,x+1)] (zeros past the
    border). With D=32 this makes every sample point a single 128-lane
    gather row — no TPU lane padding — instead of four 32-lane rows that
    each get padded 4x."""
    b, s, h, d = value.shape
    vt = value.transpose(0, 2, 1, 3)  # [B, H, S, D]
    pieces = []
    start = 0
    for (hl, wl) in spatial_shapes:
        vl = vt[:, :, start : start + hl * wl].reshape(b, h, hl, wl, d)
        start += hl * wl
        pad = ((0, 0), (0, 0), (0, 0), (0, 0), (0, 0))
        v01 = jnp.pad(vl[:, :, :, 1:], pad[:3] + ((0, 1), (0, 0)))
        v10 = jnp.pad(vl[:, :, 1:], pad[:2] + ((0, 1), (0, 0), (0, 0)))
        v11 = jnp.pad(vl[:, :, 1:, 1:], pad[:2] + ((0, 1), (0, 1), (0, 0)))
        pieces.append(
            jnp.concatenate([vl, v01, v10, v11], -1).reshape(b, h, hl * wl, 4 * d)
        )
    return jnp.concatenate(pieces, 2).reshape(b * h * s, 4 * d)


def patchify_value_roll(
    value: jnp.ndarray,                 # [B, S, H, D]
    spatial_shapes: Sequence[Tuple[int, int]],
) -> jnp.ndarray:                       # [B*H*S, 4*D]
    """Lane-aligned construction of the same corner-major packed table as
    `patchify_value`: the x/y-shifted corner copies are static LANE-OFFSET
    slices of the spatially-flattened [B, H, hl*wl*D] view, so every input
    read streams full 128-lane tiles. `patchify_value` builds the shifts by
    slicing the [B, H, hl, wl, D]-shaped view whose D=32 minor dim is
    lane-padded 4x on TPU — its pack fusions read ~4x the bytes and cost
    187 ms/img across the 18 msda modules (round-2 op trace).

    Positions whose packed row can never be gathered (x == wl-1 or
    y == hl-1: patch starts are clipped to wl-2/hl-2 by every core) hold
    wrapped neighbors instead of zeros — bit-identical outputs for every
    reachable row, parity-tested vs the oracle."""
    b, s, h, d = value.shape
    vt = value.transpose(0, 2, 1, 3)  # [B, H, S, D]
    pieces = []
    start = 0
    for (hl, wl) in spatial_shapes:
        n = hl * wl
        z = vt[:, :, start : start + n].reshape(b, h, n * d)
        start += n
        zpad = jnp.concatenate(
            [z, jnp.zeros((b, h, (wl + 1) * d), z.dtype)], -1
        )
        corners = [z.reshape(b, h, n, d)] + [
            zpad[:, :, k : k + n * d].reshape(b, h, n, d)
            for k in (d, wl * d, (wl + 1) * d)  # (0,1), (1,0), (1,1)
        ]
        pieces.append(jnp.concatenate(corners, -1))
    return jnp.concatenate(pieces, 2).reshape(b * h * s, 4 * d)


def patchify_value_conv(
    value: jnp.ndarray,                 # [B, S, H, D]
    spatial_shapes: Sequence[Tuple[int, int]],
) -> jnp.ndarray:                       # [B*H*S, D*4] channel-major
    """2x2-neighborhood packing as ONE im2col conv per level
    (`conv_general_dilated_patches` -> an MXU matmul) instead of the 4-way
    lane-shifted concat of `patchify_value`.

    Lane layout is CHANNEL-MAJOR: lane = c*4 + corner, corner order
    (0,0),(0,1),(1,0),(1,1) — the dilated-patches native order. The matching
    corner-weight spread/segment matrices differ from the corner-major
    layout of `patchify_value` (see ms_deform_attn_core_flatpatch).

    Measured on v5e: NOT faster (the im2col conv pays its own relayouts:
    full core 6.0ms vs 2.8ms concat at encoder shapes) — kept as the
    measured alternative; `patchify="concat"` is the default."""
    b, s, h, d = value.shape
    vt = value.transpose(0, 2, 1, 3)  # [B, H, S, D]
    pieces = []
    start = 0
    for (hl, wl) in spatial_shapes:
        vl = vt[:, :, start : start + hl * wl].reshape(b * h, hl, wl, d)
        start += hl * wl
        p = jax.lax.conv_general_dilated_patches(
            vl, filter_shape=(2, 2), window_strides=(1, 1),
            padding=((0, 1), (0, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # [BH, hl, wl, D*4] (c-major)
        pieces.append(p.reshape(b, h, hl * wl, 4 * d))
    return jnp.concatenate(pieces, 2).reshape(b * h * s, 4 * d)


def ms_deform_attn_core_flatpatch(
    value: jnp.ndarray,                 # [B, S, H, D]
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,    # [B, Q, H, L, P, 2] in [0,1]
    attention_weights: jnp.ndarray,     # [B, Q, H, L, P]
    q_chunk: int = 2048,
    value_patched: jnp.ndarray | None = None,
    reduce: str = "mxu",
    patchify: str = "concat",
) -> jnp.ndarray:                       # [B, Q, H*D]
    """Patchified flat-take: ONE [4*D]-wide row-take per sample point (the
    2x2 bilinear patch pre-packed by patchify_value) instead of four [D]-wide
    corner takes. Same grid_sample zero-padding math as ms_deform_attn_core;
    border handling clamps the patch start and matches per-corner weights to
    the actual patch coordinates (cf. ms_deform_attn_core_patch).

    For D=32/bf16 the gathered rows are exactly 128 lanes, so the take is
    unpadded — 4x less gather traffic than ms_deform_attn_core_flat.

    reduce="mxu": the corner weighting/reduction stays in the gathered
    128-lane layout — corner weights are broadcast lane-wise with a static
    [4, 4D] matmul, and the 4-corner segment sum is a static [4D, D] matmul —
    so no reshape ever splits the lane dimension back to D (which would
    re-introduce the 4x padding). reduce="einsum" is the straightforward
    contraction, kept as a reference."""
    b, s, h, d = value.shape
    _, q, _, n_levels, n_points, _ = sampling_locations.shape
    assert len(spatial_shapes) == n_levels

    if value_patched is not None:
        vp = value_patched
    elif patchify == "pallas":
        from ..ops.patchify import patchify_value_pallas

        vp = patchify_value_pallas(value, spatial_shapes)
    elif patchify == "conv":
        vp = patchify_value_conv(value, spatial_shapes)
    elif patchify == "roll":
        vp = patchify_value_roll(value, spatial_shapes)
    else:
        vp = patchify_value(value, spatial_shapes)

    if q > q_chunk:
        pad = (-q) % q_chunk
        locs = jnp.pad(
            sampling_locations, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0), (0, 0))
        )
        wts = jnp.pad(attention_weights, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0)))
        n_chunks = (q + pad) // q_chunk
        locs = locs.reshape(b, n_chunks, q_chunk, h, n_levels, n_points, 2)
        wts = wts.reshape(b, n_chunks, q_chunk, h, n_levels, n_points)
        out = jax.lax.map(
            lambda args: ms_deform_attn_core_flatpatch(
                value, spatial_shapes, args[0], args[1], q_chunk, vp, reduce,
                patchify,
            ),
            (locs.transpose(1, 0, 2, 3, 4, 5, 6), wts.transpose(1, 0, 2, 3, 4, 5)),
        )  # [n_chunks, B, q_chunk, H*D]
        out = out.transpose(1, 0, 2, 3).reshape(b, q + pad, h * d)
        return out[:, :q]

    bh = (
        jnp.arange(b)[:, None, None, None] * h
        + jnp.arange(h)[None, None, :, None]
    )  # [B, 1, H, 1]

    rows = []
    wgts = []
    start = 0
    for lvl, (hl, wl) in enumerate(spatial_shapes):
        loc = sampling_locations[:, :, :, lvl]  # [B, Q, H, P, 2]
        x = loc[..., 0] * wl - 0.5
        y = loc[..., 1] * hl - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        sx = jnp.clip(x0, 0, max(wl - 2, 0)).astype(jnp.int32)
        sy = jnp.clip(y0, 0, max(hl - 2, 0)).astype(jnp.int32)

        # per-axis corner weights at the clamped patch positions; zero when
        # the corner is out of bounds (grid_sample zero padding)
        jx = sx[..., None] + jnp.arange(2)  # [B,Q,H,P,2] actual patch cols
        jy = sy[..., None] + jnp.arange(2)
        wx = jnp.where(
            jx == x0[..., None], 1.0 - fx[..., None],
            jnp.where(jx == x0[..., None] + 1, fx[..., None], 0.0),
        )
        wx = wx * ((x0[..., None] + 1 >= 0) & (x0[..., None] <= wl - 1))
        wy = jnp.where(
            jy == y0[..., None], 1.0 - fy[..., None],
            jnp.where(jy == y0[..., None] + 1, fy[..., None], 0.0),
        )
        wy = wy * ((y0[..., None] + 1 >= 0) & (y0[..., None] <= hl - 1))
        # corner order matches patchify rows: (0,0), (0,1), (1,0), (1,1)
        w4 = (wy[..., :, None] * wx[..., None, :]).reshape(
            b, q, h, n_points, 4
        )

        aw = attention_weights[:, :, :, lvl]  # [B, Q, H, P]
        rows.append(bh * s + start + sy * wl + sx)
        wgts.append((w4 * aw[..., None]).astype(jnp.float32))
        start += hl * wl

    idx = jnp.stack(rows, axis=-1)    # [B, Q, H, P, L]
    wgt = jnp.stack(wgts, axis=-2)    # [B, Q, H, P, L, 4]
    # in-bounds by construction; "clip" skips the fill-mode select pass
    g = jnp.take(vp, idx.reshape(-1), axis=0, mode="clip")
    cmajor = patchify == "conv"  # lane = c*4+corner vs corner*d+c
    if reduce == "einsum":
        if cmajor:
            g = g.reshape(b, q, h, n_points, n_levels, d, 4)
            out = jnp.einsum(
                "bqhpldc,bqhplc->bqhd", g, wgt,
                preferred_element_type=jnp.float32,
            )
        else:
            g = g.reshape(b, q, h, n_points, n_levels, 4, d)
            out = jnp.einsum(
                "bqhplcd,bqhplc->bqhd", g, wgt,
                preferred_element_type=jnp.float32,
            )
    else:
        k = n_points * n_levels
        g = g.reshape(b, q, h, k, 4 * d)
        eye4 = jnp.eye(4, dtype=g.dtype)
        eyed = jnp.eye(d, dtype=g.dtype)
        if cmajor:
            # lane j weights corner j%4; lane j sums into channel j//4
            spread = jnp.tile(eye4, (1, d))           # [4, 4d]
            seg = jnp.repeat(eyed, 4, axis=0)         # [4d, d]
        else:
            # lane j weights corner j//d; lane j sums into channel j%d
            spread = jnp.repeat(eye4, d, axis=1)      # [4, 4d]
            seg = jnp.tile(eyed, (4, 1))              # [4d, d]
        # broadcast each corner weight over its lanes: [.., 4] @ [4, 4d]
        w_lanes = jax.lax.dot_general(
            wgt.reshape(b, q, h, k, 4).astype(g.dtype), spread,
            (((4,), (0,)), ((), ())), preferred_element_type=g.dtype,
        )  # [B, Q, H, K, 4d]
        # segment-sum the 4 corners (and K) with a static [4d, d] matmul
        out = jnp.einsum(
            "bqhkC,Cd->bqhd", g * w_lanes, seg,
            preferred_element_type=jnp.float32,
        )
    return out.reshape(b, q, h * d).astype(value.dtype)


def _lane_consts(spatial_shapes, n_heads: int, n_points: int):
    """Per-lane constant vectors for the packed core; lane order (h, l, p),
    p fastest. Returns dict of [H*L*P] numpy arrays."""
    L = len(spatial_shapes)
    lanes = n_heads * L * n_points
    lvl = np.zeros((lanes,), np.int32)
    h_of = np.zeros((lanes,), np.int32)
    for h in range(n_heads):
        for l in range(L):
            s = (h * L + l) * n_points
            lvl[s : s + n_points] = l
            h_of[s : s + n_points] = h
    wl = np.asarray([w for (_, w) in spatial_shapes], np.float32)[lvl]
    hl = np.asarray([h_ for (h_, _) in spatial_shapes], np.float32)[lvl]
    starts = np.cumsum([0] + [h_ * w for (h_, w) in spatial_shapes])[:-1]
    start = starts.astype(np.int32)[lvl]
    return dict(lvl=lvl, h=h_of, wl=wl, hl=hl, start=start)


def ms_deform_attn_core_flatlanes(
    value: jnp.ndarray,                 # [B, S, H, D]
    spatial_shapes: Sequence[Tuple[int, int]],
    locx: jnp.ndarray,                  # [B, Q, H*L*P] packed, lane=(h,l,p)
    locy: jnp.ndarray,                  # [B, Q, H*L*P]
    attn: jnp.ndarray,                  # [B, Q, H*L*P] softmaxed per (h)
    value_patched: jnp.ndarray | None = None,
    q_chunk: int = 16384,
    reduce: str = "mxu",
    patchify: str = "concat",
) -> jnp.ndarray:                       # [B, Q, H*D]
    """Lane-packed flatpatch core: every per-sample-point tensor keeps the
    (head, level, point) axis folded to exactly H*L*P lanes (128 at TESTR
    geometry), so NOTHING in the index/weight math is lane-padded. The
    per-level Python loop of the other cores becomes per-LANE constant
    vectors (wl/hl/start of each lane's level).

    Measured on v5e (scripts/enc_layer_ab.py): NO speedup over the
    flatpatch path inside the module (6.04 vs 6.03 ms at encoder shapes) —
    XLA already fuses the [..,2]/[..,4]-minor boundary tensors away, so the
    padding they would cost never materializes. (The isolated-core number,
    2.8ms, under-counts: with loop-invariant locations the index math gets
    hoisted out of the timing loop.) Kept as the packed-layout seam and a
    documented negative result; `flatpatch` remains the default.
    Same grid_sample zero-padding math; parity-tested vs the oracle."""
    b, s, h, d = value.shape
    _, q, lanes = locx.shape
    L = len(spatial_shapes)
    p = lanes // (h * L)

    c = _lane_consts(spatial_shapes, h, p)
    wl = jnp.asarray(c["wl"])
    hlv = jnp.asarray(c["hl"])
    start = jnp.asarray(c["start"])
    h_vec = jnp.asarray(c["h"])

    if value_patched is not None:
        vp = value_patched
    elif patchify == "roll":
        vp = patchify_value_roll(value, spatial_shapes)
    else:
        vp = patchify_value(value, spatial_shapes)

    if q > q_chunk:
        pad = (-q) % q_chunk
        lx = jnp.pad(locx, ((0, 0), (0, pad), (0, 0)))
        ly = jnp.pad(locy, ((0, 0), (0, pad), (0, 0)))
        aw_p = jnp.pad(attn, ((0, 0), (0, pad), (0, 0)))
        n_chunks = (q + pad) // q_chunk
        out = jax.lax.map(
            lambda args: ms_deform_attn_core_flatlanes(
                value, spatial_shapes, args[0], args[1], args[2], vp, q_chunk,
                reduce,
            ),
            (
                lx.reshape(b, n_chunks, q_chunk, lanes).transpose(1, 0, 2, 3),
                ly.reshape(b, n_chunks, q_chunk, lanes).transpose(1, 0, 2, 3),
                aw_p.reshape(b, n_chunks, q_chunk, lanes).transpose(1, 0, 2, 3),
            ),
        )
        out = out.transpose(1, 0, 2, 3).reshape(b, q + pad, h * d)
        return out[:, :q]

    x = locx.astype(jnp.float32) * wl - 0.5
    y = locy.astype(jnp.float32) * hlv - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    sx = jnp.clip(x0, 0.0, jnp.maximum(wl - 2.0, 0.0))
    sy = jnp.clip(y0, 0.0, jnp.maximum(hlv - 2.0, 0.0))

    # per-axis weights at the clamped patch columns jx = sx + {0, 1}
    # (exactly the flatpatch logic, jx==x0 -> 1-fx, jx==x0+1 -> fx, masked
    # when both true corners fall outside the grid_sample zero-padding)
    def axis_weights(s0, v0, fv, size):
        m = ((v0 + 1.0 >= 0.0) & (v0 <= size - 1.0)).astype(jnp.float32)
        left = (
            jnp.where(s0 == v0, 1.0 - fv, 0.0)
            + jnp.where(s0 == v0 + 1.0, fv, 0.0)
        ) * m
        right = (
            jnp.where(s0 + 1.0 == v0, 1.0 - fv, 0.0)
            + jnp.where(s0 + 1.0 == v0 + 1.0, fv, 0.0)
        ) * m
        return left, right

    wxl, wxr = axis_weights(sx, x0, fx, wl)
    wyl, wyr = axis_weights(sy, y0, fy, hlv)

    aw = attn.astype(jnp.float32)
    # per-corner combined weights, still packed [B, Q, lanes]
    w00 = wxl * wyl * aw
    w01 = wxr * wyl * aw
    w10 = wxl * wyr * aw
    w11 = wxr * wyr * aw

    rows = (
        (jnp.arange(b, dtype=jnp.int32)[:, None, None] * h + h_vec) * s
        + start
        + sy.astype(jnp.int32) * wl.astype(jnp.int32)
        + sx.astype(jnp.int32)
    )  # [B, Q, lanes]

    # in-bounds by construction (sy/sx clipped to the patch-start range,
    # bh/start offsets exact); "clip" skips jnp.take's fill-mode select,
    # which costs a full extra pass over the gathered rows (95 ms/img
    # across the 12 decoder cross-attns in the round-2 op trace)
    g = jnp.take(vp, rows.reshape(-1), axis=0, mode="clip")  # [B*Q*lanes, 4D]
    k = L * p

    if reduce in ("pallas", "pallas_interpret"):
        # Single-pass Pallas consume of the gather output: corner weighting,
        # corner sum, and the K=(level, point) reduce all happen in VMEM —
        # no g-sized w_lanes / g*w intermediates round-trip HBM (they cost
        # ~590 ms of the 2.8 s/image in the XLA "mxu" path; see
        # ops/msda_reduce.py and docs/PERFORMANCE.md).
        from ..ops.msda_reduce import msda_corner_reduce

        out = msda_corner_reduce(
            g,
            w00.reshape(b * q, lanes),
            w01.reshape(b * q, lanes),
            w10.reshape(b * q, lanes),
            w11.reshape(b * q, lanes),
            k,
            32,
            reduce == "pallas_interpret",
        )  # [B*Q*H, D] f32
        return out.reshape(b, q, h * d).astype(value.dtype)

    g = g.reshape(b, q, h, k, 4 * d)               # lane split: sublanes only

    if reduce == "fused":
        # One XLA reduce fusion: corner-mask select + multiply + sum over
        # (level, point), with NO [B*Q*lanes, 4D] intermediate. The "mxu"
        # path builds w_lanes with a spread MATMUL, and dot operands cannot
        # fuse with their producers on XLA-TPU — so g*w_lanes materializes
        # (310 MB/layer at encoder shapes: the 0.95 ms broadcast_select
        # fusion in the round-2 trace, scripts/trace_diff.py). Building
        # w_lanes from static corner masks keeps the whole chain
        # elementwise, so the k-reduce fuses directly onto the gather
        # output; only the tiny [4D, D] segment matmul stays a dot, reading
        # the already-reduced [B, Q, H, 4D] tensor.
        # MEASURED SLOWER than "mxu" on v5e (6.13 vs 5.25 ms/module at
        # encoder shapes, scripts/reduce_ab.py): XLA's k-reduce fusion
        # codegen costs more than the g*w HBM round-trip it avoids. Kept as
        # a documented negative result / future-compiler seam.
        cmask = np.zeros((4, 4 * d), np.float32)
        for corner in range(4):
            cmask[corner, corner * d : (corner + 1) * d] = 1.0
        cm = jnp.asarray(cmask)
        w_l = (
            w00[..., None] * cm[0]
            + w01[..., None] * cm[1]
            + w10[..., None] * cm[2]
            + w11[..., None] * cm[3]
        )  # [B, Q, lanes, 4D] — virtual: consumed inside the reduce fusion
        red = (
            g.astype(jnp.float32) * w_l.reshape(b, q, h, k, 4 * d)
        ).sum(axis=3)                               # [B, Q, H, 4D]
        seg = jnp.tile(jnp.eye(d, dtype=jnp.float32), (4, 1))  # [4d, d]
        out = jnp.einsum(
            "bqhC,Cd->bqhd", red, seg, preferred_element_type=jnp.float32
        )
        return out.reshape(b, q, h * d).astype(value.dtype)

    if reduce == "mxu":
        # flatpatch's corner reduction: spread each corner weight over its D
        # lanes with a static [4, 4D] matmul and segment-sum corners+K with a
        # static [4D, D] matmul. Measured 0.74 vs 1.50 ms/layer for the
        # broadcast-mask w_lanes build at encoder shapes (scripts/enc_trace.py
        # 2026-08-17) — combining this reduce with the packed index path
        # (no [..,P,L]-minor relayout copies) is the best of both cores.
        w4 = jnp.stack([w00, w01, w10, w11], axis=-1).reshape(b, q, h, k, 4)
        spread = jnp.repeat(jnp.eye(4, dtype=g.dtype), d, axis=1)  # [4, 4d]
        seg = jnp.tile(jnp.eye(d, dtype=jnp.float32), (4, 1))      # [4d, d]
        w_lanes = jax.lax.dot_general(
            w4.astype(g.dtype), spread,
            (((4,), (0,)), ((), ())), preferred_element_type=g.dtype,
        )  # [B, Q, H, K, 4d]
        out = jnp.einsum(
            "bqhkC,Cd->bqhd", g * w_lanes, seg,
            preferred_element_type=jnp.float32,
        )
        return out.reshape(b, q, h * d).astype(value.dtype)

    # w_lanes [B,Q,H,K,4D] assembled from the packed per-corner factors with
    # constant lane masks (corner-major layout: lane2 = corner*D + c)
    mask = np.zeros((4, 4 * d), np.float32)
    for corner in range(4):
        mask[corner, corner * d : (corner + 1) * d] = 1.0
    masks = jnp.asarray(mask)
    w_lanes = (
        w00.reshape(b, q, h, k)[..., None] * masks[0]
        + w01.reshape(b, q, h, k)[..., None] * masks[1]
        + w10.reshape(b, q, h, k)[..., None] * masks[2]
        + w11.reshape(b, q, h, k)[..., None] * masks[3]
    )
    seg = jnp.tile(jnp.eye(d, dtype=jnp.float32), (4, 1))  # [4d, d]
    out = jnp.einsum(
        "bqhkC,Cd->bqhd",
        g.astype(jnp.float32) * w_lanes,
        seg,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, q, h * d).astype(value.dtype)


def directional_bias_init(n_heads: int, n_levels: int, n_points: int) -> np.ndarray:
    """Deformable-DETR's sampling-offset bias init: heads point at compass
    directions, points at increasing radii (ms_deform_attn.py:101-110)."""
    thetas = np.arange(n_heads, dtype=np.float64) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # [H, 2]
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1
    return grid.reshape(-1).astype(np.float32)


class MSDeformAttn(nn.Module):
    """Deformable attention module: offsets/weights from query, gather+reduce.

    __call__(query [B,Q,C], reference_points [B,Q,L,2|4],
             value_flatten [B,S,C], spatial_shapes static) -> [B,Q,C]
    """

    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    dtype: Dtype = jnp.float32
    # gather core: "flat" wins at small Q (decoder cross-attn; the patchify
    # build is not amortized there), "flatpatch" wins at encoder shapes
    # (Q=S~9.5k) where the unpadded 128-lane rows cut gather traffic 4x.
    core: str = "flat"
    # corner reduction of the flatlanes core: "mxu" (spread/segment matmuls,
    # the best pure-XLA formulation) vs "pallas" (single-pass VMEM kernel,
    # ops/msda_reduce.py — measured SLOWER on v5e: 8.36 vs 5.13 ms/module)
    # vs "fused" / "mask" (documented negative results). "auto" resolves to
    # "mxu" everywhere until a Pallas variant measures faster on the chip
    # ("pallas_interpret" runs the kernel in interpret mode for CPU tests).
    # Measured on v5e: see docs/PERFORMANCE.md round-2 table.
    reduce_mode: str = "auto"
    # packed-table construction: "concat" (the D-minor pad/concat; DEFAULT)
    # vs "roll" (lane-aligned static-slice shifts: wins ISOLATED — 0.282 vs
    # 0.358 ms/pack, floor 0.243, scripts/pack_only_ab.py — but LOSES the
    # full loop, 0.394 vs 0.402 img/s/chip median-of-5: the flat [B,H,S*D]
    # view relayouts its producer/consumers by more than the pack saves) vs
    # "conv"/"pallas" (measured negative, kept). See patchify_value_roll.
    patchify: str = "concat"
    q_chunk: int = 2048

    @nn.compact
    def __call__(self, query, reference_points, value_flatten, spatial_shapes):
        b, q, _ = query.shape
        s = value_flatten.shape[1]
        h, l, p = self.n_heads, self.n_levels, self.n_points
        d = self.d_model // h

        value = nn.Dense(
            self.d_model, dtype=self.dtype, param_dtype=jnp.float32, name="value_proj"
        )(value_flatten).reshape(b, s, h, d)

        offsets = nn.Dense(
            h * l * p * 2,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype: jnp.asarray(
                directional_bias_init(h, l, p), dtype
            ),
            name="sampling_offsets",
        )(query).reshape(b, q, h, l, p, 2)

        attn = nn.Dense(
            h * l * p,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.zeros,
            name="attention_weights",
        )(query).reshape(b, q, h, l * p)
        attn = jax.nn.softmax(attn, axis=-1).reshape(b, q, h, l, p)

        if self.core == "flatlanes":
            # packed path: all per-point tensors stay [B, Q, H*L*P] (128
            # lanes at TESTR geometry) — no [..,2]/[..,P]-minor tensors are
            # ever materialized (those are 32-64x lane-padded on TPU)
            lanes = h * l * p
            consts = _lane_consts(spatial_shapes, h, p)
            off_flat = offsets.reshape(b, q, lanes * 2)
            offx = off_flat[..., 0::2]  # Dense lanes are (h,l,p,2), xy minor
            offy = off_flat[..., 1::2]
            attn_p = attn.reshape(b, q, lanes)

            # level-broadcast by MXU matmul with a [L, lanes] one-hot (no
            # relayout, unlike repeat/tile on lane dims)
            m_lvl = np.zeros((l, lanes), np.float32)
            m_lvl[consts["lvl"], np.arange(lanes)] = 1.0
            m_lvl = jnp.asarray(m_lvl)

            def lanes_of(v):  # [B, Q, L] -> [B, Q, lanes]
                return jax.lax.dot_general(
                    v.astype(jnp.float32), m_lvl,
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            inv_wl = jnp.asarray(1.0 / consts["wl"])
            inv_hl = jnp.asarray(1.0 / consts["hl"])
            offx = offx.astype(jnp.float32)
            offy = offy.astype(jnp.float32)
            if reference_points.shape[-1] == 2:
                locx = lanes_of(reference_points[..., 0]) + offx * inv_wl
                locy = lanes_of(reference_points[..., 1]) + offy * inv_hl
            else:  # cxcywh reference boxes
                locx = lanes_of(reference_points[..., 0]) + (
                    offx / p * lanes_of(reference_points[..., 2]) * 0.5
                )
                locy = lanes_of(reference_points[..., 1]) + (
                    offy / p * lanes_of(reference_points[..., 3]) * 0.5
                )

            reduce = self.reduce_mode
            if reduce == "auto":
                # "mxu" until a Pallas reduce variant measures faster on the
                # chip: the bcast kernel LOST its A/B (8.36 vs 5.13 ms/module
                # at encoder shapes — the lane->sublane weight relayout and a
                # ~196 GB/s pallas streaming ceiling; scripts/msda_kernel_lab
                # and docs/PERFORMANCE.md round-2 notes)
                reduce = "mxu"
            out = ms_deform_attn_core_flatlanes(
                value, spatial_shapes, locx, locy, attn_p,
                q_chunk=self.q_chunk, reduce=reduce, patchify=self.patchify,
            )
            return nn.Dense(
                self.d_model, dtype=self.dtype, param_dtype=jnp.float32,
                name="output_proj",
            )(out)

        sizes = jnp.asarray(
            [[w_, h_] for (h_, w_) in spatial_shapes], jnp.float32
        )  # [L, 2] as (w, h)
        if reference_points.shape[-1] == 2:
            loc = (
                reference_points[:, :, None, :, None, :]
                + offsets / sizes[None, None, None, :, None, :]
            )
        else:  # cxcywh reference boxes
            loc = (
                reference_points[:, :, None, :, None, :2]
                + offsets / p * reference_points[:, :, None, :, None, 2:] * 0.5
            )

        # flat-take formulations: 3.5x faster than the batched row gather on
        # v5e (same math; parity-tested against the oracle); see `core` doc
        core_fn = {
            "flat": ms_deform_attn_core_flat,
            "flatpatch": ms_deform_attn_core_flatpatch,
        }[self.core]
        out = core_fn(value, spatial_shapes, loc, attn, q_chunk=self.q_chunk)
        return nn.Dense(
            self.d_model, dtype=self.dtype, param_dtype=jnp.float32, name="output_proj"
        )(out)

"""Pallas kernel: 2x2-neighborhood row packing for ms-deform-attn.

`patchify_value` (spotter/ms_deform_attn.py) packs each spatial position's
bilinear neighborhood [v(y,x), v(y,x+1), v(y+1,x), v(y+1,x+1)] into one
128-lane row. In XLA that is a 4-way lane-shifted concatenate — measured
1.7ms at encoder shapes on v5e for ~24MB of traffic (a chain of relayout
ops). Here the packing runs as one VMEM-resident kernel per level: the
shifted copies are sublane rolls of the level block and the border zeros
are iota masks, so the whole thing is 4 masked stores at static lane
offsets. Backward = the transposed shift-and-add, expressed in plain XLA
(cheap, and only the training path needs it).

Measured on v5e (scripts/msda_ab5.py): the kernel in isolation is slightly
faster than the XLA concat (1.58 vs 1.74 ms), but inside the full flatpatch
core it LOSES (5.9 vs 2.8 ms) — the pallas_call is a fusion barrier, while
XLA fuses the concat-packing into the downstream row-take. The concat path
therefore stays the production default (`patchify="concat"`); this kernel is
kept as the measured alternative and as the packing seam for future
hardware where the fusion trade-off flips.

Layout contract matches `patchify_value` exactly (corner-major lanes:
corner*D + c, corners in (0,0),(0,1),(1,0),(1,1) order), so the flatpatch
core consumes either interchangeably (parity test: tests/test_patchify.py).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _patchify_level_kernel(v_ref, o_ref, *, hl: int, wl: int, d: int):
    """v_ref [hl*wl, D] -> o_ref [hl*wl, 4D] for one (b*h) slice."""
    v = v_ref[:]
    s = hl * wl
    row = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)
    x = row % wl
    y = row // wl
    not_last_x = (x < wl - 1).astype(v.dtype)
    not_last_y = (y < hl - 1).astype(v.dtype)

    def shift_up(a, n):
        # rows i -> a[i+n], zero-filled at the bottom (static n)
        return jnp.concatenate(
            [a[n:], jnp.zeros((n, a.shape[1]), a.dtype)], axis=0
        )

    o_ref[:, 0 * d : 1 * d] = v
    o_ref[:, 1 * d : 2 * d] = shift_up(v, 1) * not_last_x
    o_ref[:, 2 * d : 3 * d] = shift_up(v, wl) * not_last_y
    o_ref[:, 3 * d : 4 * d] = shift_up(v, wl + 1) * (not_last_x * not_last_y)


def _patchify_level_pallas(
    vl: jnp.ndarray, hl: int, wl: int, interpret: bool
) -> jnp.ndarray:
    """vl [BH, hl*wl, D] -> [BH, hl*wl, 4D]."""
    bh, s, d = vl.shape
    mem = {} if interpret else {"memory_space": pltpu.VMEM}
    kernel = functools.partial(_patchify_level_kernel, hl=hl, wl=wl, d=d)
    return pl.pallas_call(
        kernel,
        grid=(bh,),
        in_specs=[pl.BlockSpec((None, s, d), lambda i: (i, 0, 0), **mem)],
        out_specs=pl.BlockSpec((None, s, 4 * d), lambda i: (i, 0, 0), **mem),
        out_shape=jax.ShapeDtypeStruct((bh, s, 4 * d), vl.dtype),
        interpret=interpret,
    )(vl)


def _patchify_fwd_impl(value, spatial_shapes, interpret):
    b, s, h, d = value.shape
    vt = value.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    pieces = []
    start = 0
    for (hl, wl) in spatial_shapes:
        vl = vt[:, start : start + hl * wl]
        start += hl * wl
        pieces.append(_patchify_level_pallas(vl, hl, wl, interpret))
    return jnp.concatenate(pieces, 1).reshape(b * h * s, 4 * d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def patchify_value_pallas(
    value: jnp.ndarray,                 # [B, S, H, D]
    spatial_shapes: Sequence[Tuple[int, int]],
    interpret: bool = False,
) -> jnp.ndarray:                       # [B*H*S, 4*D]
    return _patchify_fwd_impl(value, spatial_shapes, interpret)


def _fwd(value, spatial_shapes, interpret):
    return _patchify_fwd_impl(value, spatial_shapes, interpret), value.shape


def _bwd(spatial_shapes, interpret, res, g):
    # transpose of "read 4 shifted copies" = "add back 4 shifted slices";
    # plain XLA (training path only)
    b, s, h, d = res

    g = g.reshape(b, h, s, 4 * d)
    out = jnp.zeros((b, h, s, d), jnp.float32)
    start = 0
    for (hl, wl) in spatial_shapes:
        gl = g[:, :, start : start + hl * wl].reshape(b, h, hl, wl, 4 * d)
        acc = gl[..., 0 * d : 1 * d].astype(jnp.float32)

        def shift_down(a, dy, dx):
            # corner (dy,dx) read v[y+dy, x+dx]: its cotangent flows back to
            # (y+dy, x+dx), i.e. shifted down/right with a zeroed lead edge
            return jnp.pad(
                a[:, :, : hl - dy if dy else hl, : wl - dx if dx else wl],
                ((0, 0), (0, 0), (dy, 0), (dx, 0), (0, 0)),
            )

        acc = acc + shift_down(gl[..., 1 * d : 2 * d].astype(jnp.float32), 0, 1)
        acc = acc + shift_down(gl[..., 2 * d : 3 * d].astype(jnp.float32), 1, 0)
        acc = acc + shift_down(gl[..., 3 * d : 4 * d].astype(jnp.float32), 1, 1)
        out = out.at[:, :, start : start + hl * wl].set(
            acc.reshape(b, h, hl * wl, d)
        )
        start += hl * wl
    # cotangent dtype follows the primal (the kernel preserves dtype)
    return (out.transpose(0, 2, 1, 3).astype(g.dtype),)


patchify_value_pallas.defvjp(_fwd, _bwd)

"""Tiled VAE encode/decode for large images.

Capability parity with /root/reference/terediff/utils/tilevae/tilevae.py
(task-queue tiled VAE with cross-tile GroupNorm statistics). TPU redesign:
tiles are processed as ONE batched call (batch dim = tiles, static shapes,
shardable over the mesh), overlapping borders blended by a linear fade, and
— like the reference's explicit cross-tile statistics estimation
(tilevae.py:307-579) — GroupNorm statistics pool across the tile-batch axis
(models/layers.gn_stats_over_batch), which in this batched formulation is a
one-context-manager change instead of a task queue. Measured on 1024^2
non-stationary content with the tiny VAE (tests/test_tilevae_seam.py): the
blend alone leaves a per-tile stats shift (mean |Δz| ≈ 11% of the z-range
vs untiled); cross-tile GN removes most of it — see docs/PERFORMANCE.md
"Tiled VAE seams". NaN tripwire retained (tilevae.py:62-69).
"""

from __future__ import annotations

import contextlib
from typing import Callable

import jax
import jax.numpy as jnp

from ..models.layers import gn_stats_over_batch
from ..tiling import merge_with_overlap, split_with_overlap


class NansException(Exception):
    pass


def _check_nans(x: jnp.ndarray, where: str) -> None:
    if bool(jnp.isnan(x).any()):
        raise NansException(f"NaNs produced in {where}")


def tiled_apply(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    image: jnp.ndarray,     # [B, H, W, C]
    tile: int,
    overlap: int,
    out_scale_num: int,     # output size = input * num / den (e.g. 1/8 encode)
    out_scale_den: int,
    check_nans: bool = True,
    cross_tile_gn: bool = False,
) -> jnp.ndarray:
    """Apply an image->image function tile-wise with blend-merge.

    fn maps [N, tile, tile, C] -> [N, tile*num/den, tile*num/den, C'].
    cross_tile_gn: pool GroupNorm statistics across the tile axis (only
    valid when fn's batch dim carries tiles of one image, as here).
    """
    b = image.shape[0]
    outs = []
    ctx = gn_stats_over_batch if cross_tile_gn else contextlib.nullcontext
    for i in range(b):
        tiles = split_with_overlap(image[i], tile, overlap)
        with ctx():
            out_tiles = fn(tiles)
        if check_nans:
            _check_nans(out_tiles, "tiled_apply")
        out_tile_size = tile * out_scale_num // out_scale_den
        out_overlap = max(1, overlap * out_scale_num // out_scale_den)
        merged = merge_with_overlap(
            out_tiles,
            (image.shape[1], image.shape[2]),
            in_patch=tile,
            in_overlap=overlap,
            out_patch=out_tile_size,
            out_overlap=out_overlap,
        )
        outs.append(merged)
    return jnp.stack(outs)


def tiled_vae_encode(
    cldm, params, image: jnp.ndarray, tile_size: int = 256, overlap: int = 32,
    cross_tile_gn: bool = True,
) -> jnp.ndarray:
    """image [-1,1] NHWC -> scaled latent, tile-wise (cldm.vae_encode
    tiled=True counterpart, /root/reference/terediff/model/cldm.py:92-119).
    cross_tile_gn (default on, like the reference) pools GN statistics over
    the tiles so each tile is normalized with image-global statistics."""

    def enc(tiles):
        return cldm.vae_encode(params, tiles, sample=False)

    return tiled_apply(
        enc, image, tile_size, overlap, 1, 8, cross_tile_gn=cross_tile_gn
    )


def tiled_vae_decode(
    cldm, params, z: jnp.ndarray, tile_size: int = 32, overlap: int = 8,
    cross_tile_gn: bool = True,
) -> jnp.ndarray:
    def dec(tiles):
        return cldm.vae_decode(params, tiles)

    return tiled_apply(
        dec, z, tile_size, overlap, 8, 1, cross_tile_gn=cross_tile_gn
    )

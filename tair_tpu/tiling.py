"""Tiled (patch-based) restoration: batched split -> restore -> blend-merge.

Capability parity with the fork's val_patches.py (:25-92 split, :114-206
merge): 128^2 input patches with 16-px overlap, each restored at 512^2
(an effective x4 super-resolution), merged with a linear edge-fade window at
512-px patch / 64-px overlap scale, cropped to 4x the original size.

TPU redesign of the throughput path: the reference restores patches ONE AT A
TIME in a Python loop (val_patches.py:316) — here all patches form one big
batch (optionally chunked), so a whole image's 50-step diffusion runs as a
single batched XLA program and shards across chips on the mesh "data" axis.
This is where the multi-chip speedup over the serial reference comes from.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def split_grid(height: int, width: int, patch: int = 128, overlap: int = 16):
    """Grid geometry: (n_h, n_w, padded_h, padded_w)."""
    stride = patch - overlap
    n_h = math.ceil((height - overlap) / stride)
    n_w = math.ceil((width - overlap) / stride)
    return n_h, n_w, (n_h - 1) * stride + patch, (n_w - 1) * stride + patch


def split_with_overlap(
    image: jnp.ndarray, patch: int = 128, overlap: int = 16
) -> jnp.ndarray:
    """[H, W, C] -> [N, patch, patch, C], row-major; zero-pad bottom/right."""
    h, w, c = image.shape
    stride = patch - overlap
    n_h, n_w, ph, pw = split_grid(h, w, patch, overlap)
    x = jnp.pad(image, ((0, ph - h), (0, pw - w), (0, 0)))
    idx_h = jnp.arange(n_h) * stride
    idx_w = jnp.arange(n_w) * stride

    def take(hs, ws):
        return jax.lax.dynamic_slice(x, (hs, ws, 0), (patch, patch, c))

    rows = jax.vmap(lambda hs: jax.vmap(lambda ws: take(hs, ws))(idx_w))(idx_h)
    return rows.reshape(n_h * n_w, patch, patch, c)


def fade_window(patch: int, overlap: int) -> np.ndarray:
    """Linear edge fade on all four sides (val_patches.py:151-163)."""
    window = np.ones((patch, patch), np.float32)
    for i in range(overlap):
        k = (i + 1) / overlap
        window[i, :] *= k
        window[-(i + 1), :] *= k
        window[:, i] *= k
        window[:, -(i + 1)] *= k
    return window


def merge_with_overlap(
    patches: jnp.ndarray,          # [N, P, P, C] restored patches (row-major)
    original_hw: Tuple[int, int],  # size the INPUT image had
    in_patch: int = 128,
    in_overlap: int = 16,
    out_patch: int = 512,
    out_overlap: int = 64,
) -> jnp.ndarray:
    """Weighted blend-merge; returns [H*scale, W*scale, C] where scale =
    out_patch / in_patch (may be fractional, e.g. VAE encode 1/8)."""
    h0, w0 = original_hw
    n_h, n_w, ph, pw = split_grid(h0, w0, in_patch, in_overlap)
    stride = out_patch - out_overlap
    fh = (n_h - 1) * stride + out_patch
    fw = (n_w - 1) * stride + out_patch
    c = patches.shape[-1]

    window = jnp.asarray(fade_window(out_patch, out_overlap))[..., None]

    canvas = jnp.zeros((fh, fw, c), jnp.float32)
    weights = jnp.zeros((fh, fw, 1), jnp.float32)
    pos_h = (jnp.arange(n_h * n_w) // n_w) * stride
    pos_w = (jnp.arange(n_h * n_w) % n_w) * stride

    def body(carry, inp):
        canvas, weights = carry
        p, hs, ws = inp
        cur = jax.lax.dynamic_slice(canvas, (hs, ws, 0), (out_patch, out_patch, c))
        canvas = jax.lax.dynamic_update_slice(
            canvas, cur + p.astype(jnp.float32) * window, (hs, ws, 0)
        )
        curw = jax.lax.dynamic_slice(weights, (hs, ws, 0), (out_patch, out_patch, 1))
        weights = jax.lax.dynamic_update_slice(weights, curw + window, (hs, ws, 0))
        return (canvas, weights), None

    (canvas, weights), _ = jax.lax.scan(
        body, (canvas, weights), (patches, pos_h, pos_w)
    )
    merged = canvas / jnp.maximum(weights, 1e-8)
    return merged[: h0 * out_patch // in_patch, : w0 * out_patch // in_patch]


def restore_tiled(
    restore_batch_fn: Callable[[jnp.ndarray, jax.Array], jnp.ndarray],
    image: jnp.ndarray,            # [H, W, C] LQ in [0,1]
    rng: jax.Array,
    patch: int = 128,
    overlap: int = 16,
    out_scale: int = 4,
    chunk: Optional[int] = None,
    return_aux: bool = False,
):
    """Split -> batched restore -> merge. `restore_batch_fn(lq_batch, rng)`
    maps [B, patch*out_scale, ...] -> same (patches are pre-upscaled x4 with
    bicubic, matching val_patches.py:317-318). `chunk` bounds the device
    batch; patches are processed in ceil(N/chunk) equal compiled steps.

    return_aux=True: restore_batch_fn returns (restored, aux_pytree) where
    every aux leaf has a leading per-patch batch dim; restore_tiled then
    returns (merged, aux) with aux leaves stacked to [n_patches, ...] —
    e.g. per-patch spotter decodes for submission dumps (val_patches
    --dump-dir)."""
    h, w, c = image.shape
    patches = split_with_overlap(image, patch, overlap)
    n = patches.shape[0]
    big = patch * out_scale

    def _upscale(p):
        u = jax.image.resize(p, (p.shape[0], big, big, c), "cubic")
        return jnp.clip(u, 0.0, 1.0)

    def _call(p, r):
        out = restore_batch_fn(p, r)
        return out if return_aux else (out, None)

    if chunk is None or chunk == n:
        restored, aux = _call(_upscale(patches), rng)
    else:
        # chunk at the SMALL patch size (upscale inside the loop): the x16
        # upscaled buffer of a large image can run to GBs, so only `chunk`
        # patches are ever held at the restore resolution
        pad = (-n) % chunk
        patches_p = jnp.pad(patches, ((0, pad), (0, 0), (0, 0), (0, 0)))
        outs, auxes = [], []
        for i in range(patches_p.shape[0] // chunk):
            pc = patches_p[i * chunk : (i + 1) * chunk]
            ri, ai = _call(_upscale(pc), jax.random.fold_in(rng, i))
            outs.append(ri)
            auxes.append(ai)
        restored = jnp.concatenate(outs, 0)[:n]
        aux = (
            jax.tree.map(lambda *xs: jnp.concatenate(xs, 0)[:n], *auxes)
            if return_aux else None
        )

    merged = merge_with_overlap(
        restored, (h, w), patch, overlap, big, overlap * out_scale
    )
    return (merged, aux) if return_aux else merged


def gaussian_window(patch: int, var: float = 0.01) -> np.ndarray:
    """DiffBIR's gaussian tile weights (make_tiled_fn / gaussian_weights,
    /root/reference/terediff/utils/common.py:213-234): a separable gaussian
    over normalized tile coordinates, peaked at the tile center."""
    xs = (np.arange(patch) - patch / 2 + 0.5) / patch
    g = np.exp(-(xs**2) / (2 * var)) / np.sqrt(2 * np.pi * var)
    return np.outer(g, g).astype(np.float32)


def make_tiled_fn(
    fn: Callable,
    size: int,
    stride: int,
    window: str = "gaussian",
):
    """Gaussian-blended sliding-window application of a spatial-size-
    preserving function (DiffBIR's make_tiled_fn, common.py:174-234) —
    the reference uses this for tiled LATENT DIFFUSION (each denoising
    step applied per latent tile and blended).

    `fn(x_tile, *extra_tiles)` maps [B, size, size, C] (+ any number of
    extra arrays tiled over the same H, W grid) -> [B, size, size, C'].
    Tiles are the reference's sliding windows (last row/col snapped to the
    edge), all executed in one batched call.
    """
    win_np = (
        gaussian_window(size) if window == "gaussian" else fade_window(size, stride and max(size - stride, 1))
    )

    def starts(extent: int):
        ss = list(range(0, extent - size + 1, stride))
        if not ss or ss[-1] != extent - size:
            ss.append(extent - size)
        return ss

    def tiled(x, *extras):
        b, h, w, c = x.shape
        if h <= size and w <= size:
            return fn(x, *extras)
        # one axis may still be smaller than the tile (e.g. 256x1024 input):
        # edge-pad it up to the tile size so starts() stays non-negative and
        # every tile is full-sized, then crop the canvas back at the end
        ph, pw = max(size - h, 0), max(size - w, 0)
        if ph or pw:
            def _pad(a):
                return jnp.pad(a, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")

            x = _pad(x)
            extras = tuple(_pad(e) for e in extras)
        hs, ws = starts(h + ph), starts(w + pw)
        pos = [(i, j) for i in hs for j in ws]

        def grab(a):
            return jnp.concatenate(
                [a[:, i : i + size, j : j + size] for (i, j) in pos], axis=0
            )

        tiles_out = fn(grab(x), *[grab(e) for e in extras])
        n = len(pos)
        co = tiles_out.shape[-1]
        tiles_out = tiles_out.reshape(n, b, size, size, co)

        win = jnp.asarray(win_np)[..., None]
        canvas = jnp.zeros((b, h + ph, w + pw, co), jnp.float32)
        weights = jnp.zeros((1, h + ph, w + pw, 1), jnp.float32)
        for k, (i, j) in enumerate(pos):
            canvas = canvas.at[:, i : i + size, j : j + size].add(
                tiles_out[k].astype(jnp.float32) * win
            )
            weights = weights.at[:, i : i + size, j : j + size].add(win)
        # corner gaussian weights get as small as ~5e-9; keep the floor
        # well below them
        out = (canvas / jnp.maximum(weights, 1e-12)).astype(tiles_out.dtype)
        return out[:, :h, :w]

    return tiled

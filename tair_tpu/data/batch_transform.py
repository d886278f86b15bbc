"""Two-stage RealESRGAN degradation synthesis as ONE compiled XLA program.

Behavioral parity with /root/reference/terediff/dataset/batch_transform.py:144-287:
USM-sharpen HQ -> [blur -> random-resize -> gaussian|poisson noise -> JPEG]
-> [second blur -> resize toward gt/stage2_scale -> noise -> {JPEG, sinc}
order shuffle] -> resize back to gt size -> round/clamp.

TPU-first redesign of the dynamic shapes: torch resizes to arbitrary random
sizes at runtime; XLA requires static shapes, so random intermediate sizes
are SNAPPED to a static grid and dispatched with `lax.switch` — every branch
sees exact static sizes (correct reflect padding for blurs, exact-size JPEG),
and the continuous part of the scale distribution is quantized to the grid
step (gt/16 px), a negligible coarsening of the degradation distribution.
All randomness comes from one JAX key; per-batch choices (resize mode, noise
family, order shuffle) mirror the reference's per-batch host RNG draws, and
per-element parameters (sigma, jpeg quality, gray mask) mirror its
per-element draws.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .degradation import add_gaussian_noise, add_poisson_noise, filter2d, usm_sharpen
from .diffjpeg import diff_jpeg


@dataclass(frozen=True)
class DegradationConfig:
    # first stage
    resize_prob: Tuple[float, float, float] = (0.2, 0.7, 0.1)  # up, down, keep
    resize_range: Tuple[float, float] = (0.15, 1.5)
    gaussian_noise_prob: float = 0.5
    noise_range: Tuple[float, float] = (1.0, 30.0)
    poisson_scale_range: Tuple[float, float] = (0.05, 3.0)
    gray_noise_prob: float = 0.4
    jpeg_range: Tuple[float, float] = (30.0, 95.0)
    # second stage
    stage2_scale: float = 4.0
    second_blur_prob: float = 0.8
    resize_prob2: Tuple[float, float, float] = (0.3, 0.4, 0.3)
    resize_range2: Tuple[float, float] = (0.3, 1.2)
    gaussian_noise_prob2: float = 0.5
    noise_range2: Tuple[float, float] = (1.0, 25.0)
    poisson_scale_range2: Tuple[float, float] = (0.05, 2.5)
    gray_noise_prob2: float = 0.4
    jpeg_range2: Tuple[float, float] = (30.0, 95.0)
    use_sharpener: bool = True


def _size_grid(lo: float, hi: float, step: int) -> np.ndarray:
    """Static grid of candidate content sizes in [lo, hi], multiples of step."""
    sizes = np.arange(max(step, int(np.floor(lo / step) * step)),
                      int(np.ceil(hi / step) * step) + 1, step)
    return sizes[(sizes >= max(8, lo * 0.999))]


def _draw_scale(rng, probs, lo, hi):
    """up/down/keep categorical then uniform scale, as batch_transform.py:163-171."""
    k1, k2 = jax.random.split(rng)
    choice = jax.random.choice(k1, 3, p=jnp.asarray(probs, jnp.float32))
    u = jax.random.uniform(k2)
    up = 1.0 + u * (hi - 1.0)
    down = lo + u * (1.0 - lo)
    return jnp.where(choice == 0, up, jnp.where(choice == 1, down, 1.0))


def _resize_multi_method(x, out_hw, method_idx):
    """3-way resize: area(~linear+aa) / bilinear / bicubic, lax.switch-ed."""
    b, _, _, c = x.shape
    shape = (b, out_hw[0], out_hw[1], c)
    return jax.lax.switch(
        method_idx,
        [
            lambda v: jax.image.resize(v, shape, "linear", antialias=True),
            lambda v: jax.image.resize(v, shape, "linear", antialias=False),
            lambda v: jax.image.resize(v, shape, "cubic", antialias=False),
        ],
        x,
    )


def _noise_stage(rng, x, cfg_g_prob, noise_range, poisson_range, gray_prob):
    """gaussian-or-poisson per batch, per-element params (reference :175-195)."""
    b = x.shape[0]
    k_pick, k_sig, k_scale, k_gray, k_apply = jax.random.split(rng, 5)
    use_gauss = jax.random.uniform(k_pick) < cfg_g_prob
    sigma = jax.random.uniform(
        k_sig, (b,), minval=noise_range[0], maxval=noise_range[1]
    )
    pscale = jax.random.uniform(
        k_scale, (b,), minval=poisson_range[0], maxval=poisson_range[1]
    )
    gray = (jax.random.uniform(k_gray, (b,)) < gray_prob).astype(jnp.float32)
    return jax.lax.cond(
        use_gauss,
        lambda v: add_gaussian_noise(k_apply, v, sigma, gray),
        lambda v: add_poisson_noise(k_apply, v, pscale, gray),
        x,
    )


def degrade_batch(
    rng: jax.Array,
    hq: jnp.ndarray,          # [B, S, S, 3] in [0,1]
    kernel1: jnp.ndarray,     # [B, 21, 21]
    kernel2: jnp.ndarray,
    sinc_kernel: jnp.ndarray,
    cfg: DegradationConfig = DegradationConfig(),
):
    """Returns (gt [-1,1], lq [0,1]) both [B, S, S, 3]."""
    b, s, _, _ = hq.shape
    base = int(round(s / cfg.stage2_scale))  # lq working size (e.g. 128)
    step1 = max(8, s // 16)
    step2 = max(8, base // 16)
    grid1 = _size_grid(s * cfg.resize_range[0], s * cfg.resize_range[1], step1)
    grid2 = _size_grid(
        base * cfg.resize_range2[0], base * cfg.resize_range2[1], step2
    )

    keys = jax.random.split(rng, 12)
    gt = usm_sharpen(hq) if cfg.use_sharpener else hq

    # ---------------- stage 1 ----------------
    out = filter2d(gt, kernel1)

    scale1 = _draw_scale(keys[0], cfg.resize_prob, *cfg.resize_range)
    n1 = jnp.clip(
        jnp.round(s * scale1 / step1).astype(jnp.int32) * step1,
        int(grid1[0]), int(grid1[-1]),
    )
    idx1 = (n1 - int(grid1[0])) // step1
    method1 = jax.random.randint(keys[1], (), 0, 3)

    scale2 = _draw_scale(keys[2], cfg.resize_prob2, *cfg.resize_range2)
    m2 = jnp.clip(
        jnp.round(base * scale2 / step2).astype(jnp.int32) * step2,
        int(grid2[0]), int(grid2[-1]),
    )
    idx2 = (m2 - int(grid2[0])) // step2
    method2 = jax.random.randint(keys[3], (), 0, 3)
    method3 = jax.random.randint(keys[4], (), 0, 3)

    jpeg_q1 = jax.random.uniform(
        keys[5], (b,), minval=cfg.jpeg_range[0], maxval=cfg.jpeg_range[1]
    )
    jpeg_q2 = jax.random.uniform(
        keys[6], (b,), minval=cfg.jpeg_range2[0], maxval=cfg.jpeg_range2[1]
    )
    do_blur2 = jax.random.uniform(keys[7]) < cfg.second_blur_prob
    order_first = jax.random.uniform(keys[8]) < 0.5

    canvas2 = int(grid2[-1])

    def stage1_branch(n: int):
        def fn(x):
            y = _resize_multi_method(x, (n, n), method1)
            y = _noise_stage(
                keys[9], y, cfg.gaussian_noise_prob, cfg.noise_range,
                cfg.poisson_scale_range, cfg.gray_noise_prob,
            )
            y = diff_jpeg(jnp.clip(y, 0, 1), jpeg_q1)
            y = jax.lax.cond(
                do_blur2, lambda v: filter2d(v, kernel2), lambda v: v, y
            )
            # place content (resized to m2, traced) on the static stage-2 canvas
            pad = 8
            y = jnp.pad(y, ((0, 0), (pad, pad), (pad, pad), (0, 0)), "reflect")
            sc = m2.astype(jnp.float32) / n
            return jax.image.scale_and_translate(
                y, (b, canvas2, canvas2, 3), (1, 2),
                scale=jnp.stack([sc, sc]),
                translation=jnp.stack([-pad * sc, -pad * sc]),
                method="linear",
                antialias=True,
            )
        return fn

    canvas = jax.lax.switch(idx1, [stage1_branch(int(n)) for n in grid1], out)

    # ---------------- stage 2 ----------------
    def stage2_branch(m: int):
        def fn(x):
            y = x[:, :m, :m]
            y = _noise_stage(
                keys[10], y, cfg.gaussian_noise_prob2, cfg.noise_range2,
                cfg.poisson_scale_range2, cfg.gray_noise_prob2,
            )

            def order_a(v):  # resize back + sinc, then JPEG
                v = _resize_multi_method(v, (base, base), method2)
                v = filter2d(v, sinc_kernel)
                return diff_jpeg(jnp.clip(v, 0, 1), jpeg_q2)

            def order_b(v):  # JPEG, then resize back + sinc
                v = diff_jpeg(jnp.clip(v, 0, 1), jpeg_q2)
                v = _resize_multi_method(v, (base, base), method2)
                return filter2d(v, sinc_kernel)

            return jax.lax.cond(order_first, order_a, order_b, y)
        return fn

    lq_small = jax.lax.switch(
        idx2, [stage2_branch(int(m)) for m in grid2], canvas
    )

    # final resize back to gt size (bicubic, reference :269-271)
    lq = jax.image.resize(lq_small, (b, s, s, 3), "cubic", antialias=False)
    lq = jnp.clip(jnp.round(jnp.clip(lq, 0, 1) * 255.0), 0, 255) / 255.0
    return gt * 2.0 - 1.0, lq

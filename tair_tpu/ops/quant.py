"""w8a8 quantized conv/dense for the weight-DMA-bound diffusion serving path.

The UNet+ControlNet step is weight-DMA bound at batch 1 (docs/PERFORMANCE.md
"UNet / attention": the async weight-prefetch copies dominate the timeline),
so the only remaining lever there is fewer weight BYTES. scripts/int8_lab.py
measured on v5e, 50-rep scans streaming weight chains from HBM:

  - int8 weights DEQUANTIZED in-loop: no win (XLA hoists the loop-invariant
    dequant out of the scan, so the loop streams bf16 again — the same
    hoist it applies to fp32->bf16 master casts).
  - NATIVE s8 x s8 -> s32 conv/dot on the MXU: conv chain 2.69 -> 1.84
    ms/step (1.46x), dense chain 4.93 -> 3.24 (1.52x). The weight-quantize
    also hoists — which is exactly what makes it pay: the hoisted artifact
    IS int8, so the loop streams half the bytes, and the MXU runs int8 at
    >= bf16 rate.

Design (TPU-first, zero param-tree change):
  - Weights stay fp32/bf16 params. `w8a8_dot_general` / `w8a8_conv` quantize
    the weight INSIDE the jitted program — per-output-channel symmetric
    int8 — and rely on XLA loop-invariant hoisting to materialize the int8
    copy once outside the sampler scan. Converted reference checkpoints load
    unchanged; there is no separate quantized checkpoint format.
  - Activations are quantized dynamically per call (per-tensor symmetric
    abs-max), matmul/conv runs s8 x s8 -> s32 on the MXU, and the output is
    rescaled by (w_scale * x_scale) in one elementwise epilogue.
  - Inference-only (jnp.round has no useful gradient); enable via
    `UNetConfig.quantized=True` (bench: TAIR_BENCH_QUANT=1). Exact-semantics
    paths never route through this module.

Quality: standard w8a8 post-training quantization error (no calibration);
needs trained weights to quantify, same caveat family as spotter_every /
enc_topk (docs/SERVING.md).
"""

from __future__ import annotations

import contextlib
import threading

import jax
import jax.numpy as jnp
from jax import lax

_state = threading.local()


def active() -> bool:
    return getattr(_state, "on", False)


def static_act_amax():
    return getattr(_state, "static_amax", None)


@contextlib.contextmanager
def quantized(on: bool = True, static_act_amax=None, calibrate: list | None = None):
    """Scope (at trace time) within which layers.conv*/dense build w8a8 ops.

    Used by UNetModel/ControlNet __call__ so the flag covers exactly their
    submodule tree (Flax compact submodules execute synchronously inside the
    parent's __call__) and nothing else in the fused program.

    static_act_amax: when set, activations quantize with a FIXED per-tensor
    abs-max (a trace-time constant) instead of the dynamic per-call abs-max
    reduce. The dynamic reduce is what made w8a8 lose end to end
    (docs/PERFORMANCE.md): it serializes in front of every conv, so the
    async weight-prefetch overlap has nothing to hide behind. A static
    scale removes that dependency entirely — the quantize becomes a pure
    elementwise pass fusible into the producer. Accepts either one float
    applied at every site (crude) or a sequence of per-site values consumed
    in execution order — calibrate them with `calibrate=` below. Like the
    rest of this module it is a serving approximation knob, never the
    exact path.

    calibrate: a list to fill with per-site activation abs-max floats
    (standard static-PTQ calibration). Quantization runs the dynamic path;
    each conv/dense site appends (or max-merges on repeat passes) its
    observed abs-max, in the same deterministic execution order the
    static_act_amax sequence is consumed in. Calibration needs CONCRETE
    values — run it eagerly (outside jit); a traced run raises with
    instructions.
    """
    prev = active()
    prev_amax = getattr(_state, "static_amax", None)
    prev_calib = getattr(_state, "calib", None)
    prev_site = getattr(_state, "site", 0)
    if calibrate is not None and static_act_amax is not None:
        raise ValueError("calibrate and static_act_amax are mutually exclusive")
    _state.on = on
    _state.static_amax = static_act_amax
    _state.calib = calibrate
    _state.site = 0
    try:
        yield
    finally:
        _state.on = prev
        _state.static_amax = prev_amax
        _state.calib = prev_calib
        _state.site = prev_site


def _next_site() -> int:
    i = getattr(_state, "site", 0)
    _state.site = i + 1
    return i


def min_weight_act_ratio() -> float | None:
    return getattr(_state, "min_ratio", None)


@contextlib.contextmanager
def selective(min_ratio: float | None):
    """Quantize only sites where weight bytes dominate activation bytes.

    w8a8's measured economics on the fused loop (docs/PERFORMANCE.md): the
    win is halved WEIGHT stream bytes, the cost is extra quantize/rescale
    HBM passes over the ACTIVATION. Both are known statically per site, so
    gate per site: a conv/dense quantizes only when
    weight.size >= min_ratio * activation.size — the inner low-resolution
    UNet blocks (huge 1280-ch weights, tiny 8^2/16^2 activations) qualify,
    the outer 64^2 blocks (where the activation passes lose) stay bf16.
    Trace-time constant folding; None disables the gate (quantize all).
    Sites skipped by the gate consume neither a calibration slot nor a
    static_act_amax entry (the site counter only advances for quantized
    sites), so calibrate under the same selective() scope you serve with.
    """
    prev = getattr(_state, "min_ratio", None)
    _state.min_ratio = min_ratio
    try:
        yield
    finally:
        _state.min_ratio = prev


def _selective_skip(x: jnp.ndarray, w: jnp.ndarray) -> bool:
    r = min_weight_act_ratio()
    return r is not None and w.size < r * x.size


def _quant_weight(w: jnp.ndarray, reduce_axes) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8: returns (w8, scale[out]).

    Zero channels (the zero-init convs of ControlNet/SD) get scale 1 and
    all-zero w8, reproducing the exact-zero output.
    """
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=reduce_axes, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    w8 = jnp.round(wf / scale).astype(jnp.int8)
    return w8, scale.reshape(scale.shape[-1])


def _quant_act(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tensor symmetric int8 for the activation.

    Dynamic abs-max by default; a static scale (trace-time constant, needs
    the clip the dynamic path gets for free) when the quantized() scope set
    one — see the scope docstring for why that matters for throughput.
    """
    xf = x.astype(jnp.float32)
    amax_const = static_act_amax()
    if amax_const is not None:
        if not isinstance(amax_const, (int, float)):
            site = _next_site()
            try:
                amax_const = float(amax_const[site])
            except IndexError:
                raise ValueError(
                    f"static_act_amax has {len(amax_const)} entries but the "
                    f"program reached quant site {site} — calibrate with the "
                    "same model config (quant.quantized(calibrate=...))"
                ) from None
        # same f32 division as the dynamic path (bit-parity at equal amax),
        # including its amax==0 -> scale 1.0 guard
        scale = jnp.float32(amax_const) / 127.0 if amax_const > 0 else jnp.float32(1.0)
        x8 = jnp.clip(jnp.round(xf / scale), -127.0, 127.0).astype(jnp.int8)
        return x8, scale
    amax = jnp.max(jnp.abs(xf))
    calib = getattr(_state, "calib", None)
    if calib is not None:
        site = _next_site()
        try:
            observed = float(amax)
        except (jax.errors.ConcretizationTypeError,
                jax.errors.TracerArrayConversionError):
            raise RuntimeError(
                "static-PTQ calibration needs concrete activations — run the "
                "forward eagerly (outside jit) inside quantized(calibrate=...)"
            ) from None
        if site < len(calib):
            calib[site] = max(calib[site], observed)  # max-merge repeat passes
        else:
            calib.append(observed)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    x8 = jnp.round(xf / scale).astype(jnp.int8)
    return x8, scale


def w8a8_dot_general(lhs, rhs, dimension_numbers, precision=None,
                     preferred_element_type=None):
    """Drop-in for lax.dot_general as nn.Dense(dot_general=...).

    Assumes the Dense contraction layout ([..., in] x [in, out]) — asserted.
    """
    (lhs_c, rhs_c), batch = dimension_numbers
    assert rhs.ndim == 2 and tuple(rhs_c) == (0,) and batch == ((), ()), (
        "w8a8_dot_general supports the nn.Dense layout only"
    )
    if _selective_skip(lhs, rhs):
        return lax.dot_general(lhs, rhs, dimension_numbers, precision=precision,
                               preferred_element_type=preferred_element_type)
    out_dtype = jnp.promote_types(lhs.dtype, rhs.dtype)
    w8, wscale = _quant_weight(rhs, reduce_axes=(0,))
    x8, xscale = _quant_act(lhs)
    y = lax.dot_general(
        x8, w8, dimension_numbers, preferred_element_type=jnp.int32
    )
    y = y.astype(jnp.float32) * (wscale * xscale)
    return y.astype(out_dtype)


def w8a8_conv(lhs, rhs, window_strides, padding, lhs_dilation=None,
              rhs_dilation=None, dimension_numbers=None,
              feature_group_count=1, batch_group_count=1, precision=None,
              preferred_element_type=None):
    """Drop-in for lax.conv_general_dilated as nn.Conv(conv_general_dilated=...).

    NHWC/HWIO only (the repo's layout); per-output-channel weight scales.
    """
    assert feature_group_count == 1 and batch_group_count == 1
    if _selective_skip(lhs, rhs):
        return lax.conv_general_dilated(
            lhs, rhs, window_strides, padding,
            lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
            dimension_numbers=dimension_numbers,
            feature_group_count=feature_group_count, precision=precision,
            preferred_element_type=preferred_element_type,
        )
    out_dtype = jnp.promote_types(lhs.dtype, rhs.dtype)
    # kernel [*window, in, out] -> reduce all but the trailing out axis
    w8, wscale = _quant_weight(rhs, reduce_axes=tuple(range(rhs.ndim - 1)))
    x8, xscale = _quant_act(lhs)
    y = lax.conv_general_dilated(
        x8, w8, window_strides, padding,
        lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
        dimension_numbers=dimension_numbers,
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (wscale * xscale)  # out channel is minor (NHWC)
    return y.astype(out_dtype)

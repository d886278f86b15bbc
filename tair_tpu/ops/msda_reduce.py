"""Pallas kernel: fused corner-weight + (level, point) reduce for msda.

The flatlanes core (spotter/ms_deform_attn.py) ends in
    out[b,q,h,:] = sum_{k, corner} w_corner[b,q,(h,k)] * g[(b,q,h,k), corner*D:+D]
where g is the [B*Q*lanes, 4D] row-gather output (lanes = H*K, K = L*P).

In XLA the fastest found formulation ("mxu") builds w_lanes with a spread
matmul and segment-sums with a [4D, D] matmul. Dot operands cannot fuse
with their producers on XLA-TPU, so BOTH w_lanes and g*w_lanes materialize
— two extra g-sized HBM round-trips per msda call (~1.9 GB/step at TESTR
encoder geometry; the "msda reduce/convert" + "corner-weight select" rows
of docs/PERFORMANCE.md's trace table, ~590 ms of the 2.8 s image).

This kernel consumes the gather output ONCE: per block it loads g
[qt*lanes, 4D] bf16 and the four lane-packed corner-weight tiles
[qt, lanes] f32, broadcasts each weight over its D channel lanes
in-register (the only relayout is on the small weight tiles), corner-sums
with static lane slices, and K-reduces with a leading-dim reshape — no
g-sized intermediate ever leaves VMEM. Backward is the mirrored kernel
(dg = broadcasted dout * w; dw = lane-reduce of g * dout), so training
takes the same single-pass structure.

Reference semantics anchor: the CUDA corner reduce in
/root/reference/testr/adet/layers/csrc/ms_deform_attn/ms_deform_im2col_cuda.cuh:238-299
(bilinear corner weighting and (level, point) accumulation); parity is
tested against this repo's oracle core and the reference grid_sample math
(tests/test_msda_reduce.py, tests/test_ms_deform_attn.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(g_ref, w0_ref, w1_ref, w2_ref, w3_ref, o_ref, *, qt, lanes, d, k):
    g = g_ref[:]                                    # [qt*lanes, 4D]
    g3 = g.reshape(qt, lanes, 4 * d)
    acc = None
    for c, w_ref in enumerate((w0_ref, w1_ref, w2_ref, w3_ref)):
        w = w_ref[:]                                # [qt, lanes] f32
        t = g3[:, :, c * d : (c + 1) * d].astype(jnp.float32) * w[:, :, None]
        acc = t if acc is None else acc + t
    # K-reduce: (qt, lanes) sublanes -> (qt*lanes/k, k) groups, k contiguous
    o_ref[:] = acc.reshape(qt * (lanes // k), k, d).sum(axis=1)


def _fwd_kernel_mxt(
    g_ref, w0_ref, w1_ref, w2_ref, w3_ref, o_ref, *, qt, lanes, d, k
):
    """Transpose-free-broadcast variant: the corner-weight tiles stay in
    their native (query-sublane, lane) orientation and cross to the
    g-row orientation with ONE MXU transpose per tile per block
    (contract the query sublane dim against an identity). Each query's
    weights are then a [lanes, 1] column whose lane-broadcast against the
    gathered [lanes, D] corner slices is native VPU — no Mosaic relayout
    of per-corner tensors ever happens."""
    groups = lanes // k
    eye = jnp.eye(qt, dtype=jnp.float32)
    wts = [
        jax.lax.dot_general(
            w_ref[:], eye, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [lanes, qt]
        for w_ref in (w0_ref, w1_ref, w2_ref, w3_ref)
    ]
    for qq in range(qt):
        gq = g_ref[qq * lanes : (qq + 1) * lanes, :]  # [lanes, 4D]
        acc = None
        for c in range(4):
            t = gq[:, c * d : (c + 1) * d].astype(jnp.float32) * wts[c][
                :, qq : qq + 1
            ]
            acc = t if acc is None else acc + t
        o_ref[qq * groups : (qq + 1) * groups, :] = acc.reshape(
            groups, k, d
        ).sum(axis=1)


def _fwd_kernel_noweights(
    g_ref, w0_ref, w1_ref, w2_ref, w3_ref, o_ref, *, qt, lanes, d, k
):
    """Timing diagnostic ONLY (not parity-correct): corner weights replaced
    by 1.0, isolating the load + corner-sum + K-reduce cost from the
    weight-broadcast relayout cost."""
    del w0_ref, w1_ref, w2_ref, w3_ref
    g3 = g_ref[:].reshape(qt, lanes, 4 * d)
    acc = None
    for c in range(4):
        t = g3[:, :, c * d : (c + 1) * d].astype(jnp.float32)
        acc = t if acc is None else acc + t
    o_ref[:] = acc.reshape(qt * (lanes // k), k, d).sum(axis=1)


_FWD_KERNELS = {
    "bcast": _fwd_kernel,
    "mxt": _fwd_kernel_mxt,
    "noweights": _fwd_kernel_noweights,
}


def _bwd_kernel(
    g_ref, w0_ref, w1_ref, w2_ref, w3_ref, do_ref,
    dg_ref, dw0_ref, dw1_ref, dw2_ref, dw3_ref,
    *, qt, lanes, d, k,
):
    do = do_ref[:].astype(jnp.float32)              # [qt*(lanes/k), d]
    # broadcast the group cotangent back over its k rows
    do3 = jnp.broadcast_to(
        do.reshape(qt, lanes // k, 1, d), (qt, lanes // k, k, d)
    ).reshape(qt, lanes, d)
    g3 = g_ref[:].reshape(qt, lanes, 4 * d)
    w_refs = (w0_ref, w1_ref, w2_ref, w3_ref)
    dw_refs = (dw0_ref, dw1_ref, dw2_ref, dw3_ref)
    dg = jnp.zeros((qt, lanes, 4 * d), jnp.float32)
    for c in range(4):
        w = w_refs[c][:]                            # [qt, lanes]
        dg = dg.at[:, :, c * d : (c + 1) * d].set(do3 * w[:, :, None])
        dw_refs[c][:] = (
            g3[:, :, c * d : (c + 1) * d].astype(jnp.float32) * do3
        ).sum(axis=-1)
    dg_ref[:] = dg.reshape(qt * lanes, 4 * d).astype(dg_ref.dtype)


def _pad_nq(nq: int, qt: int) -> int:
    return (-nq) % qt


def _fwd_impl(g, w0, w1, w2, w3, k, qt, interpret, variant="bcast"):
    nq, lanes = w0.shape
    four_d = g.shape[-1]
    d = four_d // 4
    pad = _pad_nq(nq, qt)
    if pad:
        g = jnp.pad(g, ((0, pad * lanes), (0, 0)))
        w0, w1, w2, w3 = (
            jnp.pad(w, ((0, pad), (0, 0))) for w in (w0, w1, w2, w3)
        )
    nqp = nq + pad
    groups = lanes // k
    mem = {} if interpret else {"memory_space": pltpu.VMEM}
    kernel = functools.partial(
        _FWD_KERNELS[variant], qt=qt, lanes=lanes, d=d, k=k
    )
    w_spec = pl.BlockSpec((qt, lanes), lambda i: (i, 0), **mem)
    out = pl.pallas_call(
        kernel,
        grid=(nqp // qt,),
        in_specs=[
            pl.BlockSpec((qt * lanes, four_d), lambda i: (i, 0), **mem),
            w_spec, w_spec, w_spec, w_spec,
        ],
        out_specs=pl.BlockSpec((qt * groups, d), lambda i: (i, 0), **mem),
        out_shape=jax.ShapeDtypeStruct((nqp * groups, d), jnp.float32),
        interpret=interpret,
    )(g, w0, w1, w2, w3)
    return out[: nq * groups]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def msda_corner_reduce(
    g: jnp.ndarray,     # [NQ*lanes, 4D] gathered bilinear patches (bf16/f32)
    w0: jnp.ndarray,    # [NQ, lanes] corner (0,0) weights, f32 (incl. attn)
    w1: jnp.ndarray,    # [NQ, lanes] corner (0,1)
    w2: jnp.ndarray,    # [NQ, lanes] corner (1,0)
    w3: jnp.ndarray,    # [NQ, lanes] corner (1,1)
    k: int = 16,        # rows per output group (= L*P); lanes % k == 0
    qt: int = 32,       # queries per kernel block
    interpret: bool = False,
    variant: str = "bcast",
) -> jnp.ndarray:       # [NQ*(lanes//k), D] f32
    return _fwd_impl(g, w0, w1, w2, w3, k, qt, interpret, variant)


def _vjp_fwd(g, w0, w1, w2, w3, k, qt, interpret, variant):
    return (
        _fwd_impl(g, w0, w1, w2, w3, k, qt, interpret, variant),
        (g, w0, w1, w2, w3),
    )


def _vjp_bwd(k, qt, interpret, variant, res, do):
    del variant  # the backward math is variant-independent
    g, w0, w1, w2, w3 = res
    nq, lanes = w0.shape
    four_d = g.shape[-1]
    d = four_d // 4
    pad = _pad_nq(nq, qt)
    groups = lanes // k
    if pad:
        g = jnp.pad(g, ((0, pad * lanes), (0, 0)))
        w0, w1, w2, w3 = (
            jnp.pad(w, ((0, pad), (0, 0))) for w in (w0, w1, w2, w3)
        )
        do = jnp.pad(do, ((0, pad * groups), (0, 0)))
    nqp = nq + pad
    mem = {} if interpret else {"memory_space": pltpu.VMEM}
    kernel = functools.partial(_bwd_kernel, qt=qt, lanes=lanes, d=d, k=k)
    w_spec = pl.BlockSpec((qt, lanes), lambda i: (i, 0), **mem)
    dg, dw0, dw1, dw2, dw3 = pl.pallas_call(
        kernel,
        grid=(nqp // qt,),
        in_specs=[
            pl.BlockSpec((qt * lanes, four_d), lambda i: (i, 0), **mem),
            w_spec, w_spec, w_spec, w_spec,
            pl.BlockSpec((qt * groups, d), lambda i: (i, 0), **mem),
        ],
        out_specs=(
            pl.BlockSpec((qt * lanes, four_d), lambda i: (i, 0), **mem),
            w_spec, w_spec, w_spec, w_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nqp * lanes, four_d), g.dtype),
            jax.ShapeDtypeStruct((nqp, lanes), jnp.float32),
            jax.ShapeDtypeStruct((nqp, lanes), jnp.float32),
            jax.ShapeDtypeStruct((nqp, lanes), jnp.float32),
            jax.ShapeDtypeStruct((nqp, lanes), jnp.float32),
        ),
        interpret=interpret,
    )(g, w0, w1, w2, w3, do.astype(jnp.float32))
    nq0 = nq  # unpadded
    return (
        dg[: nq0 * lanes],
        dw0[:nq0], dw1[:nq0], dw2[:nq0], dw3[:nq0],
    )


msda_corner_reduce.defvjp(_vjp_fwd, _vjp_bwd)

"""Pallas TPU flash attention (forward + custom-VJP backward) for the UNet
spatial transformer.

The reference dispatches to xformers/SDP CUDA kernels
(/root/reference/terediff/model/attention.py:54-260); the TPU counterpart is
this Pallas kernel: queries are tiled into VMEM blocks, keys/values stream
through an online-softmax accumulation (running max + normalizer), so the
[T, T] logits matrix (4096^2 at the 64x64 latent level) never materializes
in HBM. Numerics: fp32 accumulation regardless of input dtype, matching the
fp32-softmax vanilla path.

The backward is the standard two-pass flash scheme (no atomics): the forward
saves per-row logsumexp; dQ is computed by a kernel gridded over query
blocks, dK/dV by a kernel gridded over key blocks, both streaming the other
operand and recomputing the probabilities P = exp(S - lse).

Registered as the "pallas" implementation in tair_tpu.ops.attention; the
XLA SDPA remains the default and is the numerical oracle in tests.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import attention as attention_registry

NEG_INF = -1e30


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_k: int, scale: float, kv_len: int
):
    """One (batch*head, q_block) program: stream K/V blocks with online
    softmax. Refs: q [bq, d]; k/v [T_pad, d]; o [bq, d]; lse [bq, 1]. Keys
    beyond kv_len are padding and masked to -inf."""
    q = q_ref[:].astype(jnp.float32) * scale
    t = k_ref.shape[0]
    bq, d = q.shape

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        if t != kv_len:  # static: padding exists
            pos = i * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 1
            )
            s = jnp.where(pos < kv_len, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, t // block_k, body, (acc, m0, l0))
    l = jnp.maximum(l, 1e-30)
    o_ref[:] = (acc / l).astype(o_ref.dtype)
    lse_ref[:] = m + jnp.log(l)


def _flash_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, block_k: int, scale: float, kv_len: int,
):
    """dQ for one (batch*head, q_block): stream K/V.
    dS = P * (dO K V^T-row - delta); dQ = scale * dS @ K."""
    q = q_ref[:].astype(jnp.float32)
    do = do_ref[:].astype(jnp.float32)
    lse = lse_ref[:]     # [bq, 1]
    delta = delta_ref[:]  # [bq, 1]
    t = k_ref.shape[0]
    bq, d = q.shape

    def body(i, dq):
        k = k_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if t != kv_len:
            pos = i * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 1
            )
            s = jnp.where(pos < kv_len, s, NEG_INF)
        p = jnp.exp(s - lse)                      # [bq, bk]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                         # [bq, bk]
        ds = p * (dp - delta) * scale
        return dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    dq = jax.lax.fori_loop(0, t // block_k, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[:] = dq.astype(dq_ref.dtype)


def _flash_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, block_q: int, scale: float, kv_len: int, kv_padded: bool,
):
    """dK/dV for one (batch*head, k_block): stream Q/dO blocks."""
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    t = q_ref.shape[0]
    bk, d = k.shape
    j = pl.program_id(1)

    def body(i, carry):
        dk, dv = carry
        q = q_ref[pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[pl.ds(i * block_q, block_q), :]
        delta = delta_ref[pl.ds(i * block_q, block_q), :]
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        if kv_padded:  # static: some key block contains padding rows
            pos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (block_q, bk), 1)
            s = jnp.where(pos < kv_len, s, NEG_INF)
        p = jnp.exp(s - lse)
        dv = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bk, d]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        ds = p * (dp - delta) * scale
        dk = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bk, d]
        return dk, dv

    dk0 = jnp.zeros((bk, d), jnp.float32)
    dv0 = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, t // block_q, body, (dk0, dv0))
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _fold(x, b, h):  # [B, T, H, D] -> [B*H, T, D]
    return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], x.shape[3])


def _flash_forward(qf, kf, vf, scale, bq, bk, tq, tk, interpret):
    """Padded folded inputs [BH, T_pad, D] -> (out [BH, Tq_pad, D],
    lse [BH, Tq_pad, 1])."""
    bh, tq_pad, d = qf.shape
    tk_pad = kf.shape[1]
    grid = (bh, tq_pad // bq)
    mem = {} if interpret else {"memory_space": pltpu.VMEM}
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=bk, scale=scale, kv_len=tk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, bq, d), lambda i, j: (i, j, 0), **mem),
            pl.BlockSpec((None, tk_pad, d), lambda i, j: (i, 0, 0), **mem),
            pl.BlockSpec((None, tk_pad, d), lambda i, j: (i, 0, 0), **mem),
        ],
        out_specs=(
            pl.BlockSpec((None, bq, d), lambda i, j: (i, j, 0), **mem),
            pl.BlockSpec((None, bq, 1), lambda i, j: (i, j, 0), **mem),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, tq_pad, d), qf.dtype),
            jax.ShapeDtypeStruct((bh, tq_pad, 1), jnp.float32),
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_attention(q, k, v, scale, block_q, block_k, interpret):
    out, _ = _flash_attention_fwd(q, k, v, scale, block_q, block_k, interpret)
    return out


def _flash_attention_fwd(q, k, v, scale, block_q, block_k, interpret):
    b, tq, h, d = q.shape
    tk = k.shape[1]
    bq = min(block_q, tq)
    bk = min(block_k, tk)
    qf, kf, vf = _fold(q, b, h), _fold(k, b, h), _fold(v, b, h)
    pad_q = (-tq) % bq
    pad_k = (-tk) % bk
    if pad_q:
        qf = jnp.pad(qf, ((0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        kf = jnp.pad(kf, ((0, 0), (0, pad_k), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, pad_k), (0, 0)))
    of, lse = _flash_forward(qf, kf, vf, scale, bq, bk, tq, tk, interpret)
    out = of[:, :tq].reshape(b, h, tq, d).transpose(0, 2, 1, 3)
    return out, (qf, kf, vf, of, lse, (b, h, tq, tk))


def _flash_attention_bwd(scale, block_q, block_k, interpret, res, g):
    qf, kf, vf, of, lse, (b, h, tq, tk) = res
    bh, tq_pad, d = qf.shape
    tk_pad = kf.shape[1]
    bq = min(block_q, tq_pad)
    bk = min(block_k, tk_pad)

    gf = _fold(g, b, h)
    if tq_pad != tq:
        gf = jnp.pad(gf, ((0, 0), (0, tq_pad - tq), (0, 0)))
    # delta = rowsum(dO * O), computed in fp32 outside the kernels
    delta = jnp.sum(
        gf.astype(jnp.float32) * of.astype(jnp.float32), axis=-1, keepdims=True
    )  # [BH, Tq_pad, 1]

    mem = {} if interpret else {"memory_space": pltpu.VMEM}
    dq = pl.pallas_call(
        functools.partial(_flash_dq_kernel, block_k=bk, scale=scale, kv_len=tk),
        grid=(bh, tq_pad // bq),
        in_specs=[
            pl.BlockSpec((None, bq, d), lambda i, j: (i, j, 0), **mem),
            pl.BlockSpec((None, tk_pad, d), lambda i, j: (i, 0, 0), **mem),
            pl.BlockSpec((None, tk_pad, d), lambda i, j: (i, 0, 0), **mem),
            pl.BlockSpec((None, bq, d), lambda i, j: (i, j, 0), **mem),
            pl.BlockSpec((None, bq, 1), lambda i, j: (i, j, 0), **mem),
            pl.BlockSpec((None, bq, 1), lambda i, j: (i, j, 0), **mem),
        ],
        out_specs=pl.BlockSpec((None, bq, d), lambda i, j: (i, j, 0), **mem),
        out_shape=jax.ShapeDtypeStruct((bh, tq_pad, d), qf.dtype),
        interpret=interpret,
    )(qf, kf, vf, gf, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_dkv_kernel, block_q=bq, scale=scale, kv_len=tk,
            kv_padded=tk_pad != tk,
        ),
        grid=(bh, tk_pad // bk),
        in_specs=[
            pl.BlockSpec((None, tq_pad, d), lambda i, j: (i, 0, 0), **mem),
            pl.BlockSpec((None, bk, d), lambda i, j: (i, j, 0), **mem),
            pl.BlockSpec((None, bk, d), lambda i, j: (i, j, 0), **mem),
            pl.BlockSpec((None, tq_pad, d), lambda i, j: (i, 0, 0), **mem),
            pl.BlockSpec((None, tq_pad, 1), lambda i, j: (i, 0, 0), **mem),
            pl.BlockSpec((None, tq_pad, 1), lambda i, j: (i, 0, 0), **mem),
        ],
        out_specs=(
            pl.BlockSpec((None, bk, d), lambda i, j: (i, j, 0), **mem),
            pl.BlockSpec((None, bk, d), lambda i, j: (i, j, 0), **mem),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, tk_pad, d), kf.dtype),
            jax.ShapeDtypeStruct((bh, tk_pad, d), vf.dtype),
        ),
        interpret=interpret,
    )(qf, kf, vf, gf, lse, delta)

    def unfold(x, t):  # [BH, T_pad, D] -> [B, T, H, D]
        return x[:, :t].reshape(b, h, t, d).transpose(0, 2, 1, 3)

    return unfold(dq, tq), unfold(dk, tk), unfold(dv, tk)


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def flash_attention(
    q: jnp.ndarray,  # [B, Tq, H, D]
    k: jnp.ndarray,  # [B, Tk, H, D]
    v: jnp.ndarray,
    scale: float | None = None,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    return _flash_attention(q, k, v, scale, block_q, block_k, interpret)


def pallas_sdpa(q, k, v, scale=None):
    return flash_attention(q, k, v, scale=scale)


def pallas_sdpa_interpret(q, k, v, scale=None):
    return flash_attention(q, k, v, scale=scale, interpret=True)


attention_registry.register_attn_impl("pallas", pallas_sdpa)
attention_registry.register_attn_impl("pallas_interpret", pallas_sdpa_interpret)

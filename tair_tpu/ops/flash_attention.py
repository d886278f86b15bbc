"""Pallas TPU flash attention (forward) for the UNet spatial transformer.

The reference dispatches to xformers/SDP CUDA kernels
(/root/reference/terediff/model/attention.py:54-260); the TPU counterpart is
this Pallas kernel: queries are tiled into VMEM blocks, keys/values stream
through an online-softmax accumulation (running max + normalizer), so the
[T, T] logits matrix (4096^2 at the 64x64 latent level) never materializes
in HBM. Numerics: fp32 accumulation regardless of input dtype, matching the
fp32-softmax vanilla path.

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
    q_ref, k_ref, v_ref, o_ref, *, block_k: int, scale: float, kv_len: int
):
    """One (batch*head, q_block) program: stream K/V blocks with online
    softmax. Refs: q [bq, d]; k/v [T_pad, d]; o [bq, d]. Keys beyond kv_len
    are padding and masked to -inf."""
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
    acc, _, l = jax.lax.fori_loop(0, t // block_k, body, (acc, m0, l0))
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def flash_attention(
    q: jnp.ndarray,  # [B, Tq, H, D]
    k: jnp.ndarray,  # [B, Tk, H, D]
    v: jnp.ndarray,
    scale: float | None = None,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    b, tq, h, d = q.shape
    tk = k.shape[1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)

    # fold heads into batch; [B*H, T, D]
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, tq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, tk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, tk, d)

    bq = min(block_q, tq)
    bk = min(block_k, tk)
    # pad Q and K/V to block multiples; K padding is masked inside the kernel
    pad_q = (-tq) % bq
    pad_k = (-tk) % bk
    if pad_q:
        qf = jnp.pad(qf, ((0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        kf = jnp.pad(kf, ((0, 0), (0, pad_k), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, pad_k), (0, 0)))

    grid = (b * h, (tq + pad_q) // bq)
    mem = {} if interpret else {"memory_space": pltpu.VMEM}
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=bk, scale=scale, kv_len=tk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, bq, d), lambda i, j: (i, j, 0), **mem),
            pl.BlockSpec((None, tk + pad_k, d), lambda i, j: (i, 0, 0), **mem),
            pl.BlockSpec((None, tk + pad_k, d), lambda i, j: (i, 0, 0), **mem),
        ],
        out_specs=pl.BlockSpec((None, bq, d), lambda i, j: (i, j, 0), **mem),
        out_shape=jax.ShapeDtypeStruct((b * h, tq + pad_q, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)

    out = out[:, :tq].reshape(b, h, tq, d).transpose(0, 2, 1, 3)
    return out


def pallas_sdpa(q, k, v, scale=None):
    return flash_attention(q, k, v, scale=scale)


def pallas_sdpa_interpret(q, k, v, scale=None):
    return flash_attention(q, k, v, scale=scale, interpret=True)


attention_registry.register_attn_impl("pallas", pallas_sdpa)
attention_registry.register_attn_impl("pallas_interpret", pallas_sdpa_interpret)

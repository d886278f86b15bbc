"""Pallas flash attention vs the XLA SDPA oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tair_tpu.ops.attention import einsum_sdpa
from tair_tpu.ops.flash_attention import flash_attention


@pytest.mark.parametrize(
    "b,tq,tk,h,d",
    [
        (1, 64, 64, 2, 32),     # self-attention, multiple blocks
        (2, 100, 77, 4, 64),    # cross-attention, ragged q, kv=77
        (1, 256, 256, 1, 64),
    ],
)
def test_flash_matches_einsum(b, tq, tk, h, d):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, tq, h, d))
    k = jax.random.normal(ks[1], (b, tk, h, d))
    v = jax.random.normal(ks[2], (b, tk, h, d))
    ref = einsum_sdpa(q, k, v)
    out = flash_attention(q, k, v, block_q=32, block_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_bf16_inputs():
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (1, 64, 2, 32), jnp.bfloat16)
    k = jax.random.normal(ks[1], (1, 64, 2, 32), jnp.bfloat16)
    v = jax.random.normal(ks[2], (1, 64, 2, 32), jnp.bfloat16)
    ref = einsum_sdpa(q.astype(jnp.float32), k.astype(jnp.float32),
                      v.astype(jnp.float32))
    out = flash_attention(q, k, v, block_q=32, block_k=32, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=3e-2
    )


def test_flash_custom_scale():
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (1, 32, 1, 16))
    k = jax.random.normal(ks[1], (1, 32, 1, 16))
    v = jax.random.normal(ks[2], (1, 32, 1, 16))
    ref = einsum_sdpa(q, k, v, scale=0.5)
    out = flash_attention(q, k, v, scale=0.5, block_q=16, block_k=16,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize(
    "b,tq,tk,h,d",
    [
        (1, 64, 64, 2, 32),
        (2, 100, 77, 2, 32),   # ragged q and kv (padding in both grids)
    ],
)
def test_flash_backward_matches_einsum(b, tq, tk, h, d):
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    q = jax.random.normal(ks[0], (b, tq, h, d))
    k = jax.random.normal(ks[1], (b, tk, h, d))
    v = jax.random.normal(ks[2], (b, tk, h, d))
    cot = jax.random.normal(ks[3], (b, tq, h, d))

    def loss_ref(q, k, v):
        return jnp.vdot(einsum_sdpa(q, k, v), cot)

    def loss_flash(q, k, v):
        return jnp.vdot(
            flash_attention(q, k, v, block_q=32, block_k=32, interpret=True),
            cot,
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_out = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for name, a, o in zip("qkv", g_ref, g_out):
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(a), atol=5e-5, err_msg=f"d{name}"
        )


def test_flash_backward_custom_scale():
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    q = jax.random.normal(ks[0], (1, 48, 1, 16))
    k = jax.random.normal(ks[1], (1, 40, 1, 16))
    v = jax.random.normal(ks[2], (1, 40, 1, 16))

    def f(fn):
        return jax.grad(lambda q: fn(q).sum())(q)

    g_ref = f(lambda q: einsum_sdpa(q, k, v, scale=0.3))
    g_out = f(lambda q: flash_attention(q, k, v, scale=0.3, block_q=16,
                                        block_k=16, interpret=True))
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref), atol=5e-5)

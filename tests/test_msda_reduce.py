"""Parity: the Pallas corner-reduce kernel vs the XLA mxu reduce.

Covers the fused single-pass kernel (ops/msda_reduce.py) against the
flatlanes "mxu" formulation — identical math, so agreement is to fp32
accumulation tolerance — plus gradients through the custom VJP, non-TESTR
geometry, and the NQ-padding path. Runs in interpret mode on the CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tair_tpu.ops.msda_reduce import msda_corner_reduce
from tair_tpu.spotter.ms_deform_attn import (
    ms_deform_attn_core_flatlanes,
    patchify_value,
)

SHAPES = ((4, 4), (8, 8), (16, 16), (16, 16))
S = sum(h * w for h, w in SHAPES)


def _inputs(key, b=1, q=37, h=8, L=4, p=4, d=32):
    ks = jax.random.split(key, 4)
    lanes = h * L * p
    value = jax.random.normal(ks[0], (b, S, h, d), jnp.float32)
    locx = jax.random.uniform(ks[1], (b, q, lanes), minval=-0.1, maxval=1.1)
    locy = jax.random.uniform(ks[2], (b, q, lanes), minval=-0.1, maxval=1.1)
    attn = jax.nn.softmax(jax.random.normal(ks[3], (b, q, lanes)), axis=-1)
    return value, locx, locy, attn


def _run(value, locx, locy, attn, reduce):
    return ms_deform_attn_core_flatlanes(
        value, SHAPES, locx, locy, attn, q_chunk=1 << 20, reduce=reduce
    )


def test_forward_matches_mxu():
    value, locx, locy, attn = _inputs(jax.random.PRNGKey(0))
    ref = _run(value, locx, locy, attn, "mxu")
    out = _run(value, locx, locy, attn, "pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_forward_bf16_value():
    value, locx, locy, attn = _inputs(jax.random.PRNGKey(1), q=64)
    value = value.astype(jnp.bfloat16)
    ref = _run(value, locx, locy, attn, "mxu")
    out = _run(value, locx, locy, attn, "pallas_interpret")
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


def test_gradients_match_mxu():
    value, locx, locy, attn = _inputs(jax.random.PRNGKey(2), q=19)
    cot = jax.random.normal(jax.random.PRNGKey(3), (1, 19, 256), jnp.float32)

    def loss(reduce):
        def f(v, lx, ly, aw):
            return jnp.vdot(_run(v, lx, ly, aw, reduce), cot)
        return jax.grad(f, argnums=(0, 1, 2, 3))(value, locx, locy, attn)

    g_ref = loss("mxu")
    g_out = loss("pallas_interpret")
    for a, b in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_kernel_direct_padding_and_groups():
    # NQ=5 not divisible by qt -> exercises the pad/slice path; k=4 groups
    key = jax.random.PRNGKey(4)
    nq, lanes, d, k = 5, 8, 16, 4
    g = jax.random.normal(key, (nq * lanes, 4 * d), jnp.float32)
    ws = [
        jax.random.uniform(jax.random.PRNGKey(10 + i), (nq, lanes))
        for i in range(4)
    ]
    out = msda_corner_reduce(g, *ws, k, 32, True)
    g5 = np.asarray(g).reshape(nq, lanes, 4, d)
    w = np.stack([np.asarray(x) for x in ws], axis=2)  # [nq, lanes, 4]
    ref = (g5 * w[..., None]).sum(2).reshape(nq, lanes // k, k, d).sum(2)
    np.testing.assert_allclose(
        np.asarray(out), ref.reshape(nq * (lanes // k), d), atol=1e-5
    )


@pytest.mark.parametrize("qcore", ["pallas_interpret"])
def test_chunked_path(qcore):
    # q > q_chunk routes through lax.map; kernel must agree there too
    value, locx, locy, attn = _inputs(jax.random.PRNGKey(5), q=70)
    ref = ms_deform_attn_core_flatlanes(
        value, SHAPES, locx, locy, attn, q_chunk=1 << 20, reduce="mxu"
    )
    out = ms_deform_attn_core_flatlanes(
        value, SHAPES, locx, locy, attn, q_chunk=32, reduce=qcore
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

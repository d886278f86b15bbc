"""Pallas patchify kernel: parity with the XLA concat packing + custom VJP."""

import jax
import jax.numpy as jnp
import numpy as np

from tair_tpu.ops.patchify import patchify_value_pallas
from tair_tpu.spotter.ms_deform_attn import patchify_value

SHAPES = ((3, 5), (2, 2), (4, 4))
S = sum(h * w for h, w in SHAPES)


def _value(b=2, h=2, d=8, seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(b, S, h, d).astype(np.float32)
    )


def test_forward_parity():
    v = _value()
    ref = patchify_value(v, SHAPES)
    out = patchify_value_pallas(v, SHAPES, True)  # interpret mode on CPU
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_vjp_matches_autodiff_of_reference():
    v = _value(b=1, h=2, d=4, seed=1)
    cot = jnp.asarray(
        np.random.RandomState(2).randn(1 * 2 * S, 4 * 4).astype(np.float32)
    )

    def f_ref(x):
        return jnp.vdot(patchify_value(x, SHAPES), cot)

    def f_pal(x):
        return jnp.vdot(patchify_value_pallas(x, SHAPES, True), cot)

    g_ref = jax.grad(f_ref)(v)
    g_pal = jax.grad(f_pal)(v)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref), atol=1e-5)


def test_core_flatpatch_pallas_option():
    from tair_tpu.spotter.ms_deform_attn import (
        ms_deform_attn_core,
        ms_deform_attn_core_flatpatch,
    )

    b, h, d, p = 1, 2, 8, 3
    L = len(SHAPES)
    q = 7
    rng = np.random.RandomState(3)
    v = _value(b=b, h=h, d=d, seed=3)
    locs = jnp.asarray(rng.rand(b, q, h, L, p, 2).astype(np.float32)) * 1.2 - 0.1
    wts = jax.nn.softmax(
        jnp.asarray(rng.randn(b, q, h, L, p).astype(np.float32)).reshape(b, q, h, -1)
    ).reshape(b, q, h, L, p)

    ref = ms_deform_attn_core(v, SHAPES, locs, wts)
    # pre-patchified input through the pallas kernel (interpret on CPU)
    vp = patchify_value_pallas(v, SHAPES, True)
    out = ms_deform_attn_core_flatpatch(
        v, SHAPES, locs, wts, value_patched=vp
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

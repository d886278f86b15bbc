"""Experimental lab for the msda corner-reduce Pallas kernel.

Incremental variants to locate where device time goes, at encoder geometry
(NQ=9472, lanes=128, D=32, K=16; g = 310 MB bf16 per call, BW floor 0.38ms):

  copy      load g block, store the first D lanes        (pipeline floor)
  seg       corner-sum via one [4D,D] MXU matmul per block + K reshape-sum
  segw      full math: per-query weight columns (MXU-transposed tiles),
            multiply into a VMEM scratch (f32), one seg matmul, K sum
  segw16    segw with the weighted product kept bf16 until the seg matmul
  bcast     the production "bcast" kernel shape for reference

Variants take a :qt suffix (e.g. segw:128). check:<v>:<qt> verifies math.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/msda_kernel_lab.py segw:64 ...
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tair_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

NQ, LANES, D, K = 9472, 128, 32, 16
GROUPS = LANES // K
REPS = 20

MEM = {"memory_space": pltpu.VMEM}


def _seg_const(dtype):
    # [4D, D] tile(eye(D), (4,1)) built from iota (constants can't be
    # captured by pallas kernels)
    rows = jax.lax.broadcasted_iota(jnp.int32, (4 * D, D), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (4 * D, D), 1)
    return (rows % D == cols).astype(dtype)


def _eye_const(n, dtype):
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (rows == cols).astype(dtype)


def _copy_kernel(g_ref, w0, w1, w2, w3, o_ref, *, qt):
    del w0, w1, w2, w3
    g = g_ref[:]
    o_ref[:] = g[: qt * GROUPS, :D].astype(jnp.float32)


def _seg_kernel(g_ref, w0, w1, w2, w3, o_ref, *, qt):
    del w0, w1, w2, w3
    seg = _seg_const(jnp.bfloat16)
    t = jax.lax.dot_general(
        g_ref[:], seg, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [qt*LANES, D]
    o_ref[:] = t.reshape(qt * GROUPS, K, D).sum(axis=1)


def _segw_kernel(g_ref, w0_ref, w1_ref, w2_ref, w3_ref, o_ref, gw_ref, *, qt):
    eye = _eye_const(qt, jnp.float32)
    wts = [
        jax.lax.dot_general(
            w_ref[:], eye, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [LANES, qt]
        for w_ref in (w0_ref, w1_ref, w2_ref, w3_ref)
    ]

    def body(qq, _):
        wq = jnp.concatenate(
            [
                jnp.broadcast_to(
                    jax.lax.dynamic_slice(w, (0, qq), (LANES, 1)), (LANES, D)
                )
                for w in wts
            ],
            axis=1,
        )  # [LANES, 4D]
        gw_ref[pl.ds(qq * LANES, LANES), :] = (
            g_ref[pl.ds(qq * LANES, LANES), :].astype(jnp.float32) * wq
        )
        return 0

    jax.lax.fori_loop(0, qt, body, 0)
    seg = _seg_const(jnp.float32)
    t = jax.lax.dot_general(
        gw_ref[:], seg, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = t.reshape(qt * GROUPS, K, D).sum(axis=1)


def _segw16_kernel(g_ref, w0_ref, w1_ref, w2_ref, w3_ref, o_ref, gw_ref, *, qt):
    eye = _eye_const(qt, jnp.float32)
    wts = [
        jax.lax.dot_general(
            w_ref[:], eye, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        for w_ref in (w0_ref, w1_ref, w2_ref, w3_ref)
    ]

    def body(qq, _):
        wq = jnp.concatenate(
            [
                jnp.broadcast_to(
                    jax.lax.dynamic_slice(w, (0, qq), (LANES, 1)), (LANES, D)
                )
                for w in wts
            ],
            axis=1,
        )
        gw_ref[pl.ds(qq * LANES, LANES), :] = (
            g_ref[pl.ds(qq * LANES, LANES), :] * wq
        )
        return 0

    jax.lax.fori_loop(0, qt, body, 0)
    seg = _seg_const(jnp.bfloat16)
    t = jax.lax.dot_general(
        gw_ref[:], seg, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = t.reshape(qt * GROUPS, K, D).sum(axis=1)


def _bcast_kernel(g_ref, w0_ref, w1_ref, w2_ref, w3_ref, o_ref, *, qt):
    g3 = g_ref[:].reshape(qt, LANES, 4 * D)
    acc = None
    for c, w_ref in enumerate((w0_ref, w1_ref, w2_ref, w3_ref)):
        w = w_ref[:]
        t = g3[:, :, c * D : (c + 1) * D].astype(jnp.float32) * w[:, :, None]
        acc = t if acc is None else acc + t
    o_ref[:] = acc.reshape(qt * GROUPS, K, D).sum(axis=1)


KERNELS = {
    "copy": (_copy_kernel, None),
    "seg": (_seg_kernel, None),
    "segw": (_segw_kernel, jnp.float32),
    "segw16": (_segw16_kernel, jnp.bfloat16),
    "bcast": (_bcast_kernel, None),
}


def build(variant, qt):
    kernel_fn, scratch_dtype = KERNELS[variant]
    kernel = functools.partial(kernel_fn, qt=qt)
    scratch = (
        [pltpu.VMEM((qt * LANES, 4 * D), scratch_dtype)]
        if scratch_dtype is not None
        else []
    )
    w_spec = pl.BlockSpec((qt, LANES), lambda i: (i, 0), **MEM)
    pad = (-NQ) % qt
    nqp = NQ + pad

    def fn(g, w0, w1, w2, w3):
        if pad:
            g = jnp.pad(g, ((0, pad * LANES), (0, 0)))
            w0, w1, w2, w3 = (
                jnp.pad(w, ((0, pad), (0, 0))) for w in (w0, w1, w2, w3)
            )
        out = pl.pallas_call(
            kernel,
            grid=(nqp // qt,),
            in_specs=[
                pl.BlockSpec((qt * LANES, 4 * D), lambda i: (i, 0), **MEM),
                w_spec, w_spec, w_spec, w_spec,
            ],
            out_specs=pl.BlockSpec(
                (qt * GROUPS, D), lambda i: (i, 0), **MEM
            ),
            out_shape=jax.ShapeDtypeStruct((nqp * GROUPS, D), jnp.float32),
            scratch_shapes=scratch,
        )(g, w0, w1, w2, w3)
        return out[: NQ * GROUPS]

    return fn


key = jax.random.PRNGKey(0)
g = jax.random.normal(key, (NQ * LANES, 4 * D), jnp.bfloat16)
ws = [
    jax.random.uniform(jax.random.PRNGKey(i + 1), (NQ, LANES), jnp.float32)
    for i in range(4)
]


def bench(label, fn):
    @jax.jit
    def run(g, w0, w1, w2, w3):
        def body(i, acc):
            o = fn(g, w0 + acc * 0, w1, w2, w3)
            return acc + jnp.mean(o[:8]) * 1e-9

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))

    float(run(g, *ws))
    t0 = time.perf_counter()
    float(run(g, *ws))
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{label:40s} {ms:7.3f} ms/call")


def check(variant, qt):
    fn = build(variant, qt)
    out = np.asarray(fn(g, *ws))
    g5 = np.asarray(g, np.float32).reshape(NQ, LANES, 4, D)
    w = np.stack([np.asarray(x) for x in ws], axis=2)  # [NQ, LANES, 4]
    ref = (g5 * w[..., None]).sum(2).reshape(NQ, GROUPS, K, D).sum(2)
    ref = ref.reshape(NQ * GROUPS, D)
    err = np.abs(out - ref).max()
    print(f"{variant}:{qt} max err {err:.5f}")


for spec in sys.argv[1:] or ["copy:128", "seg:128", "segw:128"]:
    parts = spec.split(":")
    if parts[0] == "check":
        check(parts[1], int(parts[2]) if len(parts) > 2 else 32)
    else:
        v, qt = parts[0], int(parts[1]) if len(parts) > 1 else 32
        bench(f"pallas {v} qt={qt}", build(v, qt))

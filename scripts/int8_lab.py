"""Does int8 weight streaming pay on TPU inside a scan? (The UNet step is
weight-DMA bound at batch 1 — halving weight bytes is the only remaining
lever there; docs/PERFORMANCE.md "UNet / attention".)

Per shape family (conv 3x3 chain, dense chain at UNet-ish sizes), a 50-rep
lax.scan whose body streams a CHAIN of distinct weights (total well above
VMEM, so weights must stream from HBM every step — the UNet regime):

  1. bf16 baseline.
  2. int8 DEQUANT: w stored int8, converted to bf16 in-loop. Prediction:
     XLA hoists the loop-invariant dequant out of the scan -> bf16 stream,
     no win (it did exactly that to the fp32->bf16 master cast).
  3. int8 NATIVE: activations dynamically quantized per step, conv/dot runs
     s8 x s8 -> s32 on the MXU, per-tensor rescale. Weight bytes genuinely
     halve IF the TPU backend supports s8 conv/dot.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/int8_lab.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from tair_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

STEPS = 50
N_CONV = 12   # 12 x 7.4 MB bf16 conv weights = 88 MB/step streamed
N_DENSE = 8   # 8 x 2 x 13 MB bf16 dense weights = 210 MB/step streamed


def bench(label, fn, args):
    try:
        r = jax.jit(fn)
        # float() fetch: block_until_ready is not a reliable barrier through
        # the remote-device relay (same caveat as bench.py)
        float(r(*args))
        t0 = time.perf_counter()
        float(r(*args))
        dt = (time.perf_counter() - t0) / STEPS
        print(f"{label:44s} {dt*1e3:8.3f} ms/step", flush=True)
    except Exception as e:  # noqa: BLE001 — a lab: report and move on
        print(f"{label:44s} FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)


def scanned(body):
    def fn(x0, weights):
        def step(c, _):
            return body(c, weights), None

        out, _ = jax.lax.scan(step, x0, None, length=STEPS)
        return jnp.sum(out.astype(jnp.float32))

    return fn


def quant_w(w):
    w8 = jnp.round(jnp.clip(w.astype(jnp.float32) * 32.0, -127, 127)).astype(
        jnp.int8
    )
    return w8, jnp.float32(1.0 / 32.0)


def quant_x(xf):
    amax = jnp.max(jnp.abs(xf)) + 1e-6
    xs = 127.0 / amax
    x8 = jnp.round(jnp.clip(xf * xs, -127, 127)).astype(jnp.int8)
    return x8, xs


# ---------------- conv 3x3 chain, 640ch at 64x64 (UNet mid-ish) ----------------
C = 640
DN = ("NHWC", "HWIO", "NHWC")
x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, C), jnp.bfloat16)
ws = [
    jax.random.normal(jax.random.PRNGKey(10 + i), (3, 3, C, C), jnp.bfloat16) * 0.02
    for i in range(N_CONV)
]
ws8 = [quant_w(w) for w in ws]


def conv_chain_bf16(c, weights):
    for w in weights:
        c = jnp.tanh(
            jax.lax.conv_general_dilated(c, w, (1, 1), "SAME", dimension_numbers=DN)
        )
    return c


def conv_chain_dequant(c, weights):
    for w8, s in weights:
        wd = w8.astype(jnp.bfloat16) * jnp.bfloat16(s)
        c = jnp.tanh(
            jax.lax.conv_general_dilated(c, wd, (1, 1), "SAME", dimension_numbers=DN)
        )
    return c


def conv_chain_native8(c, weights):
    for w8, s in weights:
        x8, xs = quant_x(c.astype(jnp.float32))
        y = jax.lax.conv_general_dilated(
            x8, w8, (1, 1), "SAME", dimension_numbers=DN,
            preferred_element_type=jnp.int32,
        )
        c = jnp.tanh(y.astype(jnp.float32) * (s / xs)).astype(jnp.bfloat16)
    return c


bench("conv3x3 chain bf16", scanned(conv_chain_bf16), (x, ws))
bench("conv3x3 chain int8-dequant (hoist test)", scanned(conv_chain_dequant), (x, ws8))
bench("conv3x3 chain int8-native (s8xs8 MXU)", scanned(conv_chain_native8), (x, ws8))

# ---------------- dense chain (UNet FFN-ish: 1280 <-> 5120) ----------------
TOK = 4096
xd = jax.random.normal(jax.random.PRNGKey(1), (TOK, 1280), jnp.bfloat16)
wd = []
for i in range(N_DENSE):
    wd.append(
        jax.random.normal(jax.random.PRNGKey(100 + i), (1280, 5120), jnp.bfloat16)
        * 0.02
    )
    wd.append(
        jax.random.normal(jax.random.PRNGKey(200 + i), (5120, 1280), jnp.bfloat16)
        * 0.02
    )
wd8 = [quant_w(w) for w in wd]


def dense_chain_bf16(c, weights):
    for w in weights:
        c = jnp.tanh(jnp.dot(c, w))
    return c


def dense_chain_dequant(c, weights):
    for w8, s in weights:
        c = jnp.tanh(jnp.dot(c, w8.astype(jnp.bfloat16) * jnp.bfloat16(s)))
    return c


def dense_chain_native8(c, weights):
    for w8, s in weights:
        x8, xs = quant_x(c.astype(jnp.float32))
        y = jax.lax.dot_general(
            x8, w8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        c = jnp.tanh(y.astype(jnp.float32) * (s / xs)).astype(jnp.bfloat16)
    return c


bench("dense chain bf16", scanned(dense_chain_bf16), (xd, wd))
bench("dense chain int8-dequant", scanned(dense_chain_dequant), (xd, wd8))
bench("dense chain int8-native", scanned(dense_chain_native8), (xd, wd8))

"""Benchmark: full TeReDiff 512^2 images/sec/chip at 50 spaced-DDPM steps.

Measures the flagship text-aware loop — every denoising step runs
ControlNet+UNet, the TESTR spotter on the tapped decoder features, on-device
prompt splicing, and CLIP re-encoding (the val_sample semantics,
fully compiled; see tair_tpu/pipeline.py restore_fused_feedback) — plus the
SwinIR clean, VAE encode/decode.

Output contract: one JSON line on stdout; the driver parses the LAST such
line. This script prints a complete JSON line after EVERY timed rep (flushed),
so a driver timeout (SIGTERM/SIGKILL mid-run) can never erase an
already-measured number — the round-2 failure mode (BENCH_r02 rc=124,
parsed:null, after a ~36-min cold compile ate the whole budget).

Cold-start defenses, in order of leverage (see docs/PERFORMANCE.md
"Bench cold start"):
  1. param init + bf16 cast fused into ONE jitted program — unjitted init
     ran ~600 micro-ops, each a separate remote-relay compile/load
     round-trip (the bulk of the round-2 "warm" 9.5-min mystery);
  2. persistent compile cache (/tmp survives across driver sessions, so a
     round-end prewarm run makes the driver's bench a warm start);
  3. AOT lower/compile with per-phase wall-clock logs on stderr, so any
     future timeout is attributable from the captured tail;
  4. device work runs in a worker thread; the main thread stays responsive
     to SIGTERM and emits the best-available JSON before exiting.

The reference has no published numbers (BASELINE.json `published:{}`), so
`vs_baseline` is reported against a measured-class PyTorch-A100 anchor of
0.04 img/s for the same 50-step spotter-in-the-loop workload; the driver's
own baseline run supersedes it.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import threading
import time

A100_ANCHOR_IMG_PER_S = 0.04  # spotter-in-loop anchor (see docstring)

_T0 = time.time()


def _log(msg: str) -> None:
    """Timestamped progress note on stderr (stdout is JSON-only)."""
    print(f"# [{time.strftime('%H:%M:%S')} +{time.time() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


class _State:
    """Shared between the worker thread and the signal-handling main thread."""

    def __init__(self) -> None:
        self.lock = threading.Lock()
        self.times: list[float] = []
        self.batch = 1
        self.n_chips = 1
        self.metric = "terediff_512px_images_per_sec_per_chip_50steps_with_ocr_loop"
        self.phases: dict[str, float] = {}
        self.target_reps = 5
        self.emitted = False
        self.done = threading.Event()

    def emit(self) -> bool:
        """Print one complete JSON line from whatever reps have finished."""
        with self.lock:
            times = sorted(self.times)
            if not times:
                return False
            n = len(times)
            median = times[n // 2] if n % 2 else (
                (times[n // 2 - 1] + times[n // 2]) / 2
            )
            v = self.batch / median / self.n_chips
            line = {
                "metric": self.metric,
                "value": round(v, 5),
                "unit": "img/s/chip",
                "vs_baseline": round(v / A100_ANCHOR_IMG_PER_S, 3),
                # provenance of the vs_baseline denominator: the reference
                # publishes no numbers (BASELINE.json published:{}), so this
                # is a builder-estimated anchor, not a harness measurement
                "baseline_anchor_img_per_s": A100_ANCHOR_IMG_PER_S,
                "baseline_provenance": (
                    "builder-estimated A100 anchor for the same 50-step "
                    "spotter-in-loop workload; reference repo publishes no "
                    "benchmark numbers"
                ),
                "reps": n,
                "spread_img_per_s": [
                    round(self.batch / times[-1] / self.n_chips, 5),
                    round(self.batch / times[0] / self.n_chips, 5),
                ],
                "phases_s": {k: round(s, 1) for k, s in self.phases.items()},
            }
            print(json.dumps(line), flush=True)
            self.emitted = True
            return True


STATE = _State()


def _wait_for_devices(attempts: int = 3, delay_s: float = 30.0) -> None:
    """The remote-TPU relay occasionally drops for minutes at a time; retry
    backend init instead of recording a bogus bench failure — but with short
    delays: retry sleeps must not stack onto the compile inside the driver's
    time budget (round-2 lesson)."""
    import jax

    for i in range(attempts):
        try:
            jax.devices()
            break
        except RuntimeError as e:
            if i == attempts - 1:
                raise
            _log(f"backend unavailable ({e}); retry {i + 1}/{attempts}")
            time.sleep(delay_s)
    # after a failed TPU init JAX may have cached the CPU backend and the
    # retry 'succeeds' on it — never record CPU throughput as img/s/chip
    platform = jax.devices()[0].platform
    if platform not in ("tpu", "axon") and not os.environ.get(
        "TAIR_BENCH_ALLOW_CPU"
    ):
        raise RuntimeError(
            f"bench requires a TPU backend, got {platform!r} "
            "(set TAIR_BENCH_ALLOW_CPU=1 to override for debugging)"
        )


def _measure() -> None:
    import jax
    import jax.numpy as jnp

    from tair_tpu.ops.attention import enable_inference_kernels
    from tair_tpu.pipeline import build_default_model
    from tair_tpu.utils.compile_cache import enable_compile_cache

    _wait_for_devices()
    enable_compile_cache()
    enable_inference_kernels()
    _log(f"backend up: {jax.device_count()} x {jax.devices()[0].platform}")

    # sparse encoder update (serving knob like spotter_every; 0 = exact
    # reference semantics, the headline default — see docs/PERFORMANCE.md)
    enc_topk = int(os.environ.get("TAIR_BENCH_ENC_TOPK", "0"))
    overrides = {"enc_topk": enc_topk} if enc_topk else None
    # w8a8 UNet+ControlNet serving quantization (ops/quant.py; approximation
    # knob like enc_topk/spotter_every — never the headline default)
    quantized = os.environ.get("TAIR_BENCH_QUANT", "0") == "1"
    static_amax = os.environ.get("TAIR_QUANT_STATIC_AMAX")
    min_ratio = os.environ.get("TAIR_QUANT_MIN_RATIO")
    model = build_default_model(
        dtype=jnp.bfloat16, testr_overrides=overrides, quantized=quantized,
        quant_static_amax=float(static_amax) if static_amax else None,
        quant_min_ratio=float(min_ratio) if min_ratio else None,
    )

    # batch 1 is the throughput-optimal configuration on a v5e chip: the
    # round-2 sweep measured 0.348 (b=1) vs 0.299 (b=2) vs 0.301 (b=4)
    # img/s/chip bf16-resident — the loop is dominated by linearly-scaling
    # msda gathers, and batch>=2 additionally loses ~16%/image to unfused
    # convs + layout copies (scripts/trace_diff.py; docs/PERFORMANCE.md)
    batch = int(os.environ.get("TAIR_BENCH_BATCH", "1"))
    # headline metric runs the spotter EVERY step (reference val_sample
    # semantics, spaced_sampler.py:283-317); >1 is the measured serving
    # trade documented in PERFORMANCE.md, never the reported default
    spotter_every = int(os.environ.get("TAIR_BENCH_SPOTTER_EVERY", "1"))
    steps = 50
    cast = os.environ.get("TAIR_BENCH_CAST", "1") == "1"

    with STATE.lock:
        STATE.batch = batch
        STATE.n_chips = jax.device_count()
        STATE.metric = (
            "terediff_512px_images_per_sec_per_chip_50steps_with_ocr_loop"
            + (f"_spotter_every{spotter_every}" if spotter_every != 1 else "")
            + (f"_enc_topk{enc_topk}" if enc_topk else "")
            + (
                "_w8a8"
                + ("_static" if static_amax else "")
                + (f"_minratio{min_ratio}" if min_ratio else "")
                if quantized else ""
            )
        )
        STATE.target_reps = int(os.environ.get("TAIR_BENCH_REPS", "5"))

    # --- param init: ONE compiled program -----------------------------------
    # An unjitted model.init traces/executes each random initializer as its
    # own tiny jit — through the remote-compile relay that is ~600 separate
    # compile+load round-trips (minutes even when disk-cached). Fusing init
    # and the bf16 serving cast into one program makes it one round-trip.
    def init_all(rng):
        params = model.init(rng, latent_hw=8)
        if cast:
            from tair_tpu.pipeline import cast_params_for_inference

            # bf16-resident params (default): XLA AOT memory analysis shows
            # fp32 masters cost 6.3 GiB args + 3.7 GiB temps vs 3.2 + 0.8 GiB
            # bf16-resident, and measured throughput is slightly better too
            # (0.348 vs 0.344 img/s/chip, round 2) — the serving config.
            params = cast_params_for_inference(params)
        return params

    aot_only = os.environ.get("TAIR_BENCH_AOT_ONLY") == "1"
    t = time.time()
    if aot_only:
        # prewarm: cache the init program's compile and keep only the param
        # SHAPES — no device execution, safe while another process trains
        jax.jit(init_all).lower(jax.random.PRNGKey(0)).compile()
        params = jax.eval_shape(init_all, jax.random.PRNGKey(0))
        _log(f"init program cached (AOT) in {time.time() - t:.1f}s")
    else:
        params = jax.jit(init_all)(jax.random.PRNGKey(0))
        jax.block_until_ready(params)
        STATE.phases["init"] = time.time() - t
        _log("params initialized (single program) in "
             f"{STATE.phases['init']:.1f}s")

    @jax.jit
    def run(params, rng):
        # the fixed-key LQ draw lives inside the program: one fewer compiled
        # program, identical input across reps (key is a constant)
        lq = jax.random.uniform(
            jax.random.PRNGKey(1), (batch, 512, 512, 3)
        )
        restored, _ = model.restore_fused_feedback(
            params, lq, rng, steps=steps, spotter_every=spotter_every
        )
        # scalar reduction forces full materialization on fetch
        return jnp.mean(restored)

    # --- AOT lower + compile with phase attribution -------------------------
    t = time.time()
    lowered = run.lower(params, jax.random.PRNGKey(2))
    STATE.phases["lower"] = time.time() - t
    _log(f"traced+lowered in {STATE.phases['lower']:.1f}s")

    t = time.time()
    compiled = lowered.compile()
    STATE.phases["compile"] = time.time() - t
    _log(f"compiled in {STATE.phases['compile']:.1f}s "
         "(fast = persistent-cache hit)")

    # prewarm mode: populate the persistent compile cache and exit WITHOUT
    # touching the device (safe to run while another process trains on the
    # chip — compiles go to the remote compile service, not the device)
    if aot_only:
        _log("AOT-only: compile cached, exiting before device execution")
        return

    # warmup: first execution includes one-time transfer/load latency; one
    # retry in case the device worker needs a moment to recover from a
    # previous session's fault
    t = time.time()
    try:
        float(compiled(params, jax.random.PRNGKey(2)))
    except Exception as e:
        _log(f"warmup failed ({e}); retrying in 60s")
        time.sleep(60)
        float(compiled(params, jax.random.PRNGKey(2)))
    STATE.phases["warmup"] = time.time() - t
    _log(f"warmup exec in {STATE.phases['warmup']:.1f}s")

    # --- timed reps: emit a full JSON line after EVERY rep ------------------
    # median-of-N with per-rep timing: repeat runs through the remote-device
    # relay have shown 3x spread in the past (STATUS round 1), so a single
    # mean is not a defensible number — report median and the full spread
    for i in range(STATE.target_reps):
        t0 = time.perf_counter()
        # float() fetch each iteration: cannot complete without the full
        # 50-step chain executing (block_until_ready alone is not a reliable
        # barrier through the remote-device relay)
        float(compiled(params, jax.random.PRNGKey(3 + i)))
        dt = time.perf_counter() - t0
        with STATE.lock:
            STATE.times.append(dt)
        STATE.emit()
        _log(f"rep {i + 1}/{STATE.target_reps}: {dt:.3f}s")


def _on_term(signum, frame):  # pragma: no cover - signal path
    _log(f"signal {signum}: emitting best-available result and exiting")
    ok = STATE.emit() or STATE.emitted
    sys.stdout.flush()
    os._exit(0 if ok else 124)


def main() -> None:
    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)

    err: list[BaseException] = []

    def work():
        try:
            _measure()
        except BaseException as e:  # noqa: BLE001 - report, then re-raise
            err.append(e)
        finally:
            STATE.done.set()

    # device work in a daemon worker so the main thread can service SIGTERM
    # even while a minutes-long XLA compile blocks inside C++
    t = threading.Thread(target=work, daemon=True)
    t.start()
    while not STATE.done.wait(0.2):
        pass
    if err:
        raise err[0]


if __name__ == "__main__":
    main()

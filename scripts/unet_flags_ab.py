"""A/B XLA compiler flags for the UNet+ControlNet step on chip.

The op-level trace (scripts/unet_trace.py) shows the batch-1 cldm step is
dominated by async weight-prefetch copies running at ~19% of HBM bandwidth
(15.6 ms measured vs a ~3 ms weight-stream + ~6 ms MXU roofline). The knobs
XLA exposes for that are prefetch depth / scoped-VMEM budget / the latency
hiding scheduler. XLA_FLAGS must be set before backend init, so this script
re-execs itself once per flag set and reports amortized step time.

Usage: python scripts/unet_flags_ab.py            # runs every flag set
       _UNET_AB_FLAGS="..." python scripts/unet_flags_ab.py --child
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

FLAG_SETS = {
    "baseline": "",
    # give the prefetcher a larger scoped-VMEM budget (default ~16 MiB
    # of the 128 MiB VMEM; more lets it stage bigger/multiple weight blocks)
    "scoped_vmem_64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "scoped_vmem_96m": "--xla_tpu_scoped_vmem_limit_kib=98304",
    # rerun the latency-hiding scheduler with a relaxed memory target
    "lhs_rerun": "--xla_latency_hiding_scheduler_rerun=3",
    "combo": (
        "--xla_tpu_scoped_vmem_limit_kib=65536 "
        "--xla_latency_hiding_scheduler_rerun=3"
    ),
}

REPS = 10


def child() -> None:
    import jax
    import jax.numpy as jnp

    from tair_tpu.models.cldm import ControlLDM
    from tair_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    cldm = ControlLDM.create(dtype=jnp.bfloat16)
    params = cldm.init(jax.random.PRNGKey(0), latent_hw=8)
    x = jnp.zeros((1, 64, 64, 4), jnp.float32)
    t = jnp.full((1,), 500, jnp.int32)
    cond = dict(
        c_txt=jnp.zeros((1, 77, 1024), jnp.float32),
        c_img=jnp.zeros((1, 64, 64, 4), jnp.float32),
    )

    @jax.jit
    def run(p, x):
        def body(i, x):
            eps, _ = cldm.apply(p, x, t, cond)
            return eps

        return jax.lax.fori_loop(0, REPS, body, x)

    jax.block_until_ready(run(params, x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(params, x))
        best = min(best, (time.perf_counter() - t0) / REPS * 1e3)
    print(f"RESULT {os.environ.get('_UNET_AB_NAME', '?')}: {best:.2f} ms/step")


def main() -> None:
    for name, flags in FLAG_SETS.items():
        env = dict(os.environ)
        base = env.get("XLA_FLAGS", "")
        env["XLA_FLAGS"] = (base + " " + flags).strip()
        env["_UNET_AB_NAME"] = name
        try:
            r = subprocess.run(
                [sys.executable, __file__, "--child"], env=env,
                capture_output=True, text=True, timeout=3600,
            )
        except subprocess.TimeoutExpired:
            print(f"RESULT {name}: TIMEOUT (>3600s compile/run)")
            continue
        out = [l for l in r.stdout.splitlines() if l.startswith("RESULT")]
        print(out[-1] if out else f"RESULT {name}: FAILED rc={r.returncode}\n"
              + r.stderr[-500:])


if __name__ == "__main__":
    child() if "--child" in sys.argv else main()

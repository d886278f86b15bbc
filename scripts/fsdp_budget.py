"""Analytic FSDP state-memory budget at production widths (no devices).

jax.eval_shape builds the full TrainState shape tree (fp32 masters + AdamW
moments for the stage's trainable subset), then parallel/fsdp.py's shape
rule reports per-device bytes for a sweep of data-axis sizes. This is the
capacity-planning table for multi-chip training: the reference replicates
all of it per DDP rank (/root/reference/train.py:66-67).

Usage: python scripts/fsdp_budget.py  (pure host, runs anywhere)
"""

import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

from tair_tpu.parallel.fsdp import fraction_for
from tair_tpu.pipeline import build_default_model
from tair_tpu.train.step import create_train_state


def gib(n):
    return f"{n / 2**30:6.2f}"


def main():
    model = build_default_model()
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), latent_hw=8)
    )
    for stage in ("stage1", "stage3"):
        state = jax.eval_shape(
            lambda p: create_train_state(p, stage, 1e-4)[0], params
        )
        print(f"\n{stage} TrainState (fp32 masters + AdamW moments):")
        print("  n_data | total GiB | per-device GiB | sharded %")
        for n in (1, 2, 4, 8, 16, 32):
            sharded, total, per_dev = fraction_for(state, n)
            print(
                f"  {n:6d} | {gib(total)}    | {gib(per_dev)}         "
                f"| {100 * sharded / total:5.1f}"
            )


if __name__ == "__main__":
    main()

"""Observability: console + JSONL metric logging, HBM tracing, profiling.

Counterpart of the reference's wandb/tensorboard logging (train.py:200-227)
and VRAM tracing (TRACE_VRAM env, terediff/utils/common.py:237-282). Here:
a dependency-free JSONL metric stream per experiment, process-0 gating for
multi-host, `TRACE_HBM=1` device-memory reporting, and a context manager
around `jax.profiler` for XLA traces.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional

import jax


def is_main_process() -> bool:
    return jax.process_index() == 0


class MetricLogger:
    """JSONL + console metric stream, with optional mirror backends:
    log_tool="tensorboard" (torch SummaryWriter, in-env) or "wandb"
    (external credentials; fails loudly if absent) — the two sinks the
    reference's `log_args.log_tool` selects between (train.py:200-227)."""

    def __init__(
        self,
        exp_dir: str,
        filename: str = "metrics.jsonl",
        log_tool: Optional[str] = None,
    ):
        self.exp_dir = exp_dir
        self.path = os.path.join(exp_dir, filename)
        self._tb = None
        if is_main_process():
            os.makedirs(exp_dir, exist_ok=True)
            if log_tool == "tensorboard":
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(exp_dir, "tb"))
            elif log_tool == "wandb":
                import wandb  # not bundled; needs external credentials

                wandb.init(project="tair-tpu", dir=exp_dir)
                self._tb = wandb
            elif log_tool not in (None, "", "jsonl"):
                raise ValueError(f"unknown log_tool {log_tool!r}")
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict, prefix: str = "") -> None:
        if not is_main_process():
            return
        record = {
            "step": int(step),
            "time": round(time.time() - self._t0, 2),
            **{
                (f"{prefix}{k}"): (float(v) if hasattr(v, "__float__") else v)
                for k, v in metrics.items()
            },
        }
        if os.environ.get("TRACE_HBM") == "1":
            record["hbm"] = hbm_usage_mb()
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self._tb is not None:
            scalars = {
                k: v for k, v in record.items()
                if isinstance(v, float) and k not in ("time",)
            }
            if hasattr(self._tb, "add_scalar"):  # tensorboard
                for k, v in scalars.items():
                    self._tb.add_scalar(k, v, int(step))
            else:  # wandb
                self._tb.log(scalars, step=int(step))
        items = ", ".join(
            f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
            for k, v in record.items()
            if k not in ("time",)
        )
        print(f"[{record['time']:9.1f}s] {items}", flush=True)


def hbm_usage_mb() -> Optional[float]:
    try:
        stats = jax.local_devices()[0].memory_stats()
        return round(stats.get("bytes_in_use", 0) / 2**20, 1)
    except Exception:
        return None


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """XLA profiler trace (view with tensorboard/xprof)."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

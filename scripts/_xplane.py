"""Shared xplane-trace parsing for the profiling scripts.

One implementation of the protobuf walk (enc_trace / unet_trace /
fused_trace / trace_diff all need it; they previously each carried a copy
that could drift — e.g. only trace_diff had the 'XLA Ops' leaf-line filter
needed for non-double-counted self time).
"""

import glob
from collections import defaultdict


def op_totals(log_dir, leaf_only=False):
    """Sum device-op durations (ms) by op name from the latest xplane under
    log_dir. leaf_only=True restricts to the 'XLA Ops' timeline (leaf ops,
    no parent-region double counting)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xp = sorted(glob.glob(f"{log_dir}/**/*.xplane.pb", recursive=True))
    if not xp:
        return None
    xs = xplane_pb2.XSpace()
    with open(xp[-1], "rb") as f:
        xs.ParseFromString(f.read())
    total = defaultdict(float)
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if leaf_only and line.name != "XLA Ops":
                continue
            for ev in line.events:
                md = plane.event_metadata[ev.metadata_id]
                total[md.name] += ev.duration_ps / 1e9
    return total


def print_top(log_dir, top=12, per=1, leaf_only=False, width=100):
    """Print the top-N ops by total time, divided by `per` (e.g. rep count)."""
    total = op_totals(log_dir, leaf_only=leaf_only)
    if total is None:
        print("  (no xplane)")
        return
    if leaf_only:
        print(f"  device total: {sum(total.values()):.1f} ms")
    for name, ms in sorted(total.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {ms / per:8.3f} ms  {name[:width]}")

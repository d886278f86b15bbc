"""Diff two xplane traces (e.g. fused loop at b=1 vs b=2) by op category.

Groups leaf device ops into families (gather, msda reduce, conv, matmul,
copy, layout, ...) by fusion-name heuristics and prints per-category totals
side by side, normalized per image — locating where batch scaling loses.

Usage: python scripts/trace_diff.py /tmp/fused_trace_b1 1 /tmp/fused_trace_b2 2
"""

import glob
import sys
from collections import defaultdict


def leaf_totals(log_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xp = sorted(glob.glob(f"{log_dir}/**/*.xplane.pb", recursive=True))
    assert xp, f"no xplane under {log_dir}"
    xs = xplane_pb2.XSpace()
    with open(xp[-1], "rb") as f:
        xs.ParseFromString(f.read())
    totals = defaultdict(float)
    names = defaultdict(lambda: defaultdict(float))
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        # XLA Ops line: leaf events only (the op timeline, no nesting)
        for line in plane.lines:
            if line.name not in ("XLA Ops",):
                continue
            for ev in line.events:
                md = plane.event_metadata[ev.metadata_id]
                n = md.name
                cat = categorize(n)
                ms = ev.duration_ps / 1e9
                totals[cat] += ms
                names[cat][n.split(" = ")[0]] += ms
    return totals, names


def categorize(n):
    if n.startswith(("%copy-start", "%copy-done")):
        return "async-copy (DMA/prefetch)"
    low = n.lower()
    if "1212416,128" in n or "2424832,128" in n or "4849664,128" in n:
        # B*Q*lanes x 128: the msda corner-row gather + its consumers
        if "broadcast_select" in low:
            return "msda corner-weight select"
        return "msda row gather"
    if "convert_reduce" in low or ("9472,8,128" in n and "fusion" in low):
        return "msda reduce/convert"
    if "kind=kcustom" in low and "s32[" in low:
        # dynamic-gather custom fusions (decoder cross-attn row takes at
        # Q=1600/2500: s32 row indices into the [75776,128] packed table)
        return "msda row gather"
    if low.startswith("%maximum_maximum_fusion") and "9472,128" in n:
        # the patchify pack build (one [B,H,S,4D] table per msda module;
        # XLA names the fusion after its maximum root)
        return "msda pack"
    if low.startswith(("%convolution", "%conv")) or "conv" in low.split(".")[0]:
        return "convolution"
    if low.startswith(("%dot", "%gemm")) or "dot" in low.split(".")[0]:
        return "matmul"
    if low.startswith("%fusion"):
        return "other fusion"
    if low.startswith(("%copy", "%bitcast", "%transpose", "%reshape")):
        return "layout copy"
    if low.startswith(("%all-", "%reduce-scatter", "%collective")):
        return "collective"
    if low.startswith(("%while", "%conditional", "%call", "jit_")):
        return "(control)"
    return "misc"


def main():
    args = sys.argv[1:]
    runs = [(args[i], int(args[i + 1])) for i in range(0, len(args), 2)]
    results = [(d, b, *leaf_totals(d)) for d, b in runs]
    cats = sorted(
        {c for _, _, t, _ in results for c in t},
        key=lambda c: -max(t.get(c, 0) for _, _, t, _ in results),
    )
    hdr = "category".ljust(30) + "".join(
        f"{d.split('/')[-1]}/img".rjust(22) for d, _, _, _ in results
    )
    print(hdr)
    for c in cats:
        if c == "(control)":
            continue
        row = c.ljust(30)
        for _, b, t, _ in results:
            row += f"{t.get(c, 0.0) / b:18.1f} ms  "
        print(row)
    tot = "TOTAL (leaf, per img)".ljust(30)
    for _, b, t, _ in results:
        s = sum(v for k, v in t.items() if k != "(control)")
        tot += f"{s / b:18.1f} ms  "
    print(tot)

    # top individual ops per run for the biggest-moving categories
    for d, b, t, names in results:
        print(f"\n== {d} top ops ==")
        allops = [
            (ms, op, c) for c, ops in names.items() if c != "(control)"
            for op, ms in ops.items()
        ]
        for ms, op, c in sorted(allops, reverse=True)[:14]:
            print(f"  {ms / b:8.1f} ms/img  [{c}] {op[:90]}")


if __name__ == "__main__":
    main()

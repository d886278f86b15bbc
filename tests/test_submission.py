"""Submission writers round-trip through the reference's own scorer.

Builds an in-memory synthetic spotting dataset, writes it through
tair_tpu.utils.submission (COCO json -> RRC det.zip, plus gt.zip), feeds
the zips to the REFERENCE's evaluate_method (loaded with the oracle shims
from tests/test_text_eval_oracle.py), and asserts the oracle's scores equal
our in-memory evaluate_dataset on the same data — proving the dumped bundle
is faithful interchange, not just syntactically valid. Reference anchor:
/root/reference/testr/adet/evaluation/text_evaluation.py:83-89,247-277.
"""

import json
import os
import zipfile

import numpy as np
import pytest

from tair_tpu.utils.submission import (
    coco_json_to_rrc_zip,
    dump_coco_json,
    dump_submission,
    write_rrc_gt_zip,
)
from tair_tpu.utils.text_eval import SpottingInstance, evaluate_dataset
from tests.test_text_eval_oracle import (
    REF_EVAL_DIR,
    _load_reference_eval,
    _parse_oracle,
    _rect,
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_EVAL_DIR), reason="reference checkout not present"
)


def _inst(x, y, w, h, text, score=1.0, ccw=False):
    pts = np.asarray(_rect(x, y, w, h), np.float32)
    if ccw:
        pts = pts[::-1]
    return SpottingInstance(pts, text, score)


def _dataset():
    """Per-image GT/pred instances covering match, mismatch, miss, false
    positive, don't-care, low-score filtering, and CCW input polygons."""
    gts = [
        [_inst(0, 0, 100, 40, "HELLO"), _inst(200, 0, 100, 40, "World"),
         _inst(400, 0, 100, 40, "Missed")],
        [_inst(0, 0, 100, 40, "###"), _inst(200, 0, 100, 40, "again")],
        [_inst(0, 0, 100, 40, "solo")],
    ]
    preds = [
        # ccw pred polygon: the writer must flip it for the RRC format
        [_inst(0, 0, 100, 40, "hello", 0.9, ccw=True),
         _inst(200, 0, 100, 40, "wrong", 0.8),
         _inst(0, 300, 100, 40, "stray", 0.7)],
        [_inst(0, 0, 100, 40, "noise", 0.6),
         _inst(200, 0, 100, 40, "again", 0.95)],
        # below-threshold score: must be dropped by the writer AND excluded
        # from the in-memory scoring for the comparison
        [_inst(0, 0, 100, 40, "solo", 0.2)],
    ]
    return gts, preds


@pytest.mark.parametrize("word_spotting", [True, False])
def test_submission_roundtrip_matches_in_memory(tmp_path, word_spotting):
    script = _load_reference_eval()
    gts, preds = _dataset()
    th = 0.5

    paths = dump_submission(
        str(tmp_path), preds, [1, 2, 3], gts_per_image=gts,
        confidence_threshold=th,
    )

    params = script.default_evaluation_params()
    params["WORD_SPOTTING"] = word_spotting
    oracle = script.evaluate_method(paths["gt_zip"], paths["det_zip"], params)
    (o_p, o_r, o_h), (od_p, od_r, od_h) = _parse_oracle(oracle)

    kept = [[p for p in ps if p.score >= th] for ps in preds]
    ours = evaluate_dataset(gts, kept, word_spotting=word_spotting)
    assert ours["e2e_precision"] == pytest.approx(o_p, abs=1e-9)
    assert ours["e2e_recall"] == pytest.approx(o_r, abs=1e-9)
    assert ours["e2e_hmean"] == pytest.approx(o_h, abs=1e-9)
    assert ours["det_precision"] == pytest.approx(od_p, abs=1e-9)
    assert ours["det_recall"] == pytest.approx(od_r, abs=1e-9)
    assert ours["det_hmean"] == pytest.approx(od_h, abs=1e-9)


def test_coco_json_format(tmp_path):
    """The json matches the reference's instances_to_coco_json schema."""
    gts, preds = _dataset()
    path = str(tmp_path / "text_results.json")
    dump_coco_json(preds, [7, 8, 9], path)
    with open(path) as f:
        data = json.load(f)
    assert isinstance(data, list) and len(data) == 6
    det = data[0]
    assert set(det) == {"image_id", "category_id", "polys", "rec", "score"}
    assert det["image_id"] == 7 and det["category_id"] == 1
    assert np.asarray(det["polys"]).shape == (4, 2)
    assert isinstance(det["rec"], str) and isinstance(det["score"], float)


def test_rrc_zip_format_and_filters(tmp_path):
    gts, preds = _dataset()
    jpath = str(tmp_path / "r.json")
    dump_coco_json(preds, [1, 2, 3], jpath)
    zpath = coco_json_to_rrc_zip(jpath, str(tmp_path / "det.zip"), 0.5)
    with zipfile.ZipFile(zpath) as z:
        names = sorted(z.namelist())
        # image 3's only det is score 0.2 < 0.5: no file at all
        assert names == ["0000001.txt", "0000002.txt"]
        lines = z.read("0000001.txt").decode().strip().splitlines()
        assert len(lines) == 3
        for line in lines:
            coords, rec = line.split(",####")
            vals = [int(v) for v in coords.split(",")]
            assert len(vals) == 8  # 4-point rectangles
            pts = np.asarray(vals, np.float64).reshape(-1, 2)
            # clockwise in image coords == negative mathematical signed area
            x, y = pts[:, 0], pts[:, 1]
            area = 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
            assert area < 0, f"line not clockwise: {line}"


def test_rrc_zip_drops_degenerate_and_nonascii(tmp_path):
    preds = [[
        SpottingInstance(np.asarray([[0, 0], [10, 0]], np.float32), "ab", 0.9),
        SpottingInstance(
            np.asarray([[0, 0], [50, 0], [50, 20], [0, 20]], np.float32),
            "café", 0.9,
        ),
    ]]
    jpath = str(tmp_path / "r.json")
    dump_coco_json(preds, [1], jpath)
    zpath = coco_json_to_rrc_zip(jpath, str(tmp_path / "det.zip"), 0.5)
    with zipfile.ZipFile(zpath) as z:
        lines = z.read("0000001.txt").decode().strip().splitlines()
    assert len(lines) == 1  # 2-point line dropped
    assert lines[0].endswith(",####caf")  # non-ASCII stripped


def test_gt_zip_readable_by_oracle_parser(tmp_path):
    """gt.zip entries parse with the oracle's own line reader."""
    script = _load_reference_eval()
    gts, _ = _dataset()
    zpath = write_rrc_gt_zip(gts, [1, 2, 3], str(tmp_path / "gt.zip"))
    rrc = script.rrc_evaluation_funcs
    archive = rrc.load_zip_file(zpath, "")
    assert len(archive) == 3

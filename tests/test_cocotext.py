import json

import numpy as np

from tair_tpu.data.cocotext import bezier_to_polygon, load_cocotext
from tair_tpu.spotter.charset import encode_text


def test_bezier_to_polygon_straight_line():
    # degenerate beziers along straight lines -> evenly spaced points
    top = np.array([[0, 0], [10, 0], [20, 0], [30, 0]], np.float32)
    bot = np.array([[30, 10], [20, 10], [10, 10], [0, 10]], np.float32)
    bez = np.concatenate([top, bot]).reshape(-1)
    poly = bezier_to_polygon(bez, n_points=8)
    assert poly.shape == (16, 2)
    np.testing.assert_allclose(poly[0], [0, 0])
    np.testing.assert_allclose(poly[7], [30, 0])
    np.testing.assert_allclose(poly[8], [30, 10])
    np.testing.assert_allclose(np.diff(poly[:8, 0]), 30 / 7, atol=1e-4)


def test_load_cocotext(tmp_path):
    rec = encode_text("HI").tolist()
    coco = {
        "images": [{"id": 1, "width": 100, "height": 50, "file_name": "a.jpg"}],
        "annotations": [
            {
                "image_id": 1,
                "bbox": [10, 10, 40, 20],
                "rec": rec,
                "polys": [[10, 10], [50, 10], [50, 30], [10, 30]] * 4,
            },
            {"image_id": 1, "bbox": [0, 0, 5, 5]},  # no rec -> skipped
        ],
    }
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(coco))
    records = load_cocotext(
        str(tmp_path), json_file=str(p), image_root=str(tmp_path)
    )
    assert len(records) == 1
    r = records[0]
    assert r["text"] == ["HI"]
    assert r["poly"].shape == (1, 16, 2)
    assert r["poly"].max() <= 1.0
    np.testing.assert_allclose(r["bbox"][0], [0.3, 0.4, 0.4, 0.4], atol=1e-5)

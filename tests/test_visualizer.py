"""Visualizer: polygons/labels actually drawn; text panel renders lines."""

import numpy as np

from tair_tpu.utils.visualizer import TextVisualizer, text_panel


def test_draw_instances_marks_pixels():
    img = np.zeros((64, 64, 3), np.float32)
    polys = np.asarray(
        [[[8, 8], [40, 8], [40, 24], [8, 24]]], np.float32
    )
    out = TextVisualizer().draw_instances(img, polys, ["hi"], [0.9])
    assert out.shape == (64, 64, 3)
    assert out.max() > 0.0  # something was drawn
    # outline pixel on the top edge is colored
    assert out[8, 20].sum() > 0.0
    # empty predictions: image unchanged
    same = TextVisualizer().draw_spotter_output(img, {"pred_texts": []})
    np.testing.assert_array_equal(same, img)


def test_text_panel():
    out = text_panel(["hello world", "x" * 200], size=(128, 128))
    assert out.shape == (128, 128, 3)
    assert (out < 0.5).any()  # black text on white
    assert (out > 0.9).any()

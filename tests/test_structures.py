import numpy as np

from tair_tpu.utils.structures import (
    Instances,
    cxcywh_to_xyxy,
    instances_from_spotter,
    xywh_to_xyxy,
    xyxy_to_cxcywh,
    xyxy_to_xywh,
)


def test_instances_container():
    inst = Instances((512, 512))
    inst.set("scores", np.array([0.9, 0.5]))
    inst.set("recs", np.zeros((2, 25)))
    assert len(inst) == 2
    top = inst[inst.scores > 0.6]
    assert len(top) == 1
    assert top.scores[0] == 0.9


def test_box_mode_roundtrips():
    b = np.array([[10.0, 20.0, 30.0, 60.0]])  # xyxy
    np.testing.assert_allclose(xywh_to_xyxy(xyxy_to_xywh(b)), b)
    np.testing.assert_allclose(cxcywh_to_xyxy(xyxy_to_cxcywh(b)), b)
    np.testing.assert_allclose(xyxy_to_cxcywh(b), [[20, 40, 20, 40]])


def test_instances_from_spotter():
    result = {
        "keep": np.array([[True, False, True]]),
        "scores": np.array([[0.9, 0.1, 0.8]]),
        "polygons": np.zeros((1, 3, 16, 2)),
        "recs": np.zeros((1, 3, 25), np.int32),
        "rec_scores": np.zeros((1, 3, 25, 97)),
    }
    inst = instances_from_spotter(result, 512)
    assert len(inst) == 2
    np.testing.assert_allclose(inst.scores, [0.9, 0.8])

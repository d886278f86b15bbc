"""Native C++ Hungarian solver vs scipy on random cost matrices."""

import numpy as np
import pytest

from tair_tpu.native_ext import get_lib, lapjv_batch


@pytest.fixture(scope="module")
def lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def _scipy_ref(cost, n_valid):
    from scipy.optimize import linear_sum_assignment

    b, q, m = cost.shape
    out = np.full((b, m), -1, np.int32)
    for i in range(b):
        n = int(n_valid[i])
        if n == 0:
            continue
        rows, cols = linear_sum_assignment(cost[i, :, :n])
        out[i, cols] = rows
    return out


def _total_cost(cost, assign, n_valid):
    tot = 0.0
    for b in range(cost.shape[0]):
        for j in range(int(n_valid[b])):
            tot += cost[b, assign[b, j], j]
    return tot


def test_native_matches_scipy_objective(lib):
    rs = np.random.RandomState(0)
    for trial in range(10):
        b, q = 3, 20
        m = rs.randint(1, 12)
        cost = rs.rand(b, q, m).astype(np.float32) * 10
        n_valid = rs.randint(0, m + 1, b).astype(np.int32)
        ours = lapjv_batch(cost, n_valid)
        ref = _scipy_ref(cost, n_valid)
        # optimal objective must agree (assignments may tie)
        assert abs(
            _total_cost(cost, ours, n_valid) - _total_cost(cost, ref, n_valid)
        ) < 1e-3
        # assignment validity: distinct queries, padding = -1
        for bi in range(b):
            n = int(n_valid[bi])
            vals = ours[bi, :n]
            assert len(set(vals.tolist())) == n
            assert (vals >= 0).all() and (vals < q).all()
            assert (ours[bi, n:] == -1).all()


def test_native_used_by_matcher(lib):
    import jax.numpy as jnp

    from tair_tpu.spotter.matcher import solve_assignment

    cost = np.random.RandomState(1).rand(2, 8, 3).astype(np.float32)
    out = np.asarray(
        solve_assignment(jnp.asarray(cost), jnp.asarray([3, 2], np.int32))
    )
    ref = _scipy_ref(cost, np.asarray([3, 2]))
    assert abs(
        _total_cost(cost, out, [3, 2]) - _total_cost(cost, ref, [3, 2])
    ) < 1e-4


def test_coco_ap_matches_python_accumulator(lib):
    """native/cocoeval.cpp vs the pure-Python oracle on synthetic IoUs."""
    from tair_tpu.native_ext import coco_ap
    from tair_tpu.utils.text_eval import _ap_accumulate_py

    rs = np.random.RandomState(42)
    ious, scores = [], []
    for n_pred, n_gt in [(8, 5), (0, 3), (6, 0), (12, 12), (1, 1)]:
        ious.append(rs.rand(n_pred, n_gt).astype(np.float32))
        scores.append(rs.rand(n_pred).astype(np.float32))
    thresholds = [0.3, 0.5, 0.75, 0.95]

    native = coco_ap(ious, scores, thresholds)
    assert native is not None
    ref = _ap_accumulate_py(ious, scores, thresholds)
    np.testing.assert_allclose(native, ref, atol=1e-9)
    assert 0.0 < native[0] <= 1.0  # random IoUs at thr .3 must match some


def test_coco_ap_empty_and_no_gt(lib):
    from tair_tpu.native_ext import coco_ap
    from tair_tpu.utils.text_eval import _ap_accumulate_py

    # no gt at all -> AP 0 by convention
    ious = [np.zeros((4, 0), np.float32)]
    scores = [np.asarray([0.9, 0.8, 0.7, 0.6], np.float32)]
    native = coco_ap(ious, scores, [0.5])
    np.testing.assert_allclose(native, [0.0])
    np.testing.assert_allclose(_ap_accumulate_py(ious, scores, [0.5]), [0.0])

    # no images
    np.testing.assert_allclose(coco_ap([], [], [0.5]), [0.0])


def test_average_precision_native_vs_python_end_to_end():
    """Full average_precision through polygons: native and Python paths agree."""
    from tair_tpu.utils.text_eval import SpottingInstance, average_precision

    rs = np.random.RandomState(7)

    def rand_box(cx, cy, w, h):
        return np.asarray(
            [[cx - w, cy - h], [cx + w, cy - h], [cx + w, cy + h], [cx - w, cy + h]],
            np.float32,
        )

    all_gts, all_preds = [], []
    for _ in range(3):
        gts = [
            SpottingInstance(rand_box(*rs.uniform(30, 200, 2), *rs.uniform(8, 30, 2)), "x")
            for _ in range(4)
        ]
        preds = [
            SpottingInstance(
                g.polygon + rs.uniform(-4, 4, g.polygon.shape).astype(np.float32),
                "x",
                float(rs.rand()),
            )
            for g in gts[:3]
        ] + [
            SpottingInstance(rand_box(400, 400, 10, 10), "y", float(rs.rand()))
        ]
        all_gts.append(gts)
        all_preds.append(preds)

    a = average_precision(all_gts, all_preds, (0.5, 0.75), use_native=True)
    b = average_precision(all_gts, all_preds, (0.5, 0.75), use_native=False)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=1e-9, err_msg=k)
    assert a["ap50"] > 0.3

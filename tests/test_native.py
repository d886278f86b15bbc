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

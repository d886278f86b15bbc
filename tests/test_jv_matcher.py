"""On-device exact Hungarian (JV) parity vs scipy linear_sum_assignment.

Optimal assignments can tie, so parity is asserted on TOTAL MATCHED COST
(unique optimum value), plus validity invariants (distinct queries, padding
masked). Covers rectangular matrices, zero-valid batches, and jit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from tair_tpu.spotter.matcher import jv_assignment


def _scipy_cost(cost, n_valid):
    total = 0.0
    for i in range(cost.shape[0]):
        n = int(n_valid[i])
        if n == 0:
            continue
        rows, cols = linear_sum_assignment(cost[i, :, :n])
        total += cost[i][rows, cols].sum()
    return total


def _jv_cost(cost, n_valid, out):
    total = 0.0
    for i in range(cost.shape[0]):
        for m in range(cost.shape[2]):
            if m < n_valid[i]:
                assert out[i, m] >= 0
                total += cost[i, out[i, m], m]
            else:
                assert out[i, m] == -1
    return total


@pytest.mark.parametrize("q,m", [(8, 8), (20, 7), (100, 16), (5, 1)])
def test_jv_matches_scipy_optimum(q, m):
    rng = np.random.default_rng(0)
    b = 4
    cost = rng.normal(size=(b, q, m)).astype(np.float32) * 10
    n_valid = rng.integers(0, m + 1, size=b).astype(np.int32)

    out = np.asarray(jv_assignment(jnp.asarray(cost), jnp.asarray(n_valid)))

    # distinct queries among valid targets
    for i in range(b):
        valid = out[i, : n_valid[i]]
        assert len(set(valid.tolist())) == n_valid[i]

    np.testing.assert_allclose(
        _jv_cost(cost, n_valid, out), _scipy_cost(cost, n_valid), rtol=1e-5
    )


@pytest.mark.parametrize("q,m", [(3, 5), (8, 32), (100, 128), (1, 4)])
def test_jv_more_target_slots_than_queries(q, m):
    """M > Q (e.g. dataset.max_instances > num_proposals): must terminate
    (the target-major orientation would deadlock once every query column is
    taken) and still reach scipy's optimum, matching min(Q, n_valid)
    targets."""
    rng = np.random.default_rng(7)
    b = 3
    cost = rng.normal(size=(b, q, m)).astype(np.float32) * 10
    n_valid = np.asarray([0, min(q, m) // 2 + 1, m], np.int32)[:b]

    out = np.asarray(jv_assignment(jnp.asarray(cost), jnp.asarray(n_valid)))

    total = 0.0
    for i in range(b):
        matched = [(t, out[i, t]) for t in range(m) if out[i, t] >= 0]
        assert all(t < n_valid[i] for t, _ in matched)
        assert len(matched) == min(q, int(n_valid[i]))
        qs = [qq for _, qq in matched]
        assert len(set(qs)) == len(qs)  # distinct queries
        total += sum(cost[i, qq, t] for t, qq in matched)
    np.testing.assert_allclose(total, _scipy_cost(cost, n_valid), rtol=1e-5)


def test_jv_under_jit_and_nonneg_and_duplicate_costs():
    rng = np.random.default_rng(1)
    cost = np.round(rng.uniform(0, 3, size=(2, 12, 5))).astype(np.float32)
    n_valid = np.asarray([5, 3], np.int32)
    out = np.asarray(
        jax.jit(jv_assignment)(jnp.asarray(cost), jnp.asarray(n_valid))
    )
    np.testing.assert_allclose(
        _jv_cost(cost, n_valid, out), _scipy_cost(cost, n_valid), rtol=1e-5
    )


def test_jv_all_padded():
    cost = np.ones((1, 4, 3), np.float32)
    out = np.asarray(jv_assignment(jnp.asarray(cost), jnp.asarray([0])))
    assert (out == -1).all()

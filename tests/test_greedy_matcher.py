import jax
import jax.numpy as jnp
import numpy as np

from tair_tpu.spotter.matcher import greedy_assignment


def test_greedy_identity_assignment():
    # diagonal-dominant cost: greedy == hungarian == identity
    cost = jnp.asarray(np.eye(4, 3) * -10 + 1.0, jnp.float32)[None]
    out = np.asarray(greedy_assignment(cost, jnp.asarray([3])))
    assert out.tolist() == [[0, 1, 2]]


def test_greedy_respects_n_valid_and_uniqueness():
    rs = np.random.RandomState(0)
    cost = jnp.asarray(rs.rand(3, 10, 4), jnp.float32)
    n_valid = jnp.asarray([4, 2, 0])
    out = np.asarray(greedy_assignment(cost, n_valid))
    assert out.shape == (3, 4)
    assert (out[2] == -1).all()
    assert (out[1, 2:] == -1).all()
    v0 = out[0][out[0] >= 0]
    assert len(set(v0.tolist())) == len(v0)


def test_greedy_is_jittable_and_near_optimal():
    from tair_tpu.spotter.matcher import _lsa_host

    rs = np.random.RandomState(1)
    cost = rs.rand(2, 16, 5).astype(np.float32)
    n_valid = np.asarray([5, 3], np.int32)
    g = np.asarray(jax.jit(greedy_assignment)(jnp.asarray(cost), jnp.asarray(n_valid)))
    h = _lsa_host(cost, n_valid)

    def total(assign):
        t = 0.0
        for b in range(2):
            for j in range(int(n_valid[b])):
                t += cost[b, assign[b, j], j]
        return t

    # greedy is within 30% of the optimum on random costs
    assert total(g) <= total(h) * 1.3 + 1e-6

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tair_tpu.utils.lpips import LPIPSMetric


def test_lpips_random_weights_behaves_like_distance():
    m = LPIPSMetric().init_random()
    a = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
    d_same = m(a, a)
    assert d_same.shape == (2,)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-6)
    b = jnp.clip(a + 0.2 * jax.random.normal(jax.random.PRNGKey(1), a.shape), 0, 1)
    assert float(m(a, b).mean()) > 0


def test_lpips_requires_weights():
    with pytest.raises(RuntimeError):
        LPIPSMetric()(jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3)))

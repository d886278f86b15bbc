"""DDIM / DPM-Solver++ / EDM samplers must all recover a delta distribution
given a perfect model (same oracle as the spaced-sampler test)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tair_tpu.diffusion import DiffusionSchedule
from tair_tpu.sampler.ddim import DDIMSampler
from tair_tpu.sampler.dpm import DPMSolverPP, DPMSolverPP2M
from tair_tpu.sampler.edm import EDMSampler


def setup_oracle(zero_snr=False):
    sched = DiffusionSchedule.create(
        timesteps=1000, linear_start=0.00085, linear_end=0.0120, zero_snr=zero_snr
    )
    x0_true = jnp.asarray(
        np.random.RandomState(0).randn(1, 8, 8, 4).astype(np.float32) * 0.5
    )
    sac = jnp.asarray(sched.sqrt_alphas_cumprod, jnp.float32)
    s1m = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod, jnp.float32)

    def model_fn(x, t, cond):
        a = sac[t].reshape(-1, 1, 1, 1)
        b = s1m[t].reshape(-1, 1, 1, 1)
        eps = (x - a * x0_true) / jnp.maximum(b, 1e-8)
        return a * eps - b * x0_true, ()

    return sched, x0_true, model_fn


def test_ddim_recovers_delta():
    sched, x0, model_fn = setup_oracle()
    s = DDIMSampler(training_betas=sched.betas, parameterization="v")
    x_T = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    x = s.sample(model_fn, 20, x_T, None, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=5e-2)


def test_dpmpp_2m_recovers_delta():
    sched, x0, model_fn = setup_oracle()
    s = DPMSolverPP2M(training_betas=sched.betas, parameterization="v")
    x_T = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    x = s.sample(model_fn, 15, x_T, None)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=5e-2)


@pytest.mark.parametrize("order", [1, 2, 3])
def test_dpmpp_orders_recover_delta(order):
    sched, x0, model_fn = setup_oracle()
    s = DPMSolverPP(training_betas=sched.betas, parameterization="v", order=order)
    x_T = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    x = s.sample(model_fn, 15, x_T, None)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=5e-2)


@pytest.mark.parametrize("kind", ["dpm", "edm"])
def test_solvers_finite_on_zero_snr_schedule(kind):
    """The TAIR production schedule is zero-terminal-SNR (alpha_bar(T) = 0):
    DPM's lambda(T) = log(alpha/sigma) hit log(0) = -inf and NaN'd the first
    step; EDM's karras sigma table hit inf. Both must stay finite AND still
    recover the delta oracle."""
    sched, x0, model_fn = setup_oracle(zero_snr=True)
    if kind == "dpm":
        s = DPMSolverPP(training_betas=sched.betas, parameterization="v")
    else:
        s = EDMSampler(training_betas=sched.betas, parameterization="v")
    x_T = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    x = s.sample(model_fn, 15, x_T, None, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(x)).all()
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=8e-2)


def test_dpmpp_higher_order_converges_faster():
    """With few steps the order-3 solver should land nearer the truth than
    order 1 (the point of the higher-order update)."""
    sched, x0, model_fn = setup_oracle()
    x_T = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    errs = {}
    for order in (1, 3):
        s = DPMSolverPP(
            training_betas=sched.betas, parameterization="v", order=order
        )
        x = s.sample(model_fn, 6, x_T, None)
        errs[order] = float(jnp.abs(x - x0).max())
    assert errs[3] <= errs[1]


@pytest.mark.parametrize("order", [1, 2, 3])
def test_dpmpp_single_orders_recover_delta(order):
    from tair_tpu.sampler.dpm import DPMSolverPPSingle

    sched, x0, model_fn = setup_oracle()
    s = DPMSolverPPSingle(
        training_betas=sched.betas, parameterization="v", order=order
    )
    x_T = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    x = s.sample(model_fn, 10, x_T, None)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=5e-2)


def test_dpmpp_single_order1_equals_multistep_order1():
    """Order 1 has no intermediate nodes: singlestep == multistep == the
    DDIM-equivalent update, bit-for-bit on the same lambda grid."""
    from tair_tpu.sampler.dpm import DPMSolverPPSingle

    sched, x0, model_fn = setup_oracle()
    x_T = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    a = DPMSolverPPSingle(
        training_betas=sched.betas, parameterization="v", order=1
    ).sample(model_fn, 12, x_T, None)
    b = DPMSolverPP(
        training_betas=sched.betas, parameterization="v", order=1
    ).sample(model_fn, 12, x_T, None)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_dpmpp_single_higher_order_converges_faster():
    """State-dependent oracle (x0 = k*x, a contraction the solver must track
    along the trajectory): with few outer intervals, each added intermediate
    evaluation must strictly reduce the error vs a converged reference."""
    from tair_tpu.sampler.dpm import DPMSolverPPSingle

    sched, _, _ = setup_oracle()
    sac = jnp.asarray(sched.sqrt_alphas_cumprod, jnp.float32)
    s1m = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod, jnp.float32)
    k = 0.7

    def model_fn(x, t, cond):
        a = sac[t].reshape(-1, 1, 1, 1)
        b = s1m[t].reshape(-1, 1, 1, 1)
        # v-output such that the data prediction a*x - b*out = k*x
        return (a * x - k * x) / jnp.maximum(b, 1e-8), ()

    x_T = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 4, 2))
    ref = DPMSolverPPSingle(
        training_betas=sched.betas, parameterization="v", order=1
    ).sample(model_fn, 800, x_T, None)
    errs = {}
    for order in (1, 2, 3):
        s = DPMSolverPPSingle(
            training_betas=sched.betas, parameterization="v", order=order
        )
        x = s.sample(model_fn, 6, x_T, None)
        errs[order] = float(jnp.abs(x - ref).max())
    assert errs[2] < 0.5 * errs[1], errs
    assert errs[3] < errs[2], errs


def test_dpmpp_single_finite_on_zero_snr_schedule():
    from tair_tpu.sampler.dpm import DPMSolverPPSingle

    sched, x0, model_fn = setup_oracle(zero_snr=True)
    s = DPMSolverPPSingle(
        training_betas=sched.betas, parameterization="v", order=3
    )
    x_T = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    x = s.sample(model_fn, 10, x_T, None)
    assert np.isfinite(np.asarray(x)).all()
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=8e-2)


@pytest.mark.parametrize("solver", ["euler", "heun", "dpmpp_2m"])
def test_edm_solvers_recover_delta(solver):
    sched, x0, model_fn = setup_oracle()
    s = EDMSampler(training_betas=sched.betas, parameterization="v", solver=solver)
    x_T = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    x = s.sample(model_fn, 20, x_T, None)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=8e-2)


@pytest.mark.parametrize("solver", ["euler_ancestral", "dpmpp_2m_sde"])
def test_edm_stochastic_solvers(solver):
    """Ancestral/SDE variants still recover the delta (the injected noise is
    re-contracted by later steps) and are deterministic given the key."""
    sched, x0, model_fn = setup_oracle()
    s = EDMSampler(training_betas=sched.betas, parameterization="v", solver=solver)
    x_T = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    a = s.sample(model_fn, 25, x_T, None, jax.random.PRNGKey(7))
    b = s.sample(model_fn, 25, x_T, None, jax.random.PRNGKey(7))
    c = s.sample(model_fn, 25, x_T, None, jax.random.PRNGKey(8))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))
    np.testing.assert_allclose(np.asarray(a), np.asarray(x0), atol=1.5e-1)


def test_ddim_deterministic_eta0():
    sched, x0, model_fn = setup_oracle()
    s = DDIMSampler(training_betas=sched.betas, parameterization="v", eta=0.0)
    x_T = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    a = s.sample(model_fn, 10, x_T, None, jax.random.PRNGKey(1))
    b = s.sample(model_fn, 10, x_T, None, jax.random.PRNGKey(99))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

import jax
import jax.numpy as jnp
import numpy as np

from tair_tpu.diffusion import DiffusionSchedule
from tair_tpu.sampler.spaced import SpacedSampler


def make_sampler(**kw):
    sched = DiffusionSchedule.create(
        timesteps=1000, linear_start=0.00085, linear_end=0.0120, zero_snr=True
    )
    return SpacedSampler(training_betas=sched.betas, parameterization="v", **kw), sched


def oracle_model(sched, x0_true):
    """A model that predicts the exact v for a delta data distribution."""
    sac = jnp.asarray(sched.sqrt_alphas_cumprod, jnp.float32)
    s1m = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod, jnp.float32)

    def model_fn(x, model_t, cond):
        a = sac[model_t].reshape(-1, 1, 1, 1)
        b = s1m[model_t].reshape(-1, 1, 1, 1)
        # x_t = a*x0 + b*eps  =>  eps = (x_t - a*x0)/b ; v = a*eps - b*x0
        eps = (x - a * x0_true) / jnp.maximum(b, 1e-8)
        v = a * eps - b * x0_true
        feats = (v[:, ::2, ::2, :1], v[:, :, :, :2])  # fake 2-level pyramid
        return v, feats

    return model_fn


def test_sampler_recovers_delta_distribution():
    sampler, sched = make_sampler()
    x0_true = jnp.asarray(
        np.random.RandomState(0).randn(2, 8, 8, 4).astype(np.float32)
    )
    model_fn = oracle_model(sched, x0_true)
    x_T = jax.random.normal(jax.random.PRNGKey(0), x0_true.shape)
    x, feats = sampler.sample(
        model_fn, steps=10, x_T=x_T, cond=None, rng=jax.random.PRNGKey(1)
    )
    # perfect model => exact recovery of x0 (posterior collapses each step)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0_true), atol=1e-3)
    assert feats == ()


def test_sampler_feat_capture():
    sampler, sched = make_sampler()
    x0_true = jnp.zeros((1, 8, 8, 4))
    model_fn = oracle_model(sched, x0_true)
    x_T = jax.random.normal(jax.random.PRNGKey(0), x0_true.shape)
    x, feats = sampler.sample(
        model_fn,
        steps=10,
        x_T=x_T,
        cond=None,
        rng=jax.random.PRNGKey(1),
        feat_iterations=[5, 10],
    )
    assert len(feats) == 2  # two levels
    assert feats[0].shape == (2, 1, 4, 4, 1)  # [n_tags, B, H, W, C]
    assert feats[1].shape == (2, 1, 8, 8, 2)
    # the two tag slots captured different steps
    assert not np.allclose(np.asarray(feats[1][0]), np.asarray(feats[1][1]))


def test_sampler_deterministic_given_rng():
    sampler, sched = make_sampler()
    x0_true = jnp.ones((1, 8, 8, 4))
    model_fn = oracle_model(sched, x0_true)
    x_T = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    a, _ = sampler.sample(model_fn, 5, x_T, None, jax.random.PRNGKey(7))
    b, _ = sampler.sample(model_fn, 5, x_T, None, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_val_sample_loop_feedback():
    sampler, sched = make_sampler()
    x0_true = jnp.full((1, 8, 8, 4), 0.5)
    model_fn = oracle_model(sched, x0_true)
    sp = sampler.make_schedule(5)

    @jax.jit
    def step_fn(x, step_idx, cond, rng):
        return sampler.p_sample(model_fn, sp, x, step_idx, cond, None, 1.0, rng)

    calls = []

    def feedback(feats, cond, i):
        calls.append(i)
        return cond, {"iteration": i}

    x_T = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    x, infos = sampler.val_sample_loop(
        step_fn, 5, x_T, {"c_txt": None}, jax.random.PRNGKey(1), feedback
    )
    assert calls == [0, 1, 2, 3, 4]
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0_true), atol=1e-3)


def test_scan_and_host_loop_agree():
    """The compiled scan and the host-driven loop must produce identical chains."""
    sampler, sched = make_sampler()
    x0_true = jnp.asarray(np.random.RandomState(1).randn(1, 8, 8, 4), jnp.float32)
    model_fn = oracle_model(sched, x0_true)
    sp = sampler.make_schedule(7)
    x_T = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))

    def step_fn(x, step_idx, cond, rng):
        return sampler.p_sample(model_fn, sp, x, step_idx, cond, None, 1.0, rng)

    x_scan, _ = sampler.sample(model_fn, 7, x_T, None, jax.random.PRNGKey(9))
    x_loop, _ = sampler.val_sample_loop(step_fn, 7, x_T, None, jax.random.PRNGKey(9))
    np.testing.assert_allclose(np.asarray(x_scan), np.asarray(x_loop), atol=1e-6)

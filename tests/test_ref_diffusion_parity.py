"""Diffusion-math parity vs the reference's gaussian_diffusion.py (pure
torch, loaded directly): beta schedule, zero-terminal-SNR rescale, q_sample,
v-target, and x0 reconstructions must agree numerically — these constants
define the training objective and every sampler."""

import numpy as np
import pytest
import torch

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ref_loader import ref_module  # noqa: E402


@pytest.fixture(scope="module")
def ref_gd():
    return ref_module("gaussian_diffusion")


def test_beta_schedule_and_ztsnr_match(ref_gd):
    from tair_tpu.diffusion.schedules import (
        enforce_zero_terminal_snr,
        make_beta_schedule,
    )

    ref_betas = ref_gd.make_beta_schedule(
        "linear", 1000, linear_start=0.00085, linear_end=0.0120
    )
    ours = make_beta_schedule(
        "linear", 1000, linear_start=0.00085, linear_end=0.0120
    )
    np.testing.assert_allclose(ours, np.asarray(ref_betas), rtol=1e-10)

    ref_z = ref_gd.enforce_zero_terminal_snr(np.asarray(ref_betas, np.float64))
    ours_z = enforce_zero_terminal_snr(np.asarray(ours, np.float64))
    np.testing.assert_allclose(ours_z, np.asarray(ref_z), rtol=1e-8)


def test_q_sample_v_target_and_reconstructions_match(ref_gd):
    from tair_tpu.diffusion.diffusion import Diffusion
    from tair_tpu.diffusion.schedules import DiffusionSchedule

    ref = ref_gd.Diffusion(
        timesteps=1000, beta_schedule="linear", linear_start=0.00085,
        linear_end=0.0120, zero_snr=True, parameterization="v",
    )
    sched = DiffusionSchedule.create(
        timesteps=1000, beta_schedule="linear",
        linear_start=0.00085, linear_end=0.0120, zero_snr=True,
    )
    ours = Diffusion(schedule=sched, parameterization="v")

    rng = np.random.default_rng(0)
    z0 = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    noise = rng.normal(size=z0.shape).astype(np.float32)
    t = np.array([0, 777], np.int64)

    # torch layout NCHW vs ours NHWC — schedule constants broadcast over
    # trailing dims identically, so transpose-compare works
    z0_t = torch.from_numpy(np.transpose(z0, (0, 3, 1, 2)))
    noise_t = torch.from_numpy(np.transpose(noise, (0, 3, 1, 2)))
    t_t = torch.from_numpy(t)

    x_t_ref = ref.q_sample(z0_t, t_t, noise_t).numpy()
    x_t_ours = np.asarray(
        ours.q_sample(jnp.asarray(z0), jnp.asarray(t), jnp.asarray(noise))
    )
    np.testing.assert_allclose(
        x_t_ours, np.transpose(x_t_ref, (0, 2, 3, 1)), atol=1e-5
    )

    v_ref = ref.get_v(z0_t, noise_t, t_t).numpy()
    v_ours = np.asarray(
        ours.get_v(jnp.asarray(z0), jnp.asarray(noise), jnp.asarray(t))
    )
    np.testing.assert_allclose(
        v_ours, np.transpose(v_ref, (0, 2, 3, 1)), atol=1e-5
    )

    # x0 reconstruction from v at x_t
    x0_ref = ref.pred_x_start_from_v(
        torch.from_numpy(x_t_ref), t_t, torch.from_numpy(v_ref)
    ).numpy()
    x0_ours = np.asarray(
        ours.pred_x_start_from_v(
            jnp.asarray(x_t_ours), jnp.asarray(t), jnp.asarray(v_ours)
        )
    )
    np.testing.assert_allclose(
        x0_ours, np.transpose(x0_ref, (0, 2, 3, 1)), atol=1e-4
    )
    # and it should recover z0 (identity sanity for both)
    np.testing.assert_allclose(x0_ours, z0, atol=1e-4)

"""Train-loop validation metric panel: NIQE is wired in weightlessly.

Counterpart of the reference's in-training 8-metric pyiqa panel
(/root/reference/train.py:75-82); PSNR/SSIM were already in-loop — this
pins the round-3 addition: NIQE on every validation (pristine MVG fitted
from the batch GT rows when no corpus model is configured) and the
weighted-graph hooks only firing when checkpoint paths are configured.
"""

import types

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")


def _aux():
    import train

    return train._aux_val_metrics


def _cfg(**val_fields):
    vc = types.SimpleNamespace(
        niqe_params=None, lpips_weights=None, dists_weights=None,
        clipiqa_weights=None, maniqa_weights=None, musiq_weights=None,
    )
    for k, v in val_fields.items():
        setattr(vc, k, v)
    return types.SimpleNamespace(val=vc)


def test_niqe_reported_weightlessly():
    rng = np.random.RandomState(0)
    gt = jnp.asarray(rng.rand(2, 128, 128, 3).astype(np.float32))
    # restored = slightly noised GT: should score worse (higher NIQE) than GT
    noisy = jnp.clip(gt + 0.25 * rng.randn(2, 128, 128, 3).astype(np.float32), 0, 1)
    m_noisy = _aux()(_cfg(), noisy, gt)
    m_clean = _aux()(_cfg(), gt, gt)
    assert "niqe" in m_noisy and np.isfinite(m_noisy["niqe"])
    assert m_noisy["niqe"] > m_clean["niqe"]


def test_niqe_skipped_below_patch_floor():
    gt = jnp.zeros((1, 64, 64, 3), jnp.float32)
    assert "niqe" not in _aux()(_cfg(), gt, gt)


def test_weighted_metrics_gated_on_config():
    gt = jnp.asarray(np.random.RandomState(1).rand(1, 128, 128, 3), jnp.float32)
    out = _aux()(_cfg(), gt, gt)
    assert set(out) == {"niqe"}  # nothing weighted configured -> no attempts


def test_no_val_section_still_reports_niqe():
    gt = jnp.asarray(np.random.RandomState(2).rand(1, 128, 128, 3), jnp.float32)
    out = _aux()(types.SimpleNamespace(), gt, gt)
    assert "niqe" in out

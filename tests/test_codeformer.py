"""Codeformer-style first-order degradation (dataset + device transform)."""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tair_tpu.data.codeformer import (
    CodeformerDataset,
    codeformer_degrade_batch,
    collate_codeformer,
)
from tair_tpu.data.file_backend import MemoryBackend


def _mem_records(n=3, size=512, src=520):
    from PIL import Image

    mem = MemoryBackend()
    recs = []
    rng = np.random.RandomState(0)
    for i in range(n):
        buf = io.BytesIO()
        arr = rng.randint(0, 255, (src, src, 3), dtype=np.uint8)
        Image.fromarray(arr).save(buf, "PNG")
        mem.put(f"/v/{i}.png", buf.getvalue())
        recs.append(
            dict(image_path=f"/v/{i}.png", img_name=f"{i}", prompt="p", text=[])
        )
    return recs, mem


@pytest.mark.parametrize("crop_type", ["center", "random"])
def test_dataset_crops_and_params(crop_type):
    recs, mem = _mem_records()
    ds = CodeformerDataset(recs, out_size=64, crop_type=crop_type, backend=mem)
    item = ds[0]
    assert item["hq"].shape == (64, 64, 3)
    assert item["hq"].min() >= 0.0 and item["hq"].max() <= 1.0
    assert item["kernel"].shape == (41, 41)
    np.testing.assert_allclose(item["kernel"].sum(), 1.0, atol=1e-5)
    assert 0.8 <= item["scale"] <= 8.0
    assert 0.0 <= item["noise_sigma"] <= 20.0
    assert 60.0 <= item["jpeg_quality"] <= 100.0
    # deterministic given the seed
    np.testing.assert_array_equal(ds[0]["hq"], item["hq"])


def test_degrade_batch_jits_and_degrades():
    recs, mem = _mem_records(n=2)
    ds = CodeformerDataset(
        recs, out_size=64, blur_kernel_size=11, backend=mem, seed=3
    )
    batch = collate_codeformer([ds[0], ds[1]])
    gt, lq = jax.jit(codeformer_degrade_batch)(
        jax.random.PRNGKey(0),
        jnp.asarray(batch["hq"]),
        jnp.asarray(batch["kernel"]),
        jnp.asarray(batch["scale"]),
        jnp.asarray(batch["noise_sigma"]),
        jnp.asarray(batch["jpeg_quality"]),
    )
    assert gt.shape == (2, 64, 64, 3) and lq.shape == (2, 64, 64, 3)
    np.testing.assert_allclose(np.asarray(gt), batch["hq"] * 2 - 1, atol=1e-6)
    assert float(lq.min()) >= 0.0 and float(lq.max()) <= 1.0
    # lq must actually be degraded, and more so at stronger settings
    mse_weak = float(jnp.mean((lq - (gt + 1) / 2) ** 2))
    assert mse_weak > 1e-4

    gt2, lq2 = jax.jit(codeformer_degrade_batch)(
        jax.random.PRNGKey(0),
        jnp.asarray(batch["hq"]),
        jnp.asarray(batch["kernel"]),
        jnp.full_like(jnp.asarray(batch["scale"]), 8.0),
        jnp.full_like(jnp.asarray(batch["noise_sigma"]), 20.0),
        jnp.full_like(jnp.asarray(batch["jpeg_quality"]), 40.0),
    )
    mse_strong = float(jnp.mean((lq2 - (gt2 + 1) / 2) ** 2))
    assert mse_strong > mse_weak

"""Text-aware augmentation (crop-with-instance / flip / resize) invariants."""

import numpy as np

from tair_tpu.data.augmentation import (
    TextAugmentor,
    hflip,
    random_crop_with_instances,
    resize_shortest_edge,
)


def _poly(x0, y0, x1, y1, p=16):
    xs = np.linspace(x0, x1, p // 2)
    top = np.stack([xs, np.full_like(xs, y0)], -1)
    bot = np.stack([xs[::-1], np.full_like(xs, y1)], -1)
    return np.concatenate([top, bot], 0).astype(np.float32)


def test_resize_shortest_edge():
    img = np.zeros((100, 200, 3), np.uint8)
    out = resize_shortest_edge(img, 50)
    assert out.shape == (50, 100, 3)
    out = resize_shortest_edge(img, 50, max_size=80)
    assert out.shape[1] == 80  # long side capped


def test_hflip_mirrors_and_reverses():
    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    polys = _poly(0.1, 0.2, 0.4, 0.3)[None]
    fimg, fpolys = hflip(img, polys)
    np.testing.assert_array_equal(fimg, img[:, ::-1])
    # x mirrored and point order reversed: new point 0 = mirror of the old
    # last point (x0, y1)
    np.testing.assert_allclose(fpolys[0, :, 0].min(), 0.6, atol=1e-6)
    np.testing.assert_allclose(fpolys[0, 0], [1 - 0.1, 0.3], atol=1e-6)


def test_random_crop_keeps_an_instance():
    rng = np.random.RandomState(0)
    img = np.zeros((200, 200, 3), np.uint8)
    polys = np.stack([_poly(0.1, 0.1, 0.3, 0.2), _poly(0.6, 0.7, 0.9, 0.8)])
    for _ in range(10):
        cimg, cpolys, keep = random_crop_with_instances(
            img, polys, (0.5, 0.8), rng
        )
        assert keep.any()
        assert cpolys.min() >= -1e-6 and cpolys.max() <= 1 + 1e-6
        assert cimg.shape[0] >= 100 and cimg.shape[1] >= 100


def test_augmentor_end_to_end_record():
    img = np.zeros((128, 128, 3), np.uint8)
    record = dict(
        poly=np.stack([_poly(0.2, 0.3, 0.6, 0.4)]),
        bbox=np.asarray([[0.4, 0.35, 0.4, 0.1]], np.float32),
        text=["hi"],
        text_enc=np.zeros((1, 25), np.int32),
    )
    aug = TextAugmentor(crop_prob=1.0, hflip_prob=1.0, min_size=64, seed=1)
    out_img, out_rec = aug(img, record, index=0)
    assert min(out_img.shape[:2]) == 64
    assert out_rec["poly"].shape[1:] == (16, 2)
    assert len(out_rec["text"]) == len(out_rec["poly"])
    # bbox recomputed from polygon extent
    p = out_rec["poly"][0]
    np.testing.assert_allclose(
        out_rec["bbox"][0][:2], (p.min(0) + p.max(0)) / 2, atol=1e-6
    )
    # deterministic per (seed, index)
    out2_img, out2_rec = TextAugmentor(
        crop_prob=1.0, hflip_prob=1.0, min_size=64, seed=1
    )(img, record, index=0)
    np.testing.assert_array_equal(out_img, out2_img)
    np.testing.assert_array_equal(out_rec["poly"], out2_rec["poly"])

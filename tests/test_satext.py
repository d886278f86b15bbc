import json
import os

import numpy as np

from tair_tpu.data.satext import (
    MAX_INSTANCES,
    SATextDataset,
    SyntheticSAText,
    collate,
    data_iterator,
    load_satext_file_list,
    make_caption,
)


def _write_fake_satext(tmp_path, n_imgs=12):
    from PIL import Image

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    ann = {}
    rs = np.random.RandomState(0)
    for i in range(n_imgs):
        name = f"img{i:03d}"
        arr = (rs.rand(512, 512, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"{name}.png")
        ann[name] = {
            "0": {
                "text_instances": [
                    {
                        "text": f"WORD{i}",
                        "bbox": [10, 20, 110, 60],
                        "polygon": np.stack(
                            [
                                np.stack([np.linspace(10, 110, 8), np.full(8, 20)], -1),
                                np.stack([np.linspace(110, 10, 8), np.full(8, 60)], -1),
                            ]
                        ).reshape(16, 2).tolist(),
                    },
                    {  # non-ASCII instance must be filtered out
                        "text": "héllo",
                        "bbox": [0, 0, 10, 10],
                        "polygon": [[0, 0]] * 16,
                    },
                ]
            }
        }
    with open(tmp_path / "ann.json", "w") as f:
        json.dump(ann, f)
    return str(img_dir), str(tmp_path / "ann.json")


def test_load_file_list_split_and_filter(tmp_path):
    img_dir, ann_path = _write_fake_satext(tmp_path)
    train = load_satext_file_list(img_dir, ann_path, "TRAIN")
    val = load_satext_file_list(img_dir, ann_path, "VAL", seed=0)
    assert len(train) == 10  # 12 * 10/11 -> 10
    assert len(val) == 2
    rec = train[0]
    assert len(rec["text"]) == 1  # non-ASCII filtered
    assert rec["bbox"].shape == (1, 4)
    assert rec["poly"].shape == (1, 16, 2)
    assert rec["poly"].max() <= 1.0
    # cxcywh normalized: box center of [10,20,110,60] at 512
    np.testing.assert_allclose(
        rec["bbox"][0], [60 / 512, 40 / 512, 100 / 512, 40 / 512], atol=1e-4
    )
    assert rec["prompt"].startswith("A realistic scene where the texts ")


def test_dataset_and_collate(tmp_path):
    img_dir, ann_path = _write_fake_satext(tmp_path)
    ds = SATextDataset(load_satext_file_list(img_dir, ann_path, "TRAIN"))
    item = ds[0]
    assert item["hq"].shape == (512, 512, 3)
    assert item["kernel1"].shape == (21, 21)

    batch = collate([ds[0], ds[1]])
    assert batch["hq"].shape == (2, 512, 512, 3)
    assert batch["tokens"].shape == (2, 77)
    assert batch["inst_mask"].shape == (2, MAX_INSTANCES)
    assert batch["inst_mask"][:, 0].all()
    assert not batch["inst_mask"][:, 1].any()
    assert batch["ctrl_points"].shape == (2, MAX_INSTANCES, 16, 2)
    assert batch["texts"].shape == (2, MAX_INSTANCES, 25)


def test_synthetic_dataset_iterator():
    ds = SyntheticSAText(size=64, length=8)
    it = data_iterator(ds, batch_size=4, seed=1)
    batch = next(it)
    assert batch["hq"].shape == (4, 64, 64, 3)
    assert batch["inst_mask"].any()
    assert batch["boxes"][batch["inst_mask"]].max() <= 1.0
    b2 = next(it)
    assert b2["hq"].shape == (4, 64, 64, 3)


def test_synthetic_glyphs_recoverable():
    """The rendered word must be recoverable from pixels: each sign contains
    exactly its word's 5x7 glyph pattern (dark ink on the light sign), so the
    recognition loss trains on real signal, not letter-independent strokes."""
    import numpy as np

    from tair_tpu.data.satext import _glyph_mask

    ds = SyntheticSAText(size=256, length=8, seed=11)
    checked = 0
    for i in range(8):
        d = ds[i]
        img = d["hq"].mean(-1)
        boxes = np.asarray(d["bbox"])

        def overlaps_another(j):
            for k in range(len(boxes)):
                if k == j:
                    continue
                dx = abs(boxes[j][0] - boxes[k][0])
                dy = abs(boxes[j][1] - boxes[k][1])
                if (dx < (boxes[j][2] + boxes[k][2]) / 2
                        and dy < (boxes[j][3] + boxes[k][3]) / 2):
                    return True
            return False

        for j, (word, box) in enumerate(zip(d["text"], d["bbox"])):
            if overlaps_another(j):  # a later sign may occlude this word
                continue
            cx, cy, w, h = box * 256
            x0, y0 = int(cx - w / 2), int(cy - h / 2)
            sign = img[y0 : int(y0 + h), x0 : int(x0 + w)]
            ink = (sign < 0.4).astype(np.float32)
            mask = _glyph_mask(word)
            # the ink blob, cropped to its bbox and resized to the glyph
            # grid, must correlate strongly with the word's glyph mask
            ys, xs = np.nonzero(ink)
            assert len(ys) > 0, (i, word)
            blob = ink[ys.min() : ys.max() + 1, xs.min() : xs.max() + 1]
            # crop BOTH to their ink bounding boxes (the glyph grid has an
            # empty trailing spacer column), then compare at matched scale
            mys, mxs = np.nonzero(mask)
            mcrop = mask[mys.min() : mys.max() + 1, mxs.min() : mxs.max() + 1]
            gh, gw = mcrop.shape
            ry = ((np.arange(gh) + 0.5) * blob.shape[0] / gh).astype(int)
            rx = ((np.arange(gw) + 0.5) * blob.shape[1] / gw).astype(int)
            small = blob[np.ix_(np.clip(ry, 0, blob.shape[0] - 1),
                                np.clip(rx, 0, blob.shape[1] - 1))]
            agree = float((small == mcrop).mean())
            assert agree > 0.8, (i, word, agree)
            checked += 1
    assert checked >= 8


def test_file_backends(tmp_path):
    import io

    from PIL import Image

    from tair_tpu.data.file_backend import (
        HardDiskBackend,
        MemoryBackend,
        get_backend,
    )

    p = tmp_path / "x.bin"
    p.write_bytes(b"abc")
    assert HardDiskBackend().get(p) == b"abc"
    assert get_backend("disk").get(str(p)) == b"abc"

    mem = MemoryBackend()
    mem.put("img.png", b"xyz")
    assert mem.get("img.png") == b"xyz"

    import pytest

    with pytest.raises(RuntimeError):
        get_backend("petrel")
    with pytest.raises(ValueError):
        get_backend("nope")

    # dataset reads through a memory backend (no real files on disk)
    buf = io.BytesIO()
    Image.fromarray(np.zeros((512, 512, 3), np.uint8)).save(buf, "PNG")
    mem.put("/virtual/img0.png", buf.getvalue())
    ds = SATextDataset(
        records=[
            dict(
                image_path="/virtual/img0.png",
                img_name="img0",
                prompt="",
                text=["hi"],
                bbox=np.zeros((1, 4), np.float32),
                poly=np.zeros((1, 16, 2), np.float32),
                text_enc=np.zeros((1, 25), np.int32),
            )
        ],
        backend=mem,
    )
    assert ds[0]["hq"].shape == (512, 512, 3)

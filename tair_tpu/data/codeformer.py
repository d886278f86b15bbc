"""Codeformer-style first-order degradation dataset (DiffBIR's face path).

Counterpart of /root/reference/terediff/dataset/codeformer.py:23-171
(CodeformerDataset + collate_fn_code): blur -> random downsample ->
gaussian noise -> JPEG -> resize back, i.e. the classic single-stage
degradation, vs. the two-stage RealESRGAN pipeline in batch_transform.py.

TPU-native split mirrors the RealESRGAN design here: the host dataset only
loads/crops the HQ image and samples per-item degradation *parameters*
(kernel, scale, noise sigma, JPEG quality); the pixel math runs on device
as ONE jittable batched transform (`codeformer_degrade_batch`) — dynamic
downsample sizes become `scale_and_translate` round-trips on the static
canvas, so the whole thing compiles once.
"""

from __future__ import annotations

import io
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .degradation import add_gaussian_noise, filter2d
from .diffjpeg import diff_jpeg
from .kernels import random_mixed_kernel


def center_crop(img: np.ndarray, size: int) -> np.ndarray:
    h, w = img.shape[:2]
    top, left = (h - size) // 2, (w - size) // 2
    return img[top : top + size, left : left + size]


def random_crop(img: np.ndarray, size: int, rng: np.random.RandomState) -> np.ndarray:
    h, w = img.shape[:2]
    top = rng.randint(0, h - size + 1)
    left = rng.randint(0, w - size + 1)
    return img[top : top + size, left : left + size]


@dataclass
class CodeformerDataset:
    """Host side: HQ crop + per-item degradation parameters.

    `records` use the same schema as the SA-Text loader (image_path, prompt,
    text, bbox, poly, text_enc, img_name), so the two datasets are drop-in
    interchangeable at the training loop (the reference selects between them
    by `dataset_type`, initialize.py:55-66).
    """

    records: List[Dict]
    out_size: int = 512
    crop_type: str = "center"  # none | center | random
    blur_kernel_size: int = 41
    kernel_list: Sequence[str] = ("iso", "aniso")
    kernel_prob: Sequence[float] = (0.5, 0.5)
    blur_sigma: Tuple[float, float] = (0.1, 10.0)
    downsample_range: Tuple[float, float] = (0.8, 8.0)
    noise_range: Optional[Tuple[float, float]] = (0.0, 20.0)
    jpeg_range: Optional[Tuple[int, int]] = (60, 100)
    seed: int = 0
    backend: object = None

    def __post_init__(self):
        if self.crop_type not in ("none", "center", "random"):
            raise ValueError(self.crop_type)

    def __len__(self) -> int:
        return len(self.records)

    def _load(self, path: str) -> Optional[np.ndarray]:
        from PIL import Image

        from .file_backend import HardDiskBackend

        if self.backend is None:
            self.backend = HardDiskBackend()
        try:
            img = Image.open(io.BytesIO(self.backend.get(path))).convert("RGB")
        except Exception:
            return None
        return np.asarray(img, np.uint8)

    def __getitem__(self, index: int) -> Dict:
        rng = np.random.RandomState((self.seed * 1_000_003 + index) % (2**31))
        rec = self.records[index]
        img = self._load(rec["image_path"])
        retries = 0
        while img is None and retries < 5:
            index = rng.randint(0, len(self.records))
            rec = self.records[index]
            img = self._load(rec["image_path"])
            retries += 1
        if img is None:
            raise RuntimeError(f"failed to load any image near {rec['image_path']}")

        s = self.out_size
        if self.crop_type == "none":
            assert img.shape[0] == s and img.shape[1] == s
        elif img.shape[0] != s or img.shape[1] != s:
            from PIL import Image

            if min(img.shape[:2]) < s:  # upscale short side first
                scale = s / min(img.shape[:2])
                img = np.asarray(
                    Image.fromarray(img).resize(
                        (round(img.shape[1] * scale), round(img.shape[0] * scale)),
                        Image.BICUBIC,
                    )
                )
            img = (
                center_crop(img, s)
                if self.crop_type == "center"
                else random_crop(img, s, rng)
            )

        kernel = random_mixed_kernel(
            rng,
            self.blur_kernel_size,
            self.kernel_list,
            self.kernel_prob,
            sigma_range=self.blur_sigma,
        )
        nr, jr = self.noise_range, self.jpeg_range
        return dict(
            hq=(img / 255.0).astype(np.float32),
            kernel=kernel.astype(np.float32),
            scale=np.float32(rng.uniform(*self.downsample_range)),
            noise_sigma=np.float32(rng.uniform(*nr) if nr else 0.0),
            jpeg_quality=np.float32(rng.uniform(*jr) if jr else 100.0),
            prompt=rec.get("prompt", ""),
            text=rec.get("text", []),
            bbox=rec.get("bbox"),
            poly=rec.get("poly"),
            text_enc=rec.get("text_enc"),
            img_name=rec.get("img_name", ""),
        )


def collate_codeformer(items: List[Dict]) -> Dict[str, np.ndarray]:
    out = {}
    for k in ("hq", "kernel", "scale", "noise_sigma", "jpeg_quality"):
        out[k] = np.stack([it[k] for it in items])
    out["prompt"] = [it["prompt"] for it in items]
    out["img_name"] = [it["img_name"] for it in items]
    return out


def codeformer_degrade_batch(
    rng: jax.Array,
    hq: jnp.ndarray,            # [B, S, S, 3] in [0, 1]
    kernel: jnp.ndarray,        # [B, k, k]
    scale: jnp.ndarray,         # [B] downsample factor >= 1
    noise_sigma: jnp.ndarray,   # [B] in [0, 255] scale
    jpeg_quality: jnp.ndarray,  # [B] in [1, 100]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device side: (gt in [-1,1], lq in [0,1]), jittable, static shapes.

    The reference's dynamic `cv2.resize(w//scale)` down/up round-trip
    (codeformer.py:126-138) becomes two `scale_and_translate` calls on the
    full static canvas — the information loss (the point of the op) is the
    same; only the intermediate storage differs.
    """
    b, s, _, _ = hq.shape
    lq = filter2d(hq, kernel)

    inv = 1.0 / jnp.maximum(scale, 1.0)

    def down_up(img, inv_s):
        small = jax.image.scale_and_translate(
            img, img.shape, spatial_dims=(0, 1),
            scale=jnp.stack([inv_s, inv_s]),
            translation=jnp.zeros(2, jnp.float32),
            method="linear", antialias=True,
        )
        return jax.image.scale_and_translate(
            small, img.shape, spatial_dims=(0, 1),
            scale=jnp.stack([1.0 / inv_s, 1.0 / inv_s]),
            translation=jnp.zeros(2, jnp.float32),
            method="linear", antialias=False,
        )

    lq = jax.vmap(down_up)(lq, inv)
    k1, _ = jax.random.split(rng)
    lq = add_gaussian_noise(k1, lq, noise_sigma, jnp.zeros((b,)))
    lq = diff_jpeg(lq, jpeg_quality)
    lq = jnp.clip(lq, 0.0, 1.0)
    gt = hq * 2.0 - 1.0
    return gt, lq

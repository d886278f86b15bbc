"""Face alignment / paste-back helper (facexlib-free).

Counterpart of /root/reference/terediff/utils/face.py:49-516
(FaceRestoreHelper). The reference wraps facexlib's retinaface detector +
cv2 warps; this build keeps the *geometry* — 5-point similarity alignment
to the standard FFHQ template (umeyama least-squares, the clean-input
equivalent of cv2.estimateAffinePartial2D(LMEDS), face.py:321), bilinear
warps via `jax.scipy.ndimage.map_coordinates`, and soft-mask paste-back
(face.py:364-466) — behind a pluggable landmark-detector callable. The
matching detector lives in `tair_tpu.utils.retinaface`
(`RetinaFaceDetector.from_torch(path).as_landmark_detector()`); only its
checkpoint (`detection_Resnet50_Final.pth`) is external.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# standard 5-point template (left eye, right eye, nose, mouth corners) on a
# 512x512 aligned crop — the constant the reference uses (face.py:81-84)
FACE_TEMPLATE_512 = np.array(
    [
        [192.98138, 239.94708],
        [318.90277, 240.1936],
        [256.63416, 314.01935],
        [201.26117, 371.41043],
        [313.08905, 371.15118],
    ],
    np.float32,
)


def estimate_similarity(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Umeyama similarity (rotation+uniform scale+translation) mapping src
    points to dst points; returns a 2x3 affine matrix."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    mu_s, mu_d = src.mean(0), dst.mean(0)
    sc, dc = src - mu_s, dst - mu_d
    cov = dc.T @ sc / len(src)
    u, s, vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(u) * np.linalg.det(vt))
    diag = np.diag([1.0, d])
    var_s = (sc**2).sum() / len(src)
    scale = np.trace(np.diag(s) @ diag) / var_s
    r = u @ diag @ vt
    t = mu_d - scale * r @ mu_s
    m = np.zeros((2, 3), np.float64)
    m[:, :2] = scale * r
    m[:, 2] = t
    return m.astype(np.float32)


def invert_affine(m: np.ndarray) -> np.ndarray:
    a = np.eye(3, dtype=np.float64)
    a[:2] = m
    return np.linalg.inv(a)[:2].astype(np.float32)


def warp_affine(
    img: jnp.ndarray, m: np.ndarray, out_hw, mode: str = "constant"
) -> jnp.ndarray:
    """Warp [H,W,C] by the FORWARD 2x3 matrix m (src->dst), sampling the
    source at M^-1 @ dst like cv2.warpAffine."""
    inv = invert_affine(np.asarray(m))
    oh, ow = out_hw
    ys, xs = jnp.meshgrid(jnp.arange(oh) + 0.0, jnp.arange(ow) + 0.0, indexing="ij")
    sx = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    sy = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
    order_mode = {"constant": "constant", "reflect": "mirror", "nearest": "nearest"}[
        mode
    ]
    return jax.vmap(
        lambda c: jax.scipy.ndimage.map_coordinates(
            c, [sy, sx], order=1, mode=order_mode, cval=0.0
        ),
        in_axes=-1,
        out_axes=-1,
    )(img.astype(jnp.float32))


@dataclass
class FaceRestoreHelper:
    """Detect (pluggable) -> align to template -> restore -> paste back.

    detector(img [H,W,3] float [0,1]) -> list of [5,2] landmark arrays; None
    means landmarks are supplied manually via add_landmarks (the in-env
    default, since detector checkpoints are external).
    """

    face_size: int = 512
    upscale_factor: int = 1
    detector: Optional[Callable] = None
    landmarks: List[np.ndarray] = field(default_factory=list)
    affine_matrices: List[np.ndarray] = field(default_factory=list)
    cropped_faces: List[jnp.ndarray] = field(default_factory=list)
    restored_faces: List[jnp.ndarray] = field(default_factory=list)

    @property
    def template(self) -> np.ndarray:
        return FACE_TEMPLATE_512 * (self.face_size / 512.0)

    def clean(self) -> None:
        self.landmarks, self.affine_matrices = [], []
        self.cropped_faces, self.restored_faces = [], []

    def add_landmarks(self, lm5: np.ndarray) -> None:
        self.landmarks.append(np.asarray(lm5, np.float32))

    def detect_faces(self, img) -> int:
        if self.detector is None:
            raise RuntimeError(
                "no landmark detector configured; call add_landmarks() or "
                "pass detector= (external checkpoints required)"
            )
        for lm in self.detector(img):
            self.add_landmarks(lm)
        return len(self.landmarks)

    def align_warp_faces(self, img: jnp.ndarray, border_mode: str = "constant"):
        """img [H,W,3] in [0,1] -> aligned face crops [face_size^2]."""
        self.cropped_faces, self.affine_matrices = [], []
        for lm in self.landmarks:
            m = estimate_similarity(lm, self.template)
            self.affine_matrices.append(m)
            self.cropped_faces.append(
                warp_affine(img, m, (self.face_size, self.face_size), border_mode)
            )
        return self.cropped_faces

    def add_restored_face(self, face: jnp.ndarray) -> None:
        self.restored_faces.append(face)

    def paste_faces_to_input_image(self, img: jnp.ndarray) -> jnp.ndarray:
        """Soft-mask paste-back of each restored face at upscale_factor."""
        h, w = img.shape[:2]
        up_hw = (h * self.upscale_factor, w * self.upscale_factor)
        out = jax.image.resize(
            img.astype(jnp.float32), up_hw + (img.shape[2],), "linear"
        )
        assert len(self.restored_faces) == len(self.affine_matrices)
        for face, m in zip(self.restored_faces, self.affine_matrices):
            m_up = np.asarray(m) * self.upscale_factor
            inv_face = warp_affine(face, invert_affine(m_up), up_hw)
            # soft-edged mask warped the same way (face.py:398-435: erode +
            # blur approximated by a separable box blur of the border band)
            edge = max(2, self.face_size // 20)
            mask = np.zeros((self.face_size, self.face_size, 1), np.float32)
            mask[edge:-edge, edge:-edge] = 1.0
            k = max(1, self.face_size // 10) | 1
            box = jnp.ones((k,), jnp.float32) / k
            mj = jnp.asarray(mask)
            for axis in (0, 1):
                mj = jnp.apply_along_axis(
                    lambda v: jnp.convolve(v, box, mode="same"), axis, mj
                )
            inv_mask = warp_affine(mj, invert_affine(m_up), up_hw)
            out = inv_mask * inv_face + (1.0 - inv_mask) * out
        return jnp.clip(out, 0.0, 1.0)

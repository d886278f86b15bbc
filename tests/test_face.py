"""Face alignment / paste-back geometry (detector-free FaceRestoreHelper)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tair_tpu.utils.face import (
    FACE_TEMPLATE_512,
    FaceRestoreHelper,
    estimate_similarity,
    invert_affine,
    warp_affine,
)


def _apply(m, pts):
    return pts @ m[:, :2].T + m[:, 2]


def test_estimate_similarity_recovers_known_transform():
    rng = np.random.RandomState(0)
    src = rng.rand(5, 2).astype(np.float32) * 100
    theta, s, t = 0.3, 1.7, np.array([12.0, -5.0])
    r = np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    dst = (src @ (s * r).T) + t
    m = estimate_similarity(src, dst)
    np.testing.assert_allclose(_apply(m, src), dst, atol=1e-3)
    # inverse round-trips
    minv = invert_affine(m)
    np.testing.assert_allclose(_apply(minv, dst), src, atol=1e-3)


def test_warp_affine_identity_and_shift():
    img = jnp.asarray(np.random.RandomState(1).rand(16, 16, 3).astype(np.float32))
    ident = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
    np.testing.assert_allclose(
        np.asarray(warp_affine(img, ident, (16, 16))), np.asarray(img), atol=1e-6
    )
    shift = np.array([[1, 0, 3], [0, 1, 0]], np.float32)  # dst_x = src_x + 3
    out = np.asarray(warp_affine(img, shift, (16, 16)))
    np.testing.assert_allclose(out[:, 3:], np.asarray(img)[:, :13], atol=1e-5)


def test_helper_align_and_pasteback_roundtrip():
    # smooth image: the align/paste round trip resamples 2x down then up,
    # which only preserves low frequencies
    yy, xx = np.meshgrid(np.linspace(0, 1, 128), np.linspace(0, 1, 128), indexing="ij")
    img = jnp.asarray(
        np.stack([np.sin(3 * xx) * 0.5 + 0.5, yy, (xx + yy) / 2], -1).astype(
            np.float32
        )
    )
    # a face whose landmarks are the template scaled into this image
    m_true = np.array([[0.25, 0, 0], [0, 0.25, 0]], np.float32)
    lm = _apply(m_true, FACE_TEMPLATE_512)

    helper = FaceRestoreHelper(face_size=64, upscale_factor=1)
    helper.add_landmarks(lm)
    crops = helper.align_warp_faces(img)
    assert len(crops) == 1 and crops[0].shape == (64, 64, 3)

    # restore = identity: paste-back must reproduce the input in the face
    # interior (soft mask only fades the border band)
    helper.add_restored_face(crops[0])
    out = np.asarray(helper.paste_faces_to_input_image(img))
    assert out.shape == (128, 128, 3)
    np.testing.assert_allclose(out[40:90, 40:90], np.asarray(img)[40:90, 40:90], atol=0.02)


def test_detector_required_error():
    helper = FaceRestoreHelper()
    with pytest.raises(RuntimeError):
        helper.detect_faces(np.zeros((8, 8, 3), np.float32))


def test_retinaface_detector_wires_into_helper():
    """End-to-end detect -> align -> restore -> paste-back with the in-repo
    RetinaFace detector (random weights; conf threshold 0 forces detections
    so the full contract — [K,15] rows -> [5,2] landmarks -> warps — runs)."""
    import jax

    from tair_tpu.utils.retinaface import RetinaFace, RetinaFaceDetector

    params = RetinaFace().init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )["params"]
    det = RetinaFaceDetector(params)
    img = np.random.RandomState(1).rand(64, 64, 3).astype(np.float32)
    rows = det.detect(img, conf_threshold=0.0, nms_threshold=0.4)
    assert rows.shape[1] == 15 and len(rows) >= 1

    helper = FaceRestoreHelper(
        face_size=32, detector=det.as_landmark_detector(conf_threshold=0.0)
    )
    n = helper.detect_faces(img)
    assert n == len(rows)
    crops = helper.align_warp_faces(jnp.asarray(img))
    assert crops[0].shape == (32, 32, 3)
    helper.restored_faces = [c for c in crops]
    out = np.asarray(helper.paste_faces_to_input_image(jnp.asarray(img)))
    assert out.shape == (64, 64, 3) and np.isfinite(out).all()

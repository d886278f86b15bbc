"""XLA-native vision ops vs torch/analytic oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from tair_tpu.ops.deform_conv import deform_conv2d
from tair_tpu.ops.roi_align_rotated import roi_align_rotated
from tair_tpu.ops.rotated_boxes import (
    box_to_corners,
    nms_rotated,
    rotated_iou_matrix,
    rotated_iou_pair,
)
from tair_tpu.ops.sampling import bilinear_sample_nhwc


def test_bilinear_sample_matches_torch_gridsample():
    import torch
    import torch.nn.functional as F

    rs = np.random.RandomState(0)
    img = rs.rand(2, 7, 9, 3).astype(np.float32)
    x = rs.uniform(-1, 9, (2, 5)).astype(np.float32)
    y = rs.uniform(-1, 7, (2, 5)).astype(np.float32)
    ours = np.asarray(bilinear_sample_nhwc(jnp.asarray(img), jnp.asarray(x), jnp.asarray(y)))

    t = torch.from_numpy(img).permute(0, 3, 1, 2)
    gx = torch.from_numpy((x + 0.5) / 9 * 2 - 1)
    gy = torch.from_numpy((y + 0.5) / 7 * 2 - 1)
    grid = torch.stack([gx, gy], -1).unsqueeze(1)  # [B, 1, 5, 2]
    ref = F.grid_sample(t, grid, align_corners=False, padding_mode="zeros")
    ref = ref.squeeze(2).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_deform_conv_zero_offsets_equals_conv():
    """With zero offsets and unit mask, deformable conv == standard conv."""
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.rand(1, 8, 8, 4), jnp.float32)
    w = jnp.asarray(rs.rand(3, 3, 4, 6), jnp.float32)
    offsets = jnp.zeros((1, 8, 8, 18))
    out = deform_conv2d(x, offsets, w, padding=1)

    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_deform_conv_modulated_and_offsets():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.rand(1, 8, 8, 2), jnp.float32)
    w = jnp.asarray(rs.rand(3, 3, 2, 4), jnp.float32)
    offsets = jnp.asarray(rs.uniform(-0.5, 0.5, (1, 8, 8, 18)), jnp.float32)
    mask = jnp.asarray(rs.rand(1, 8, 8, 9), jnp.float32)
    out = deform_conv2d(x, offsets, w, mask=mask, padding=1)
    assert out.shape == (1, 8, 8, 4)
    # half mask halves the (linear) response
    out2 = deform_conv2d(x, offsets, w, mask=mask * 0.5, padding=1)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out) * 0.5, atol=1e-5)


def test_rotated_iou_known_values():
    a = jnp.asarray([0.0, 0.0, 2.0, 2.0, 0.0])
    assert abs(float(rotated_iou_pair(a, a)) - 1.0) < 1e-5
    b = jnp.asarray([1.0, 0.0, 2.0, 2.0, 0.0])  # half-overlap
    assert abs(float(rotated_iou_pair(a, b)) - 1.0 / 3.0) < 1e-5
    c = jnp.asarray([0.0, 0.0, 2.0, 2.0, 45.0])  # rotated square on itself
    # square vs 45deg square: intersection is the octagon, area 8(sqrt2-1)
    expected = (8 * (np.sqrt(2) - 1)) / (8 - 8 * (np.sqrt(2) - 1))
    assert abs(float(rotated_iou_pair(a, c)) - expected) < 1e-3
    d = jnp.asarray([10.0, 10.0, 2.0, 2.0, 0.0])  # disjoint
    assert float(rotated_iou_pair(a, d)) == 0.0


def test_rotated_iou_matches_cv2():
    import cv2

    rs = np.random.RandomState(3)
    for _ in range(10):
        a = np.array([*rs.uniform(3, 7, 2), *rs.uniform(1, 4, 2),
                      rs.uniform(-90, 90)], np.float32)
        b = np.array([*rs.uniform(3, 7, 2), *rs.uniform(1, 4, 2),
                      rs.uniform(-90, 90)], np.float32)
        inter = cv2.rotatedRectangleIntersection(
            ((a[0], a[1]), (a[2], a[3]), a[4]),
            ((b[0], b[1]), (b[2], b[3]), b[4]),
        )
        area = cv2.contourArea(inter[1]) if inter[1] is not None else 0.0
        ref = area / (a[2] * a[3] + b[2] * b[3] - area)
        ours = float(rotated_iou_pair(jnp.asarray(a), jnp.asarray(b)))
        assert abs(ours - ref) < 2e-3, (a, b, ours, ref)


def test_nms_rotated():
    boxes = jnp.asarray(
        [
            [0, 0, 2, 2, 0],
            [0.1, 0, 2, 2, 0],    # near-duplicate of 0
            [10, 10, 2, 2, 30],
        ],
        jnp.float32,
    )
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep = np.asarray(nms_rotated(boxes, scores, 0.5))
    assert keep.tolist() == [True, False, True]


def test_roi_align_rotated_constant_region():
    """Pooling a constant-valued region returns that constant."""
    img = jnp.ones((1, 16, 16, 3)) * 5.0
    rois = jnp.asarray([[0, 8.0, 8.0, 6.0, 4.0, 30.0]])
    out = roi_align_rotated(img, rois, output_size=4)
    assert out.shape == (1, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(out), 5.0, atol=1e-5)


def test_roi_align_rotated_axis_aligned_gradient():
    """Axis-aligned ROI over a linear-ramp image pools the ramp faithfully."""
    ramp = jnp.tile(jnp.arange(16, dtype=jnp.float32)[None, :, None], (16, 1, 1))
    img = ramp[None]  # [1, 16, 16, 1], value == x coordinate
    rois = jnp.asarray([[0, 7.5, 7.5, 8.0, 8.0, 0.0]])
    out = roi_align_rotated(img, rois, output_size=4)[0, :, :, 0]
    # each output column's mean x should increase linearly
    cols = np.asarray(out).mean(axis=0)
    diffs = np.diff(cols)
    np.testing.assert_allclose(diffs, diffs[0], atol=1e-4)
    assert diffs[0] > 0

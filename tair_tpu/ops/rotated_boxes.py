"""Rotated-box geometry: exact IoU and NMS (XLA-native, jittable).

TPU counterpart of detectron2's box_iou_rotated / nms_rotated CUDA ops
(/root/reference/detectron2/detectron2/layers/csrc/{box_iou_rotated,
nms_rotated}/ — native inventory). Rotated rectangles are convex, so the
exact intersection is a Sutherland-Hodgman clip with a fixed vertex budget
(<= 8 for two rectangles) — static shapes, fully vectorizable; NMS is the
standard greedy suppression as a fori_loop over score-sorted boxes.

Boxes: (cx, cy, w, h, angle_degrees), angle counter-clockwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_VERTS = 8


def box_to_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 5] -> [..., 4, 2] corner points (ccw)."""
    cx, cy, w, h, ang = jnp.split(boxes, 5, axis=-1)
    theta = jnp.deg2rad(ang)
    c, s = jnp.cos(theta), jnp.sin(theta)
    dx = jnp.concatenate([-w, w, w, -w], -1) / 2
    dy = jnp.concatenate([-h, -h, h, h], -1) / 2
    x = cx + dx * c - dy * s
    y = cy + dx * s + dy * c
    return jnp.stack([x, y], -1)


def _polygon_area(pts: jnp.ndarray, n_valid: jnp.ndarray) -> jnp.ndarray:
    """Shoelace over the first n_valid of MAX_VERTS points (rest ignored)."""
    m = pts.shape[-2]
    idx = jnp.arange(m)
    valid = idx < n_valid
    nxt = jnp.where(idx + 1 < n_valid, idx + 1, 0)
    x, y = pts[..., 0], pts[..., 1]
    xn = jnp.take(x, nxt, axis=-1)
    yn = jnp.take(y, nxt, axis=-1)
    cross = (x * yn - xn * y) * valid
    return jnp.abs(cross.sum(-1)) / 2.0


def _clip_polygon(pts, n, a, b):
    """Clip polygon (pts[:n]) by half-plane left of edge a->b."""
    m = MAX_VERTS
    edge = b - a

    def side(p):
        return edge[0] * (p[..., 1] - a[1]) - edge[1] * (p[..., 0] - a[0])

    def body(i, carry):
        out, cnt = carry
        cur = pts[i % m]
        nxt_i = jnp.where(i + 1 < n, i + 1, 0)
        nxt = pts[nxt_i]
        s_cur = side(cur)
        s_nxt = side(nxt)
        denom = s_cur - s_nxt
        t = jnp.where(jnp.abs(denom) > 1e-12, s_cur / jnp.where(
            jnp.abs(denom) > 1e-12, denom, 1.0), 0.0)
        inter = cur + t * (nxt - cur)

        def push(carry, p, cond):
            out, cnt = carry
            out = jnp.where(
                (jnp.arange(m) == cnt)[:, None] & cond, p[None], out
            )
            return out, cnt + jnp.int32(cond)

        inside_cur = s_cur >= 0
        inside_nxt = s_nxt >= 0
        active = i < n
        out, cnt = push((out, cnt), cur, active & inside_cur)
        crosses = active & (inside_cur != inside_nxt)
        out, cnt = push((out, cnt), inter, crosses)
        return out, cnt

    out0 = jnp.zeros((m, 2), pts.dtype)
    out, cnt = jax.lax.fori_loop(0, m, body, (out0, jnp.int32(0)))
    return out, cnt


def rotated_iou_pair(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """Exact IoU of two rotated boxes [5] each -> scalar."""
    pa = box_to_corners(box_a[None])[0]  # [4, 2]
    pb = box_to_corners(box_b[None])[0]

    pts = jnp.zeros((MAX_VERTS, 2), box_a.dtype).at[:4].set(pa)
    n = jnp.int32(4)
    for i in range(4):
        a = pb[i]
        b = pb[(i + 1) % 4]
        pts, n = _clip_polygon(pts, n, a, b)

    inter = _polygon_area(pts, n)
    area_a = box_a[2] * box_a[3]
    area_b = box_b[2] * box_b[3]
    return inter / jnp.maximum(area_a + area_b - inter, 1e-9)


def rotated_iou_matrix(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """[N, 5] x [M, 5] -> [N, M] exact IoU."""
    return jax.vmap(lambda a: jax.vmap(lambda b: rotated_iou_pair(a, b))(boxes_b))(
        boxes_a
    )


def nms_rotated(
    boxes: jnp.ndarray,   # [N, 5]
    scores: jnp.ndarray,  # [N]
    iou_threshold: float = 0.5,
) -> jnp.ndarray:
    """Greedy NMS; returns a boolean keep mask [N] (jittable, static shape)."""
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    sorted_boxes = boxes[order]
    iou = rotated_iou_matrix(sorted_boxes, sorted_boxes)

    def body(i, keep):
        # suppressed if any higher-ranked kept box overlaps too much
        overlap = (iou[i] > iou_threshold) & (jnp.arange(n) < i) & keep
        return keep.at[i].set(~overlap.any())

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.ones((n,), bool))
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep

"""Hungarian matchers for TESTR (device-side costs, host-side LSAP).

Parity with /root/reference/testr/adet/modeling/testr/matcher.py:10-172:
CtrlPointHungarianMatcher (focal class + keypoint-L1 costs) and
BoxHungarianMatcher (focal class + box-L1 + GIoU). Cost matrices are computed
on device over STATIC padded targets [B, M, ...]; the linear sum assignment
runs host-side through `jax.pure_callback` (scipy), mirroring the reference's
implicit GPU->CPU hop (matcher.py:74-76). The assignment is returned as a
dense [B, M] query index per target (-1 for padding) — jit-friendly.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _focal_class_cost(prob: jnp.ndarray, alpha=0.25, gamma=2.0):
    """prob [..., 1] sigmoid; returns pos_cost - neg_cost for class 0."""
    neg = (1 - alpha) * (prob**gamma) * (-jnp.log(1 - prob + 1e-8))
    pos = alpha * ((1 - prob) ** gamma) * (-jnp.log(prob + 1e-8))
    return (pos - neg)[..., 0]


def box_cxcywh_to_xyxy(b):
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def generalized_box_iou_pairwise(a, b):
    """a [..., Q, 4], b [..., M, 4] xyxy -> GIoU [..., Q, M]."""
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[..., :, None] + area_b[..., None, :] - inter
    iou = inter / jnp.maximum(union, 1e-9)
    # smallest enclosing box
    lt_c = jnp.minimum(a[..., :, None, :2], b[..., None, :, :2])
    rb_c = jnp.maximum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh_c = jnp.clip(rb_c - lt_c, 0)
    area_c = wh_c[..., 0] * wh_c[..., 1]
    return iou - (area_c - union) / jnp.maximum(area_c, 1e-9)


def _lsa_host(cost: np.ndarray, n_valid: np.ndarray) -> np.ndarray:
    """Batched rectangular LSAP on host: native C++ Hungarian when built
    (tair_tpu.native_ext), scipy fallback. cost [B, Q, M]; returns [B, M]
    query index per target (-1 for padded targets)."""
    from ..native_ext import lapjv_batch

    native = lapjv_batch(cost, np.asarray(n_valid, np.int32))
    if native is not None:
        return native

    from scipy.optimize import linear_sum_assignment

    b, q, m = cost.shape
    out = np.full((b, m), -1, np.int32)
    for i in range(b):
        n = int(n_valid[i])
        if n == 0:
            continue
        rows, cols = linear_sum_assignment(cost[i, :, :n])
        out[i, cols] = rows
    return out


def solve_assignment(cost: jnp.ndarray, n_valid: jnp.ndarray) -> jnp.ndarray:
    """jit-safe wrapper: [B, Q, M] cost + [B] counts -> [B, M] src indices."""
    b, _, m = cost.shape
    return jax.pure_callback(
        _lsa_host,
        jax.ShapeDtypeStruct((b, m), jnp.int32),
        jax.lax.stop_gradient(cost.astype(jnp.float32)),
        n_valid,
        vmap_method="sequential",
    )


def greedy_assignment(cost: jnp.ndarray, n_valid: jnp.ndarray) -> jnp.ndarray:
    """Fully-jittable greedy matching (no host callback): repeatedly take the
    globally cheapest unassigned (query, target) pair. An approximation of
    the Hungarian optimum that keeps the whole train step on device — useful
    when the pure_callback SPMD funnel to device 0 dominates; opt in by
    passing matcher="greedy" to the criterion. cost [B,Q,M] -> [B,M]."""
    b, q, m = cost.shape
    big = jnp.float32(1e9)
    tgt_mask = jnp.arange(m)[None] < n_valid[:, None]  # [B, M]
    c0 = jnp.where(tgt_mask[:, None, :], cost.astype(jnp.float32), big)

    def body(_, carry):
        c, out = carry
        flat = c.reshape(b, q * m)
        idx = jnp.argmin(flat, axis=1)
        qi, mi = idx // m, idx % m
        valid = jnp.take_along_axis(flat, idx[:, None], 1)[:, 0] < big / 2
        out = jnp.where(
            valid[:, None] & (jnp.arange(m)[None] == mi[:, None]),
            qi[:, None].astype(jnp.int32), out,
        )
        # block the assigned row and column
        c = jnp.where(
            (jnp.arange(q)[None, :, None] == qi[:, None, None])
            | (jnp.arange(m)[None, None, :] == mi[:, None, None]),
            big, c,
        )
        return c, out

    out0 = jnp.full((b, m), -1, jnp.int32)
    _, out = jax.lax.fori_loop(0, m, body, (c0, out0))
    return out


def ctrl_point_match(
    outputs: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    class_weight: float = 2.0,
    coord_weight: float = 5.0,
    alpha: float = 0.25,
    gamma: float = 2.0,
    impl: str = "hungarian",
) -> jnp.ndarray:
    """Decoder matching. outputs: pred_logits [B,Q,Np,1], pred_ctrl_points
    [B,Q,Np,2]; targets: ctrl_points [B,M,Np,2], inst_mask [B,M].
    Returns [B, M] matched query index (-1 = padding)."""
    prob = jax.nn.sigmoid(outputs["pred_logits"].astype(jnp.float32))
    cost_class = _focal_class_cost(prob, alpha, gamma).mean(-1)[..., None]  # [B,Q,1]

    out_pts = outputs["pred_ctrl_points"].astype(jnp.float32)
    b, q = out_pts.shape[:2]
    m = targets["ctrl_points"].shape[1]
    out_flat = out_pts.reshape(b, q, -1)
    tgt_flat = targets["ctrl_points"].astype(jnp.float32).reshape(b, m, -1)
    cost_kpts = jnp.sum(
        jnp.abs(out_flat[:, :, None, :] - tgt_flat[:, None, :, :]), axis=-1
    )  # [B, Q, M]

    cost = class_weight * cost_class + coord_weight * cost_kpts
    n_valid = targets["inst_mask"].sum(-1).astype(jnp.int32)
    if impl == "greedy":
        return greedy_assignment(cost, n_valid)
    return solve_assignment(cost, n_valid)


def box_match(
    outputs: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    class_weight: float = 2.0,
    coord_weight: float = 5.0,
    giou_weight: float = 2.0,
    alpha: float = 0.25,
    gamma: float = 2.0,
    impl: str = "hungarian",
) -> jnp.ndarray:
    """Encoder-proposal matching. outputs: pred_logits [B,S,1], pred_boxes
    [B,S,4] cxcywh; targets: boxes [B,M,4], inst_mask [B,M]."""
    prob = jax.nn.sigmoid(outputs["pred_logits"].astype(jnp.float32))
    cost_class = _focal_class_cost(prob, alpha, gamma)[..., None]  # [B,S,1]

    out_box = outputs["pred_boxes"].astype(jnp.float32)
    tgt_box = targets["boxes"].astype(jnp.float32)
    cost_bbox = jnp.sum(
        jnp.abs(out_box[:, :, None, :] - tgt_box[:, None, :, :]), axis=-1
    )
    cost_giou = -generalized_box_iou_pairwise(
        box_cxcywh_to_xyxy(out_box), box_cxcywh_to_xyxy(tgt_box)
    )
    cost = class_weight * cost_class + coord_weight * cost_bbox + giou_weight * cost_giou
    n_valid = targets["inst_mask"].sum(-1).astype(jnp.int32)
    if impl == "greedy":
        return greedy_assignment(cost, n_valid)
    return solve_assignment(cost, n_valid)

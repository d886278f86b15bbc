"""SetCriterion for TESTR over static padded targets.

Parity with /root/reference/testr/adet/modeling/testr/losses.py:9-242:
Hungarian-matched focal classification, ctrl-point L1, text cross-entropy for
the decoder (+ every aux layer), focal + box L1 + GIoU for the encoder
proposals, instance-count normalization psum'd across the data mesh axis
(replacing torch.distributed.all_reduce at losses.py:205-207).

Static-shape design: targets are padded to [B, M, ...] with inst_mask; the
matcher returns a dense [B, M] query index so every loss is a masked gather
instead of ragged boolean indexing.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from .matcher import (
    box_cxcywh_to_xyxy,
    box_match,
    ctrl_point_match,
    generalized_box_iou_pairwise,
)


@dataclass(frozen=True)
class CriterionConfig:
    # weight_dict (transformer_detector.py:54-66 + defaults.py:361-369)
    point_class_weight: float = 2.0
    point_coord_weight: float = 5.0
    point_text_weight: float = 2.0
    box_class_weight: float = 2.0
    box_coord_weight: float = 5.0
    box_giou_weight: float = 2.0
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    aux_loss: bool = True
    # "hungarian"/"jv": exact on-device Jonker-Volgenant (default; SPMD-clean,
    # no host callback). "hungarian_host": exact via pure_callback (scipy /
    # native C++). "greedy": jittable approximation.
    matcher: str = "hungarian"


def sigmoid_focal_loss(logits, targets_onehot, num_inst, alpha=0.25, gamma=2.0):
    """Matches the reference normalization: mean over (query, point) dims,
    sum over batch and class, / num_inst (losses.py:9-40)."""
    logits = logits.astype(jnp.float32)
    prob = jax.nn.sigmoid(logits)
    ce = optax.sigmoid_binary_cross_entropy(logits, targets_onehot)
    p_t = prob * targets_onehot + (1 - prob) * (1 - targets_onehot)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        loss = (alpha * targets_onehot + (1 - alpha) * (1 - targets_onehot)) * loss
    if loss.ndim == 4:
        return loss.mean(axis=(1, 2)).sum() / num_inst
    if loss.ndim == 3:
        return loss.mean(axis=1).sum() / num_inst
    raise ValueError(loss.ndim)


def _gather_by_src(pred: jnp.ndarray, src_idx: jnp.ndarray) -> jnp.ndarray:
    """pred [B, Q, ...], src_idx [B, M] -> [B, M, ...] (clip -1 to 0; caller
    masks)."""
    idx = jnp.clip(src_idx, 0)
    expand = (...,) + (None,) * (pred.ndim - 2)
    return jnp.take_along_axis(pred, idx[expand].astype(jnp.int32), axis=1)


def dec_losses(outputs, targets, src_idx, num_inst, cfg: CriterionConfig):
    """Decoder losses for one layer's outputs."""
    # valid AND matched: with more valid targets than queries (the
    # matcher's M > Q orientation) the surplus targets carry src_idx == -1
    # and must contribute nothing — clipping them to query 0 would stack
    # multiple "one-hot" targets on it (reference: unmatched targets simply
    # don't appear in scipy's assignment lists)
    mask = (
        targets["inst_mask"].astype(jnp.float32)
        * (src_idx >= 0).astype(jnp.float32)
    )  # [B, M]
    b, q = outputs["pred_logits"].shape[:2]

    # classification: one-hot over queries from the assignment
    oh = jax.nn.one_hot(jnp.clip(src_idx, 0), q) * mask[..., None]  # [B,M,Q]
    pos_mask = oh.sum(1)  # [B, Q] in {0,1}
    n_pts = outputs["pred_logits"].shape[2]
    tgt_onehot = jnp.broadcast_to(
        pos_mask[:, :, None, None], outputs["pred_logits"].shape
    )
    loss_ce = (
        sigmoid_focal_loss(
            outputs["pred_logits"], tgt_onehot, num_inst,
            cfg.focal_alpha, cfg.focal_gamma,
        )
        * q
    )

    # ctrl points: L1 over matched pairs
    src_pts = _gather_by_src(outputs["pred_ctrl_points"], src_idx)  # [B,M,Np,2]
    l1 = jnp.abs(src_pts.astype(jnp.float32) - targets["ctrl_points"])
    loss_ctrl = (l1 * mask[:, :, None, None]).sum() / num_inst

    # texts: CE averaged over matched (instance, char) cells
    src_txt = _gather_by_src(outputs["pred_texts"], src_idx)  # [B,M,Nw,V+1]
    logp = jax.nn.log_softmax(src_txt.astype(jnp.float32), axis=-1)
    tgt = targets["texts"].astype(jnp.int32)  # [B,M,Nw]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    n_cells = jnp.maximum(mask.sum() * tgt.shape[-1], 1.0)
    loss_texts = (nll * mask[:, :, None]).sum() / n_cells

    return {
        "loss_ce": loss_ce * cfg.point_class_weight,
        "loss_ctrl_points": loss_ctrl * cfg.point_coord_weight,
        "loss_texts": loss_texts * cfg.point_text_weight,
    }


def enc_losses(enc_outputs, targets, src_idx, num_inst, cfg: CriterionConfig):
    # valid AND matched — see dec_losses
    mask = (
        targets["inst_mask"].astype(jnp.float32)
        * (src_idx >= 0).astype(jnp.float32)
    )
    b, s = enc_outputs["pred_logits"].shape[:2]

    oh = jax.nn.one_hot(jnp.clip(src_idx, 0), s) * mask[..., None]
    pos_mask = oh.sum(1)
    tgt_onehot = pos_mask[:, :, None]
    loss_ce = (
        sigmoid_focal_loss(
            enc_outputs["pred_logits"], tgt_onehot, num_inst,
            cfg.focal_alpha, cfg.focal_gamma,
        )
        * s
    )

    src_boxes = _gather_by_src(enc_outputs["pred_boxes"], src_idx)  # [B,M,4]
    tgt_boxes = targets["boxes"].astype(jnp.float32)
    l1 = jnp.abs(src_boxes.astype(jnp.float32) - tgt_boxes).sum(-1)
    loss_bbox = (l1 * mask).sum() / num_inst

    giou = generalized_box_iou_pairwise(
        box_cxcywh_to_xyxy(src_boxes.astype(jnp.float32)).reshape(-1, 1, 4),
        box_cxcywh_to_xyxy(tgt_boxes).reshape(-1, 1, 4),
    ).reshape(b, -1)
    loss_giou = ((1.0 - giou) * mask).sum() / num_inst

    return {
        "loss_ce_enc": loss_ce * cfg.box_class_weight,
        "loss_bbox_enc": loss_bbox * cfg.box_coord_weight,
        "loss_giou_enc": loss_giou * cfg.box_giou_weight,
    }


def set_criterion(
    outputs: Dict[str, Any],
    targets: Dict[str, jnp.ndarray],
    cfg: CriterionConfig = CriterionConfig(),
    axis_name: Optional[str] = None,
) -> Dict[str, jnp.ndarray]:
    """Full weighted TESTR loss dict; 'loss_total' is the training scalar."""
    num_inst = targets["inst_mask"].astype(jnp.float32).sum()
    if axis_name is not None:
        num_inst = jax.lax.psum(num_inst, axis_name) / jax.lax.axis_size(axis_name)
    num_inst = jnp.maximum(num_inst, 1.0)

    losses: Dict[str, jnp.ndarray] = {}
    src_idx = ctrl_point_match(
        outputs, targets,
        cfg.point_class_weight, cfg.point_coord_weight,
        cfg.focal_alpha, cfg.focal_gamma, cfg.matcher,
    )
    losses.update(dec_losses(outputs, targets, src_idx, num_inst, cfg))

    if cfg.aux_loss and "aux_outputs" in outputs:
        for i, aux in enumerate(outputs["aux_outputs"]):
            idx_i = ctrl_point_match(
                aux, targets,
                cfg.point_class_weight, cfg.point_coord_weight,
                cfg.focal_alpha, cfg.focal_gamma, cfg.matcher,
            )
            for k, v in dec_losses(aux, targets, idx_i, num_inst, cfg).items():
                losses[f"{k}_{i}"] = v

    if "enc_outputs" in outputs:
        enc_idx = box_match(
            outputs["enc_outputs"], targets,
            cfg.box_class_weight, cfg.box_coord_weight, cfg.box_giou_weight,
            cfg.focal_alpha, cfg.focal_gamma, cfg.matcher,
        )
        losses.update(
            enc_losses(outputs["enc_outputs"], targets, enc_idx, num_inst, cfg)
        )

    losses["loss_total"] = sum(
        v for k, v in losses.items() if k != "loss_total"
    )
    return losses

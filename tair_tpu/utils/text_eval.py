"""ICDAR/RRC-style detection & end-to-end text-spotting evaluation (host).

Counterpart of the reference's bundled evaluation stack
(/root/reference/testr/adet/evaluation/text_eval_script.py:64-472 and
rrc_evaluation_funcs.py): polygon-IoU-constrained one-to-one matching at
IoU>=0.5, detection precision/recall/hmean, and end-to-end hmean where the
transcription must also match. Polygon IoU uses rasterized masks (cv2) —
numerically equivalent to the Polygon-library geometry at 512^2 scale and
robust to self-intersections.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np


@dataclass
class SpottingInstance:
    polygon: np.ndarray  # [N, 2] pixel coords
    text: str
    score: float = 1.0


def polygon_iou(
    poly_a: np.ndarray, poly_b: np.ndarray, canvas: int = 768
) -> float:
    import cv2

    both = np.concatenate([poly_a, poly_b], 0)
    lo = both.min(0)
    scale = max(1e-6, float((both - lo).max()))
    size = canvas - 1

    def mask(p):
        m = np.zeros((canvas, canvas), np.uint8)
        q = np.round((p - lo) / scale * size).astype(np.int32)
        cv2.fillPoly(m, [q], 1)
        return m

    ma, mb = mask(poly_a), mask(poly_b)
    inter = np.logical_and(ma, mb).sum()
    union = np.logical_or(ma, mb).sum()
    return float(inter) / max(float(union), 1.0)


def _norm_text(t: str, case_sensitive: bool) -> str:
    return t if case_sensitive else t.upper()


def evaluate_image(
    gts: Sequence[SpottingInstance],
    preds: Sequence[SpottingInstance],
    iou_threshold: float = 0.5,
    case_sensitive: bool = False,
) -> Dict[str, int]:
    """One-to-one greedy matching by IoU; returns match counts."""
    matched_det = 0
    matched_e2e = 0
    used = [False] * len(preds)
    for gt in gts:
        best, best_iou = -1, iou_threshold
        for j, pr in enumerate(preds):
            if used[j]:
                continue
            iou = polygon_iou(gt.polygon, pr.polygon)
            if iou >= best_iou:
                best, best_iou = j, iou
        if best >= 0:
            used[best] = True
            matched_det += 1
            if _norm_text(preds[best].text, case_sensitive) == _norm_text(
                gt.text, case_sensitive
            ):
                matched_e2e += 1
    return {
        "matched_det": matched_det,
        "matched_e2e": matched_e2e,
        "num_gt": len(gts),
        "num_pred": len(preds),
    }


def _prf(matched: int, num_gt: int, num_pred: int) -> Dict[str, float]:
    p = matched / num_pred if num_pred else 0.0
    r = matched / num_gt if num_gt else 0.0
    h = 2 * p * r / (p + r) if p + r else 0.0
    return {"precision": p, "recall": r, "hmean": h}


def evaluate_dataset(
    all_gts: Sequence[Sequence[SpottingInstance]],
    all_preds: Sequence[Sequence[SpottingInstance]],
    iou_threshold: float = 0.5,
    case_sensitive: bool = False,
) -> Dict[str, float]:
    """Aggregate detection + end-to-end P/R/F over a dataset."""
    tot = {"matched_det": 0, "matched_e2e": 0, "num_gt": 0, "num_pred": 0}
    for gts, preds in zip(all_gts, all_preds):
        res = evaluate_image(gts, preds, iou_threshold, case_sensitive)
        for k in tot:
            tot[k] += res[k]
    det = _prf(tot["matched_det"], tot["num_gt"], tot["num_pred"])
    e2e = _prf(tot["matched_e2e"], tot["num_gt"], tot["num_pred"])
    return {
        **{f"det_{k}": v for k, v in det.items()},
        **{f"e2e_{k}": v for k, v in e2e.items()},
        **tot,
    }


def _pairwise_ious(
    all_gts: Sequence[Sequence[SpottingInstance]],
    all_preds: Sequence[Sequence[SpottingInstance]],
):
    """Per-image [n_pred, n_gt] polygon-IoU matrices and pred scores."""
    ious, scores = [], []
    for gts, preds in zip(all_gts, all_preds):
        m = np.zeros((len(preds), len(gts)), np.float32)
        for i, pr in enumerate(preds):
            for j, gt in enumerate(gts):
                m[i, j] = polygon_iou(pr.polygon, gt.polygon)
        ious.append(m)
        scores.append(np.asarray([p.score for p in preds], np.float32))
    return ious, scores


def _ap_accumulate_py(ious, scores, thresholds):
    """Pure-Python AP accumulation — the oracle for native/cocoeval.cpp."""
    total_gt = sum(m.shape[1] for m in ious)
    aps = []
    for thr in thresholds:
        if total_gt == 0:
            aps.append(0.0)
            continue
        scored = []  # (score, is_tp)
        for m, sc in zip(ious, scores):
            order = np.argsort(-sc, kind="stable")
            taken = [False] * m.shape[1]
            for i in order:
                best, best_iou = -1, thr
                for j in range(m.shape[1]):
                    if taken[j]:
                        continue
                    if m[i, j] >= best_iou:
                        best, best_iou = j, m[i, j]
                if best >= 0:
                    taken[best] = True
                    scored.append((float(sc[i]), 1))
                else:
                    scored.append((float(sc[i]), 0))
        scored.sort(key=lambda x: -x[0])
        tp = np.cumsum([s[1] for s in scored]) if scored else np.zeros(0)
        fp = np.cumsum([1 - s[1] for s in scored]) if scored else np.zeros(0)
        recall = tp / total_gt
        precision = tp / np.maximum(tp + fp, 1e-9)
        # 101-point interpolation
        ap = 0.0
        for r in np.linspace(0, 1, 101):
            p = precision[recall >= r].max() if (recall >= r).any() else 0.0
            ap += p / 101
        aps.append(float(ap))
    return np.asarray(aps, np.float64)


def average_precision(
    all_gts: Sequence[Sequence[SpottingInstance]],
    all_preds: Sequence[Sequence[SpottingInstance]],
    iou_thresholds: Sequence[float] = (0.5,),
    use_native: bool = True,
) -> Dict[str, float]:
    """COCO-style average precision over polygon IoU.

    Counterpart of the vendored fast cocoeval
    (/root/reference/detectron2/detectron2/layers/csrc/cocoeval/): polygon
    IoUs are computed once in Python (as detectron2's COCOeval does), then
    the per-threshold score-ranked greedy matching and 101-point-interpolated
    AP accumulation run in native C++ (native/cocoeval.cpp via ctypes), with
    a pure-Python fallback of identical semantics.
    """
    ious, scores = _pairwise_ious(all_gts, all_preds)
    aps = None
    if use_native:
        from ..native_ext import coco_ap

        aps = coco_ap(ious, scores, list(iou_thresholds))
    if aps is None:
        aps = _ap_accumulate_py(ious, scores, iou_thresholds)
    results = {
        f"ap{int(thr * 100)}": float(a) for thr, a in zip(iou_thresholds, aps)
    }
    results["ap"] = float(np.mean(aps)) if len(aps) else 0.0
    return results


class LexiconMatcher:
    """Edit-distance lexicon-constrained decoding
    (counterpart of testr/adet/evaluation/lexicon_procesor.py)."""

    def __init__(self, lexicon: List[str], max_ratio: float = 0.5):
        self.lexicon = lexicon
        self.max_ratio = max_ratio

    @staticmethod
    def _edit_distance(a: str, b: str) -> int:
        m, n = len(a), len(b)
        dp = list(range(n + 1))
        for i in range(1, m + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, n + 1):
                cur = min(
                    dp[j] + 1,
                    dp[j - 1] + 1,
                    prev + (a[i - 1] != b[j - 1]),
                )
                prev, dp[j] = dp[j], cur
        return dp[n]

    @staticmethod
    def _weighted_edit_distance(a: str, b: str, char_probs, char_to_col) -> float:
        """Recognition-probability-weighted distance (lexicon_procesor.py's
        weighted_ed): substituting predicted char a[i] by candidate char
        b[j] costs 1 - P_i(b[j]) from the recognizer's softmax, so the
        matcher prefers candidates the recognizer found plausible."""
        m, n = len(a), len(b)
        dp = [float(j) for j in range(n + 1)]
        for i in range(1, m + 1):
            prev, dp[0] = dp[0], float(i)
            for j in range(1, n + 1):
                if a[i - 1] == b[j - 1]:
                    sub = prev
                else:
                    col = char_to_col.get(b[j - 1])
                    p = float(char_probs[i - 1][col]) if col is not None else 0.0
                    sub = prev + (1.0 - p)
                cur = min(dp[j] + 1.0, dp[j - 1] + 1.0, sub)
                prev, dp[j] = dp[j], cur
        return dp[n]

    def find_match_word(
        self, word: str, char_probs=None, char_to_col=None
    ) -> Optional[str]:
        """Best lexicon candidate within max_ratio*len(word) distance.
        With `char_probs` ([len(word), vocab] recognizer softmax rows) and
        `char_to_col` (char -> vocab column), uses the weighted distance."""
        if not word:
            return None
        best, best_d = None, 1e9
        up = word.upper()
        for cand in self.lexicon:
            if char_probs is not None:
                d = self._weighted_edit_distance(
                    up, cand.upper(), char_probs, char_to_col or {}
                )
            else:
                d = self._edit_distance(up, cand.upper())
            if d < best_d:
                best, best_d = cand, d
        if best is not None and best_d <= self.max_ratio * len(word):
            return best
        return None

"""Host-side result structures (detectron2.structures counterpart).

The reference's runtime path uses detectron2's Instances/Boxes/BoxMode
(/root/reference/testr/adet/modeling/transformer_detector.py:4,123-152). On
device everything here is dense static tensors + masks; this module is the
thin host-side container for eval/visualization code that wants the ragged
per-image view, plus box-format conversions.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Tuple

import numpy as np


@dataclass
class Instances:
    """Per-image prediction container: named fields with equal first dim."""

    image_size: Tuple[int, int]
    fields: Dict[str, np.ndarray] = field(default_factory=dict)

    def __len__(self) -> int:
        for v in self.fields.values():
            return len(v)
        return 0

    def __getattr__(self, name: str):
        try:
            return self.__dict__["fields"][name]
        except KeyError:
            raise AttributeError(name)

    def set(self, name: str, value) -> None:
        value = np.asarray(value)
        if self.fields:
            assert len(value) == len(self), f"length mismatch for {name}"
        self.fields[name] = value

    def __getitem__(self, sel) -> "Instances":
        return Instances(
            self.image_size, {k: v[sel] for k, v in self.fields.items()}
        )


def instances_from_spotter(result: Dict[str, np.ndarray], image_size: int,
                           batch_index: int = 0) -> Instances:
    """Dense spotter_inference output -> ragged Instances (keep-masked)."""
    keep = np.asarray(result["keep"][batch_index])
    inst = Instances((image_size, image_size))
    inst.set("scores", np.asarray(result["scores"][batch_index])[keep])
    inst.set("polygons", np.asarray(result["polygons"][batch_index])[keep])
    inst.set("recs", np.asarray(result["recs"][batch_index])[keep])
    inst.set("rec_scores", np.asarray(result["rec_scores"][batch_index])[keep])
    return inst


# ---- BoxMode conversions (detectron2.structures.BoxMode counterpart) ----

def xyxy_to_xywh(b: np.ndarray) -> np.ndarray:
    b = np.asarray(b, np.float32)
    return np.stack(
        [b[..., 0], b[..., 1], b[..., 2] - b[..., 0], b[..., 3] - b[..., 1]], -1
    )


def xywh_to_xyxy(b: np.ndarray) -> np.ndarray:
    b = np.asarray(b, np.float32)
    return np.stack(
        [b[..., 0], b[..., 1], b[..., 0] + b[..., 2], b[..., 1] + b[..., 3]], -1
    )


def xyxy_to_cxcywh(b: np.ndarray) -> np.ndarray:
    b = np.asarray(b, np.float32)
    return np.stack(
        [
            (b[..., 0] + b[..., 2]) / 2,
            (b[..., 1] + b[..., 3]) / 2,
            b[..., 2] - b[..., 0],
            b[..., 3] - b[..., 1],
        ],
        -1,
    )


def cxcywh_to_xyxy(b: np.ndarray) -> np.ndarray:
    b = np.asarray(b, np.float32)
    return np.stack(
        [
            b[..., 0] - b[..., 2] / 2,
            b[..., 1] - b[..., 3] / 2,
            b[..., 0] + b[..., 2] / 2,
            b[..., 1] + b[..., 3] / 2,
        ],
        -1,
    )

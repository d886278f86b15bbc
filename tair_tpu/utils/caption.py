"""Captioner interface (Empty / hook for LLaVA / RAM).

Counterpart of /root/reference/terediff/utils/caption.py:40-171 (LLaVA / RAM
/ Empty captioners — DiffBIR inference options outside the TAIR runtime
path). LLaVA/RAM require external multimodal checkpoints not shipped here;
the registry keeps the interface so they can be slotted in. The TAIR system
itself generates prompts from its own spotter (pipeline.restore_with_ocr_feedback).
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np

_REGISTRY: Dict[str, Callable[[], "Captioner"]] = {}


class Captioner:
    def __call__(self, image: np.ndarray) -> str:  # [H, W, 3] in [0,1]
        raise NotImplementedError


class EmptyCaptioner(Captioner):
    def __call__(self, image: np.ndarray) -> str:
        return ""


def register_captioner(name: str, factory: Callable[[], Captioner]) -> None:
    _REGISTRY[name] = factory


def build_captioner(name: str) -> Captioner:
    if name in ("none", "empty", "", None):
        return EmptyCaptioner()
    if name not in _REGISTRY:
        raise ValueError(
            f"captioner {name!r} not registered; LLaVA/RAM captioners require "
            "external checkpoints — register a factory via register_captioner"
        )
    return _REGISTRY[name]()


register_captioner("empty", EmptyCaptioner)

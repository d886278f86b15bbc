"""Per-stage trainable-parameter masks.

Parity with /root/reference/initialize.py:171-216 (name-pattern
requires_grad), re-expressed as a boolean pytree mask over the params dict
for `optax.masked` — the functional equivalent of freezing:
  stage1 "image_restoration_module": controlnet + UNet attention layers
  stage2 "text_spotting_module":     testr only
  stage3 "all_modules":              union of the two
VAE / CLIP / SwinIR are always frozen (loaded pretrained, cldm.py:56-62).
"""

from __future__ import annotations

from typing import Any, Dict

import jax

STAGE_ALIASES = {
    "stage1": "image_restoration_module",
    "stage2": "text_spotting_module",
    "stage3": "all_modules",
}


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def trainable_mask(params: Dict[str, Any], stage: str):
    """Boolean pytree: True where the given stage trains the parameter."""
    stage = STAGE_ALIASES.get(stage, stage)
    assert stage in (
        "image_restoration_module",
        "text_spotting_module",
        "all_modules",
    ), f"unknown stage {stage!r}"

    train_restoration = stage in ("image_restoration_module", "all_modules")
    train_spotter = stage in ("text_spotting_module", "all_modules")

    def decide(path, leaf) -> bool:
        p = _path_str(path)
        top = p.split("/", 1)[0]
        if top == "controlnet":
            return train_restoration
        if top == "unet":
            return train_restoration and "attn" in p
        if top == "testr":
            return train_spotter
        return False  # vae / clip / swinir always frozen

    return jax.tree_util.tree_map_with_path(decide, params)


def count_trainable(mask) -> int:
    return sum(int(m) for m in jax.tree.leaves(mask))

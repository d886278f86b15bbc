"""Captioners: Empty / LLaVA (HF transformers) / hook for RAM.

Counterpart of /root/reference/terediff/utils/caption.py:40-171 (LLaVA / RAM
/ Empty captioners — DiffBIR inference options outside the TAIR runtime
path). The reference drives the upstream `llava` package; here the HF
transformers port of the same model family runs the captioner on the host —
captioning is CPU-side prompt preprocessing, the TPU compute path never
blocks on it. Only the LLaVA checkpoint is external (a local
`llava-hf/llava-1.5-7b-hf`-layout directory); RAM (recognize-anything) has
no transformers port, so it stays a registry hook. The TAIR system itself
generates prompts from its own spotter (pipeline.restore_with_ocr_feedback).
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np

_REGISTRY: Dict[str, Callable[..., "Captioner"]] = {}


class Captioner:
    def __call__(self, image: np.ndarray) -> str:  # [H, W, 3] in [0,1]
        raise NotImplementedError


class EmptyCaptioner(Captioner):
    def __call__(self, image: np.ndarray) -> str:
        return ""


class LLaVACaptioner(Captioner):
    """Short-description captioning with LLaVA-1.5 (reference
    caption.py:55-171: same question prompt, greedy decoding).

    model_path: local directory in the HF `llava-hf/llava-1.5-*-hf` layout.
    model/processor may be passed directly (tests inject tiny random ones).
    """

    QUESTION = "Please give me a very short description of this image."

    def __init__(
        self,
        model_path: str | None = None,
        max_new_tokens: int = 512,
        model=None,
        processor=None,
    ):
        from transformers import AutoProcessor, LlavaForConditionalGeneration

        if model is None or processor is None:
            if not model_path:
                raise ValueError(
                    "LLaVACaptioner needs a local checkpoint directory "
                    "(llava-hf/llava-1.5-7b-hf layout); the runtime "
                    "(transformers) is built in, only the weights are external"
                )
            processor = AutoProcessor.from_pretrained(model_path)
            model = LlavaForConditionalGeneration.from_pretrained(model_path)
        self.processor = processor
        self.model = model.eval()
        self.max_new_tokens = max_new_tokens
        # llava_v1 conversation template (reference caption.py:100-113)
        self.prompt = f"USER: <image>\n{self.QUESTION} ASSISTANT:"

    def __call__(self, image: np.ndarray) -> str:
        import torch
        from PIL import Image

        img = Image.fromarray((np.clip(image, 0.0, 1.0) * 255).astype(np.uint8))
        inputs = self.processor(
            images=img, text=self.prompt, return_tensors="pt"
        )
        # some processor versions emit token_type_ids, which generate rejects
        inputs.pop("token_type_ids", None)
        with torch.no_grad():
            out = self.model.generate(
                **inputs, do_sample=False, max_new_tokens=self.max_new_tokens
            )
        n_in = inputs["input_ids"].shape[1]
        text = self.processor.batch_decode(
            out[:, n_in:], skip_special_tokens=True
        )[0]
        return text.strip()


def register_captioner(name: str, factory: Callable[..., Captioner]) -> None:
    _REGISTRY[name] = factory


def build_captioner(name: str, **kwargs) -> Captioner:
    if name in ("none", "empty", "", None):
        return EmptyCaptioner()
    if name not in _REGISTRY:
        raise ValueError(
            f"captioner {name!r} not registered; the RAM captioner requires "
            "an external package/checkpoint — register a factory via "
            "register_captioner"
        )
    return _REGISTRY[name](**kwargs)


register_captioner("empty", EmptyCaptioner)
register_captioner("llava", LLaVACaptioner)

"""Captioners: Empty / LLaVA (HF transformers) / RAM++ (native graph).

Counterpart of /root/reference/terediff/utils/caption.py:40-171 (LLaVA / RAM
/ Empty captioners — DiffBIR inference options outside the TAIR runtime
path). The reference drives the upstream `llava` and `ram` packages; here
the HF transformers port of LLaVA runs on the host, and RAM++ is a native
jax graph (tair_tpu/models/ram.py — Swin-L encoder + tagging decoder) that
runs the tag forward on-device. Only the checkpoints are external: a local
`llava-hf/llava-1.5-7b-hf`-layout directory for LLaVA; the
`ram_plus_swin_large_14m.pth` weights + `ram_tag_list.txt` for RAM (see
models/ram.py RECONSTRUCTION STATUS). The TAIR system itself generates
prompts from its own spotter (pipeline.restore_with_ocr_feedback).
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


class RAMCaptioner(Captioner):
    """Tag-list captioning with RAM++ (reference caption.py:152-171: resize
    to 384, predict tags, join with ', ').

    checkpoint/tag_list_path/threshold_path: external RAM++ files (see
    tair_tpu/models/ram.py). A prebuilt `tagger` may be passed directly
    (tests inject a tiny random one).
    """

    def __init__(
        self,
        checkpoint: str | None = None,
        tag_list_path: str | None = None,
        threshold_path: str | None = None,
        tagger=None,
    ):
        from tair_tpu.models.ram import RAMTagger

        if tagger is None:
            if not checkpoint:
                raise ValueError(
                    "RAMCaptioner needs the ram_plus_swin_large_14m.pth "
                    "checkpoint (+ ram_tag_list.txt); the graph is native, "
                    "only the weights are external — models/ram.py"
                )
            tagger = RAMTagger.from_torch(
                checkpoint, tag_list_path=tag_list_path,
                threshold_path=threshold_path,
            )
        self.tagger = tagger

    def __call__(self, image: np.ndarray) -> str:
        from tair_tpu.models.ram import preprocess

        x = preprocess(
            np.clip(image, 0.0, 1.0), self.tagger.cfg.swin.img_size)
        return ", ".join(self.tagger(x)[0])


def register_captioner(name: str, factory: Callable[..., Captioner]) -> None:
    _REGISTRY[name] = factory


def build_captioner(name: str, **kwargs) -> Captioner:
    if name in ("none", "empty", "", None):
        return EmptyCaptioner()
    if name not in _REGISTRY:
        raise ValueError(
            f"captioner {name!r} not registered; register a factory via "
            "register_captioner"
        )
    return _REGISTRY[name](**kwargs)


register_captioner("empty", EmptyCaptioner)
register_captioner("llava", LLaVACaptioner)
register_captioner("ram", RAMCaptioner)

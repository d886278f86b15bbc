"""LLaVA captioner on a tiny random-init HF model (no external weights).

The production path loads a local llava-hf/llava-1.5-*-hf checkpoint; this
test injects a tiny randomly initialized LlavaForConditionalGeneration +
processor to exercise the full preprocessing -> generate -> decode loop
(reference counterpart: terediff/utils/caption.py:55-171).
"""

import numpy as np
import pytest


def _tiny_llava():
    import torch
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import (
        CLIPImageProcessor,
        CLIPVisionConfig,
        LlamaConfig,
        LlavaConfig,
        LlavaForConditionalGeneration,
        LlavaProcessor,
        PreTrainedTokenizerFast,
    )

    words = [
        "please", "give", "me", "a", "very", "short", "description",
        "of", "this", "image.", "user:", "assistant:",
    ]
    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2, "<image>": 3, "<pad>": 4}
    for w in words:
        vocab.setdefault(w, len(vocab))
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>", pad_token="<pad>",
    )
    fast.add_special_tokens({"additional_special_tokens": ["<image>"]})

    vis = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=16,
    )
    txt = LlamaConfig(
        vocab_size=len(vocab), hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=128,
    )
    cfg = LlavaConfig(
        vision_config=vis, text_config=txt,
        image_token_index=vocab["<image>"],
        vision_feature_select_strategy="default",
        image_seq_length=(32 // 16) ** 2,
    )
    torch.manual_seed(0)
    model = LlavaForConditionalGeneration(cfg)
    proc = LlavaProcessor(
        image_processor=CLIPImageProcessor(
            size={"shortest_edge": 32}, crop_size={"height": 32, "width": 32}
        ),
        tokenizer=fast, patch_size=16,
        vision_feature_select_strategy="default",
        num_additional_image_tokens=1,  # the CLIP CLS token
    )
    return model, proc


def test_llava_captioner_tiny_end_to_end():
    from tair_tpu.utils.caption import LLaVACaptioner, build_captioner

    model, proc = _tiny_llava()
    cap = build_captioner(
        "llava", model=model, processor=proc, max_new_tokens=6
    )
    assert isinstance(cap, LLaVACaptioner)
    image = np.random.RandomState(0).rand(40, 40, 3).astype(np.float32)
    text = cap(image)
    # tiny random weights caption gibberish from the vocab; the contract is
    # a string with no special tokens and bounded length
    assert isinstance(text, str)
    assert "<image>" not in text and "<s>" not in text
    assert len(text.split()) <= 6
    # deterministic (greedy) decoding
    assert cap(image) == text


def test_llava_captioner_requires_checkpoint():
    from tair_tpu.utils.caption import build_captioner

    with pytest.raises(ValueError):
        build_captioner("llava")


def test_ram_captioner_tiny_end_to_end():
    import jax
    import jax.numpy as jnp

    from tair_tpu.models.ram import RAMConfig, RAMPlus, RAMTagger, SwinConfig
    from tair_tpu.utils.caption import RAMCaptioner, build_captioner

    cfg = RAMConfig(
        swin=SwinConfig(img_size=16, patch_size=4, embed_dim=8,
                        depths=(1, 1), num_heads=(2, 2), window=2,
                        mlp_ratio=2.0),
        num_class=5, des_per_class=2, embed_width=8, hidden=8, heads=2,
        intermediate=16, layers=1, threshold=0.5,
    )
    params = RAMPlus(cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    tagger = RAMTagger(params, cfg,
                       tag_list=["cat", "dog", "sign", "text", "car"],
                       thresholds=0.0)
    cap = build_captioner("ram", tagger=tagger)
    assert isinstance(cap, RAMCaptioner)
    image = np.random.RandomState(0).rand(24, 30, 3).astype(np.float32)
    text = cap(image)
    # threshold 0 fires every tag, joined reference-style with ', '
    assert text == "cat, dog, sign, text, car"
    assert cap(image) == text


def test_ram_captioner_requires_checkpoint():
    from tair_tpu.utils.caption import build_captioner

    with pytest.raises(ValueError):
        build_captioner("ram")

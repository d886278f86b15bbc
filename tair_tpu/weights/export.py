"""Inverse of convert.convert_unet for round-trip testing: flax UNet params
-> torch-style state dict (the SD naming). Exercises every branch of the
mapping so convert(export(params)) == params validates the full table."""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np

from .convert import t_conv_inv


def _get(tree, path: str):
    node = tree
    for p in path.split("/"):
        node = node[p]
    return np.asarray(node)


def _has(tree, path: str) -> bool:
    node = tree
    for p in path.split("/"):
        if p not in node:
            return False
        node = node[p]
    return True


def _put_conv(sd, src, tree, dst):
    sd[f"{src}.weight"] = t_conv_inv(_get(tree, f"{dst}/kernel"))
    sd[f"{src}.bias"] = _get(tree, f"{dst}/bias")


def _put_lin(sd, src, tree, dst, bias=True):
    sd[f"{src}.weight"] = _get(tree, f"{dst}/kernel").T
    if bias:
        sd[f"{src}.bias"] = _get(tree, f"{dst}/bias")


def _put_norm(sd, src, tree, dst):
    sd[f"{src}.weight"] = _get(tree, f"{dst}/scale")
    sd[f"{src}.bias"] = _get(tree, f"{dst}/bias")


def _put_gn32(sd, src, tree, dst):
    _put_norm(sd, src, tree, f"{dst}/GroupNorm_0")


def _put_resblock(sd, src, tree, dst):
    _put_gn32(sd, f"{src}.in_layers.0", tree, f"{dst}/in_norm")
    _put_conv(sd, f"{src}.in_layers.2", tree, f"{dst}/in_conv")
    _put_lin(sd, f"{src}.emb_layers.1", tree, f"{dst}/emb_proj")
    _put_gn32(sd, f"{src}.out_layers.0", tree, f"{dst}/out_norm")
    _put_conv(sd, f"{src}.out_layers.3", tree, f"{dst}/out_conv")
    if _has(tree, f"{dst}/skip"):
        _put_conv(sd, f"{src}.skip_connection", tree, f"{dst}/skip")


def _put_st(sd, src, tree, dst, depth=1):
    _put_gn32(sd, f"{src}.norm", tree, f"{dst}/norm")
    _put_lin(sd, f"{src}.proj_in", tree, f"{dst}/proj_in")
    for d in range(depth):
        bs, bd = f"{src}.transformer_blocks.{d}", f"{dst}/block_{d}"
        for attn in ("attn1", "attn2"):
            for n in ("to_q", "to_k", "to_v"):
                _put_lin(sd, f"{bs}.{attn}.{n}", tree, f"{bd}/{attn}/{n}", bias=False)
            _put_lin(sd, f"{bs}.{attn}.to_out.0", tree, f"{bd}/{attn}/to_out")
        for i in (1, 2, 3):
            _put_norm(sd, f"{bs}.norm{i}", tree, f"{bd}/norm{i}")
        _put_lin(sd, f"{bs}.ff.net.0.proj", tree, f"{bd}/ff/geglu/proj")
        _put_lin(sd, f"{bs}.ff.net.2", tree, f"{bd}/ff/out")
    _put_lin(sd, f"{src}.proj_out", tree, f"{dst}/proj_out")


def export_unet(params: Dict[str, Any], cfg, prefix: str = "") -> Dict[str, np.ndarray]:
    from ..models.unet import _decoder_plan, _encoder_plan

    tree = jax.device_get(params)
    sd: Dict[str, np.ndarray] = {}
    _put_lin(sd, "time_embed.0", tree, "time_embed/fc1")
    _put_lin(sd, "time_embed.2", tree, "time_embed/fc2")
    _put_conv(sd, "input_blocks.0.0", tree, "in_conv")
    for i, (kind, _ch, attn) in enumerate(_encoder_plan(cfg)):
        if kind == "conv":
            continue
        if kind == "down":
            _put_conv(sd, f"input_blocks.{i}.0.op", tree, f"in_{i}/conv")
        else:
            _put_resblock(sd, f"input_blocks.{i}.0", tree, f"in_{i}/res")
            if attn:
                _put_st(sd, f"input_blocks.{i}.1", tree, f"in_{i}/attn",
                        cfg.transformer_depth)
    _put_resblock(sd, "middle_block.0", tree, "middle/res1")
    _put_st(sd, "middle_block.1", tree, "middle/attn", cfg.transformer_depth)
    _put_resblock(sd, "middle_block.2", tree, "middle/res2")
    for i, (_ch, attn, upsample) in enumerate(_decoder_plan(cfg)):
        _put_resblock(sd, f"output_blocks.{i}.0", tree, f"out_{i}/res")
        layer = 1
        if attn:
            _put_st(sd, f"output_blocks.{i}.{layer}", tree, f"out_{i}/attn",
                    cfg.transformer_depth)
            layer += 1
        if upsample:
            _put_conv(sd, f"output_blocks.{i}.{layer}.conv", tree, f"out_{i}/up/conv")
    _put_gn32(sd, "out.0", tree, "out_norm")
    _put_conv(sd, "out.2", tree, "out_conv")
    return {prefix + k: v for k, v in sd.items()}

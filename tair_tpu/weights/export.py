"""Inverses of the convert.convert_* mapping tables for round-trip testing:
flax params -> torch-style state dicts (the reference checkpoint namings).
Each export exercises every branch of its mapping so
convert(export(params)) == params validates the full table against the
actual model parameter tree."""

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


def _put_mha(sd, src, tree, dst):
    """Inverse of convert._mha (flax MultiHeadDotProductAttention ->
    torch nn.MultiheadAttention in_proj/out_proj)."""
    ws, bs = [], []
    for name in ("query", "key", "value"):
        kw = _get(tree, f"{dst}/{name}/kernel")   # [C, heads, hd]
        c = kw.shape[0]
        ws.append(kw.reshape(c, c).T)             # torch [out, in]
        bs.append(_get(tree, f"{dst}/{name}/bias").reshape(c))
    sd[f"{src}.in_proj_weight"] = np.concatenate(ws, 0)
    sd[f"{src}.in_proj_bias"] = np.concatenate(bs, 0)
    ow = _get(tree, f"{dst}/out/kernel")          # [heads, hd, C]
    c = ow.shape[-1]
    sd[f"{src}.out_proj.weight"] = ow.reshape(c, c).T
    sd[f"{src}.out_proj.bias"] = _get(tree, f"{dst}/out/bias")


# --------------------------------------------------------------------------
# VAE
# --------------------------------------------------------------------------

def _put_vae_resblock(sd, src, tree, dst):
    _put_gn32(sd, f"{src}.norm1", tree, f"{dst}/norm1")
    _put_conv(sd, f"{src}.conv1", tree, f"{dst}/conv1")
    _put_gn32(sd, f"{src}.norm2", tree, f"{dst}/norm2")
    _put_conv(sd, f"{src}.conv2", tree, f"{dst}/conv2")
    if _has(tree, f"{dst}/nin_shortcut"):
        _put_conv(sd, f"{src}.nin_shortcut", tree, f"{dst}/nin_shortcut")


def _put_vae_attn(sd, src, tree, dst):
    _put_gn32(sd, f"{src}.norm", tree, f"{dst}/norm")
    for n in ("q", "k", "v", "proj_out"):
        _put_conv(sd, f"{src}.{n}", tree, f"{dst}/{n}")


def export_vae(params, cfg, prefix: str = ""):
    """Inverse of convert.convert_vae (SD first_stage_model naming)."""
    tree = jax.device_get(params)
    sd = {}
    enc, dec = "encoder", "decoder"
    _put_conv(sd, "encoder.conv_in", tree, f"{enc}/conv_in")
    for lvl in range(len(cfg.ch_mult)):
        for i in range(cfg.num_res_blocks):
            _put_vae_resblock(sd, f"encoder.down.{lvl}.block.{i}", tree,
                              f"{enc}/down_{lvl}_block_{i}")
        if lvl != len(cfg.ch_mult) - 1:
            _put_conv(sd, f"encoder.down.{lvl}.downsample.conv", tree,
                      f"{enc}/down_{lvl}_downsample")
    _put_vae_resblock(sd, "encoder.mid.block_1", tree, f"{enc}/mid_block_1")
    _put_vae_attn(sd, "encoder.mid.attn_1", tree, f"{enc}/mid_attn")
    _put_vae_resblock(sd, "encoder.mid.block_2", tree, f"{enc}/mid_block_2")
    _put_gn32(sd, "encoder.norm_out", tree, f"{enc}/norm_out")
    _put_conv(sd, "encoder.conv_out", tree, f"{enc}/conv_out")

    _put_conv(sd, "decoder.conv_in", tree, f"{dec}/conv_in")
    _put_vae_resblock(sd, "decoder.mid.block_1", tree, f"{dec}/mid_block_1")
    _put_vae_attn(sd, "decoder.mid.attn_1", tree, f"{dec}/mid_attn")
    _put_vae_resblock(sd, "decoder.mid.block_2", tree, f"{dec}/mid_block_2")
    for lvl in range(len(cfg.ch_mult)):
        for i in range(cfg.num_res_blocks + 1):
            _put_vae_resblock(sd, f"decoder.up.{lvl}.block.{i}", tree,
                              f"{dec}/up_{lvl}_block_{i}")
        if lvl != 0:
            _put_conv(sd, f"decoder.up.{lvl}.upsample.conv", tree,
                      f"{dec}/up_{lvl}_upsample")
    _put_gn32(sd, "decoder.norm_out", tree, f"{dec}/norm_out")
    _put_conv(sd, "decoder.conv_out", tree, f"{dec}/conv_out")

    _put_conv(sd, "quant_conv", tree, "quant_conv")
    _put_conv(sd, "post_quant_conv", tree, "post_quant_conv")
    return {prefix + k: v for k, v in sd.items()}


# --------------------------------------------------------------------------
# CLIP text tower
# --------------------------------------------------------------------------

def export_clip(params, cfg, prefix: str = ""):
    """Inverse of convert.convert_clip (open_clip text-branch naming)."""
    tree = jax.device_get(params)
    sd = {}
    sd["token_embedding.weight"] = _get(tree, "token_embedding/embedding")
    sd["positional_embedding"] = _get(tree, "positional_embedding")
    n_blocks = cfg.layers - (1 if cfg.layer == "penultimate" else 0)
    for i in range(n_blocks):
        src = f"transformer.resblocks.{i}"
        dst = f"block_{i}"
        _put_norm(sd, f"{src}.ln_1", tree, f"{dst}/ln_1")
        _put_norm(sd, f"{src}.ln_2", tree, f"{dst}/ln_2")
        _put_mha(sd, f"{src}.attn", tree, f"{dst}/attn")
        _put_lin(sd, f"{src}.mlp.c_fc", tree, f"{dst}/mlp_fc")
        _put_lin(sd, f"{src}.mlp.c_proj", tree, f"{dst}/mlp_proj")
    _put_norm(sd, "ln_final", tree, "ln_final")
    return {prefix + k: v for k, v in sd.items()}


# --------------------------------------------------------------------------
# SwinIR
# --------------------------------------------------------------------------

def export_swinir(params, cfg, prefix: str = ""):
    """Inverse of convert.convert_swinir (realesrgan SwinIR naming)."""
    tree = jax.device_get(params)
    sd = {}
    _put_conv(sd, "conv_first.1" if cfg.unshuffle else "conv_first", tree,
              "conv_first")
    _put_norm(sd, "patch_embed.norm", tree, "patch_norm")
    for li, depth in enumerate(cfg.depths):
        for bi in range(depth):
            src = f"layers.{li}.residual_group.blocks.{bi}"
            dst = f"layer_{li}/block_{bi}"
            _put_norm(sd, f"{src}.norm1", tree, f"{dst}/norm1")
            _put_norm(sd, f"{src}.norm2", tree, f"{dst}/norm2")
            _put_lin(sd, f"{src}.attn.qkv", tree, f"{dst}/attn/qkv")
            _put_lin(sd, f"{src}.attn.proj", tree, f"{dst}/attn/proj")
            sd[f"{src}.attn.relative_position_bias_table"] = _get(
                tree, f"{dst}/attn/rel_pos_bias_table"
            )
            _put_lin(sd, f"{src}.mlp.fc1", tree, f"{dst}/mlp_fc1")
            _put_lin(sd, f"{src}.mlp.fc2", tree, f"{dst}/mlp_fc2")
        _put_conv(sd, f"layers.{li}.conv", tree, f"layer_{li}/conv")
    _put_norm(sd, "norm", tree, "norm")
    _put_conv(sd, "conv_after_body", tree, "conv_after_body")
    _put_conv(sd, "conv_before_upsample.0", tree, "conv_before_upsample")
    ups = {2: ("conv_up1",), 4: ("conv_up1", "conv_up2"),
           8: ("conv_up1", "conv_up2", "conv_up3")}[cfg.sf]
    for name in ups:
        _put_conv(sd, name, tree, name)
    _put_conv(sd, "conv_hr", tree, "conv_hr")
    _put_conv(sd, "conv_last", tree, "conv_last")
    return {prefix + k: v for k, v in sd.items()}


# --------------------------------------------------------------------------
# TESTR
# --------------------------------------------------------------------------

def export_testr(params, cfg, prefix: str = "testr."):
    """Inverse of convert.convert_testr (adet TransformerDetector naming)."""
    tree = jax.device_get(params)
    sd = {}
    for i in range(len(cfg.in_channels)):
        src = f"diff_feat_proj.{i}"
        dst = f"diff_feat_proj_{i}"
        _put_conv(sd, f"{src}.0", tree, f"{dst}/conv1")
        _put_norm(sd, f"{src}.1", tree, f"{dst}/gn1")
        _put_conv(sd, f"{src}.3", tree, f"{dst}/conv2")
        _put_norm(sd, f"{src}.4", tree, f"{dst}/gn2")

    sd["ctrl_point_embed.weight"] = _get(tree, "ctrl_point_embed")
    sd["text_embed.weight"] = _get(tree, "text_embed")
    _put_lin(sd, "ctrl_point_class.0", tree, "ctrl_point_class")
    for i in range(3):
        _put_lin(sd, f"ctrl_point_coord.0.layers.{i}", tree,
                 f"ctrl_point_coord/fc{i}")
    _put_lin(sd, "text_class", tree, "text_class")

    t = "transformer/"
    sd["transformer.level_embed"] = _get(tree, t + "level_embed")
    _put_lin(sd, "transformer.enc_output", tree, t + "enc_output")
    _put_norm(sd, "transformer.enc_output_norm", tree, t + "enc_output_norm")
    _put_lin(sd, "transformer.pos_trans", tree, t + "pos_trans")
    _put_norm(sd, "transformer.pos_trans_norm", tree, t + "pos_trans_norm")
    _put_lin(sd, "bbox_class", tree, t + "bbox_class_embed")
    for i in range(3):
        _put_lin(sd, f"bbox_coord.layers.{i}", tree, t + f"bbox_embed/fc{i}")

    def put_msda(src, dst):
        for n in ("sampling_offsets", "attention_weights", "value_proj",
                  "output_proj"):
            _put_lin(sd, f"{src}.{n}", tree, f"{dst}/{n}")

    for i in range(cfg.num_encoder_layers):
        src = f"transformer.encoder.layers.{i}"
        dst = t + f"enc_{i}"
        put_msda(f"{src}.self_attn", f"{dst}/self_attn")
        _put_norm(sd, f"{src}.norm1", tree, f"{dst}/norm1")
        _put_norm(sd, f"{src}.norm2", tree, f"{dst}/norm2")
        _put_lin(sd, f"{src}.linear1", tree, f"{dst}/linear1")
        _put_lin(sd, f"{src}.linear2", tree, f"{dst}/linear2")

    for i in range(cfg.num_decoder_layers):
        src = f"transformer.decoder.layers.{i}"
        dst = t + f"dec_{i}"
        put_msda(f"{src}.attn_cross", f"{dst}/attn_cross")
        put_msda(f"{src}.attn_cross_text", f"{dst}/attn_cross_text")
        for n in ("attn_intra", "attn_inter", "attn_intra_text",
                  "attn_inter_text"):
            _put_mha(sd, f"{src}.{n}", tree, f"{dst}/{n}")
        for n in ("norm_intra", "norm_inter", "norm_cross", "norm3",
                  "norm_intra_text", "norm_inter_text", "norm_cross_text",
                  "norm3_text"):
            _put_norm(sd, f"{src}.{n}", tree, f"{dst}/{n}")
        for n in ("linear1", "linear2", "linear1_text", "linear2_text"):
            _put_lin(sd, f"{src}.{n}", tree, f"{dst}/{n}")
    return {prefix + k: v for k, v in sd.items()}

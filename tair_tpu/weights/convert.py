"""Torch-checkpoint -> TAIR-TPU parameter conversion.

Replicates the reference's checkpoint surgery in a functional form:
  - SD2.1 bundle split by module prefix (model.diffusion_model / first_stage_model
    / cond_stage_model): /root/reference/terediff/model/cldm.py:33-62
  - ControlNet from DiffBIR ckpt, or initialized from UNet weights with
    zero-padded extra hint channels: cldm.py:64-90
  - SwinIR with `module.` prefix strip: /root/reference/initialize.py:110-118
  - TESTR detectron2 ckpt["model"], non-strict: initialize.py:143-149

Tensor layout transforms: torch conv [O,I,kh,kw] -> flax [kh,kw,I,O]; linear
[O,I] -> [I,O]; norm weight/bias -> scale/bias; packed MultiheadAttention
in_proj -> flax MHDPA per-head kernels.

Each converter is a pure function: (torch-style dict of numpy arrays, config)
-> flax params subtree. `export_*` inverses exist for round-trip testing.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

Params = Dict[str, Any]
TorchDict = Dict[str, np.ndarray]


# --------------------------------------------------------------------------
# primitive transforms
# --------------------------------------------------------------------------

def t_conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def t_conv_inv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (3, 2, 0, 1))


def t_lin(w: np.ndarray) -> np.ndarray:
    return np.transpose(w)


def _set(tree: Params, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = np.asarray(value)


class Reader:
    """Tracks which torch keys were consumed (for strictness reporting)."""

    def __init__(self, sd: TorchDict, prefix: str = ""):
        self.sd = sd
        self.prefix = prefix
        self.used: set = set()
        self.missing: set = set()

    def __call__(self, key: str) -> np.ndarray:
        full = self.prefix + key
        if full not in self.sd:
            self.missing.add(full)
            raise KeyError(full)
        self.used.add(full)
        return np.asarray(self.sd[full])

    def has(self, key: str) -> bool:
        return self.prefix + key in self.sd

    def unused(self) -> set:
        return {k for k in self.sd if k.startswith(self.prefix)} - self.used


# --------------------------------------------------------------------------
# shared blocks
# --------------------------------------------------------------------------

def _conv(out: Params, dst: str, r: Reader, src: str) -> None:
    _set(out, f"{dst}/kernel", t_conv(r(f"{src}.weight")))
    _set(out, f"{dst}/bias", r(f"{src}.bias"))


def _lin(out: Params, dst: str, r: Reader, src: str, bias: bool = True) -> None:
    _set(out, f"{dst}/kernel", t_lin(r(f"{src}.weight")))
    if bias:
        _set(out, f"{dst}/bias", r(f"{src}.bias"))


def _norm(out: Params, dst: str, r: Reader, src: str) -> None:
    _set(out, f"{dst}/scale", r(f"{src}.weight"))
    _set(out, f"{dst}/bias", r(f"{src}.bias"))


def _gn32(out: Params, dst: str, r: Reader, src: str) -> None:
    # GroupNorm32 wraps flax GroupNorm as a submodule named GroupNorm_0
    _norm(out, f"{dst}/GroupNorm_0", r, src)


def _mha(out: Params, dst: str, r: Reader, src: str, heads: int) -> None:
    """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention."""
    w = r(f"{src}.in_proj_weight")  # [3C, C]
    b = r(f"{src}.in_proj_bias")
    c = w.shape[1]
    hd = c // heads
    for i, name in enumerate(("query", "key", "value")):
        kw = t_lin(w[i * c : (i + 1) * c])  # [C, C] (in, out)
        _set(out, f"{dst}/{name}/kernel", kw.reshape(c, heads, hd))
        _set(out, f"{dst}/{name}/bias", b[i * c : (i + 1) * c].reshape(heads, hd))
    ow = r(f"{src}.out_proj.weight")  # [C, C] (out, in)
    _set(out, f"{dst}/out/kernel", t_lin(ow).reshape(heads, hd, c))
    _set(out, f"{dst}/out/bias", r(f"{src}.out_proj.bias"))


def _resblock(out: Params, dst: str, r: Reader, src: str) -> None:
    _gn32(out, f"{dst}/in_norm", r, f"{src}.in_layers.0")
    _conv(out, f"{dst}/in_conv", r, f"{src}.in_layers.2")
    _lin(out, f"{dst}/emb_proj", r, f"{src}.emb_layers.1")
    _gn32(out, f"{dst}/out_norm", r, f"{src}.out_layers.0")
    _conv(out, f"{dst}/out_conv", r, f"{src}.out_layers.3")
    if r.has(f"{src}.skip_connection.weight"):
        _conv(out, f"{dst}/skip", r, f"{src}.skip_connection")


def _spatial_transformer(out: Params, dst: str, r: Reader, src: str, depth: int = 1):
    _gn32(out, f"{dst}/norm", r, f"{src}.norm")
    _lin(out, f"{dst}/proj_in", r, f"{src}.proj_in")
    for d in range(depth):
        blk_src = f"{src}.transformer_blocks.{d}"
        blk = f"{dst}/block_{d}"
        for attn in ("attn1", "attn2"):
            _lin(out, f"{blk}/{attn}/to_q", r, f"{blk_src}.{attn}.to_q", bias=False)
            _lin(out, f"{blk}/{attn}/to_k", r, f"{blk_src}.{attn}.to_k", bias=False)
            _lin(out, f"{blk}/{attn}/to_v", r, f"{blk_src}.{attn}.to_v", bias=False)
            _lin(out, f"{blk}/{attn}/to_out", r, f"{blk_src}.{attn}.to_out.0")
        for i in (1, 2, 3):
            _norm(out, f"{blk}/norm{i}", r, f"{blk_src}.norm{i}")
        _lin(out, f"{blk}/ff/geglu/proj", r, f"{blk_src}.ff.net.0.proj")
        _lin(out, f"{blk}/ff/out", r, f"{blk_src}.ff.net.2")
    _lin(out, f"{dst}/proj_out", r, f"{src}.proj_out")


# --------------------------------------------------------------------------
# UNet / ControlNet
# --------------------------------------------------------------------------

def _unet_encoder_entries(cfg) -> list:
    """(torch input_blocks index, kind, attn) mirroring unet.py _encoder_plan."""
    from ..models.unet import _encoder_plan

    return list(enumerate(_encoder_plan(cfg)))


def convert_unet(sd: TorchDict, cfg, prefix: str = "") -> Tuple[Params, Reader]:
    r = Reader(sd, prefix)
    out: Params = {}
    _lin(out, "time_embed/fc1", r, "time_embed.0")
    _lin(out, "time_embed/fc2", r, "time_embed.2")
    _conv(out, "in_conv", r, "input_blocks.0.0")

    for i, (kind, _ch, attn) in _unet_encoder_entries(cfg):
        if kind == "conv":
            continue
        src = f"input_blocks.{i}"
        if kind == "down":
            _conv(out, f"in_{i}/conv", r, f"{src}.0.op")
        else:
            _resblock(out, f"in_{i}/res", r, f"{src}.0")
            if attn:
                _spatial_transformer(
                    out, f"in_{i}/attn", r, f"{src}.1", cfg.transformer_depth
                )

    _resblock(out, "middle/res1", r, "middle_block.0")
    _spatial_transformer(out, "middle/attn", r, "middle_block.1", cfg.transformer_depth)
    _resblock(out, "middle/res2", r, "middle_block.2")

    from ..models.unet import _decoder_plan

    for i, (_ch, attn, upsample) in enumerate(_decoder_plan(cfg)):
        src = f"output_blocks.{i}"
        _resblock(out, f"out_{i}/res", r, f"{src}.0")
        layer = 1
        if attn:
            _spatial_transformer(
                out, f"out_{i}/attn", r, f"{src}.{layer}", cfg.transformer_depth
            )
            layer += 1
        if upsample:
            _conv(out, f"out_{i}/up/conv", r, f"{src}.{layer}.conv")

    _gn32(out, "out_norm", r, "out.0")
    _conv(out, "out_conv", r, "out.2")
    return out, r


def convert_controlnet(sd: TorchDict, cfg, prefix: str = "") -> Tuple[Params, Reader]:
    r = Reader(sd, prefix)
    out: Params = {}
    _lin(out, "time_embed/fc1", r, "time_embed.0")
    _lin(out, "time_embed/fc2", r, "time_embed.2")
    _conv(out, "in_conv", r, "input_blocks.0.0")

    for i, (kind, _ch, attn) in _unet_encoder_entries(cfg):
        if kind == "conv":
            pass
        elif kind == "down":
            _conv(out, f"in_{i}/conv", r, f"input_blocks.{i}.0.op")
        else:
            _resblock(out, f"in_{i}/res", r, f"input_blocks.{i}.0")
            if attn:
                _spatial_transformer(
                    out, f"in_{i}/attn", r, f"input_blocks.{i}.1",
                    cfg.transformer_depth,
                )
        _conv(out, f"zero_{i}", r, f"zero_convs.{i}.0")

    _resblock(out, "middle/res1", r, "middle_block.0")
    _spatial_transformer(out, "middle/attn", r, "middle_block.1", cfg.transformer_depth)
    _resblock(out, "middle/res2", r, "middle_block.2")
    _conv(out, "middle_out", r, "middle_block_out.0")
    return out, r


def controlnet_from_unet(unet_params: Params, controlnet_params: Params) -> Params:
    """Init ControlNet by copying UNet weights; the input conv's extra hint
    channels are zero-padded (cldm.py:68-90). Zero convs stay zero-init."""
    import jax

    out = jax.tree.map(lambda x: x, controlnet_params)  # copy structure

    def walk(src, dst):
        for k, v in src.items():
            if k not in dst:
                continue
            if isinstance(v, dict):
                walk(v, dst[k])
            else:
                s = np.asarray(v)
                d = np.asarray(dst[k])
                if s.shape == d.shape:
                    dst[k] = s
                elif s.ndim == 4 and d.ndim == 4 and s.shape[:2] == d.shape[:2]:
                    pad_in = d.shape[2] - s.shape[2]
                    dst[k] = np.concatenate(
                        [s, np.zeros(s.shape[:2] + (pad_in, s.shape[3]), s.dtype)],
                        axis=2,
                    )

    walk(unet_params, out)
    return out


# --------------------------------------------------------------------------
# VAE
# --------------------------------------------------------------------------

def _vae_resblock(out, dst, r, src):
    _gn32(out, f"{dst}/norm1", r, f"{src}.norm1")
    _conv(out, f"{dst}/conv1", r, f"{src}.conv1")
    _gn32(out, f"{dst}/norm2", r, f"{src}.norm2")
    _conv(out, f"{dst}/conv2", r, f"{src}.conv2")
    if r.has(f"{src}.nin_shortcut.weight"):
        _conv(out, f"{dst}/nin_shortcut", r, f"{src}.nin_shortcut")


def _vae_attn(out, dst, r, src):
    _gn32(out, f"{dst}/norm", r, f"{src}.norm")
    for n in ("q", "k", "v", "proj_out"):
        _conv(out, f"{dst}/{n}", r, f"{src}.{n}")


def convert_vae(sd: TorchDict, cfg, prefix: str = "") -> Tuple[Params, Reader]:
    r = Reader(sd, prefix)
    out: Params = {"encoder": {}, "decoder": {}}
    enc, dec = out["encoder"], out["decoder"]

    _conv(enc, "conv_in", r, "encoder.conv_in")
    for lvl in range(len(cfg.ch_mult)):
        for i in range(cfg.num_res_blocks):
            _vae_resblock(enc, f"down_{lvl}_block_{i}", r,
                          f"encoder.down.{lvl}.block.{i}")
        if lvl != len(cfg.ch_mult) - 1:
            _conv(enc, f"down_{lvl}_downsample", r,
                  f"encoder.down.{lvl}.downsample.conv")
    _vae_resblock(enc, "mid_block_1", r, "encoder.mid.block_1")
    _vae_attn(enc, "mid_attn", r, "encoder.mid.attn_1")
    _vae_resblock(enc, "mid_block_2", r, "encoder.mid.block_2")
    _gn32(enc, "norm_out", r, "encoder.norm_out")
    _conv(enc, "conv_out", r, "encoder.conv_out")

    _conv(dec, "conv_in", r, "decoder.conv_in")
    _vae_resblock(dec, "mid_block_1", r, "decoder.mid.block_1")
    _vae_attn(dec, "mid_attn", r, "decoder.mid.attn_1")
    _vae_resblock(dec, "mid_block_2", r, "decoder.mid.block_2")
    for lvl in range(len(cfg.ch_mult)):
        for i in range(cfg.num_res_blocks + 1):
            _vae_resblock(dec, f"up_{lvl}_block_{i}", r,
                          f"decoder.up.{lvl}.block.{i}")
        if lvl != 0:
            _conv(dec, f"up_{lvl}_upsample", r, f"decoder.up.{lvl}.upsample.conv")
    _gn32(dec, "norm_out", r, "decoder.norm_out")
    _conv(dec, "conv_out", r, "decoder.conv_out")

    _conv(out, "quant_conv", r, "quant_conv")
    _conv(out, "post_quant_conv", r, "post_quant_conv")
    return out, r


# --------------------------------------------------------------------------
# CLIP text tower
# --------------------------------------------------------------------------

def convert_clip(sd: TorchDict, cfg, prefix: str = "") -> Tuple[Params, Reader]:
    """open_clip CLIP text branch (model.* keys: token_embedding,
    positional_embedding, transformer.resblocks.N, ln_final)."""
    r = Reader(sd, prefix)
    out: Params = {}
    _set(out, "token_embedding/embedding", r("token_embedding.weight"))
    _set(out, "positional_embedding", r("positional_embedding"))
    n_blocks = cfg.layers - (1 if cfg.layer == "penultimate" else 0)
    for i in range(n_blocks):
        src = f"transformer.resblocks.{i}"
        dst = f"block_{i}"
        _norm(out, f"{dst}/ln_1", r, f"{src}.ln_1")
        _norm(out, f"{dst}/ln_2", r, f"{src}.ln_2")
        _mha(out, f"{dst}/attn", r, f"{src}.attn", cfg.heads)
        _lin(out, f"{dst}/mlp_fc", r, f"{src}.mlp.c_fc")
        _lin(out, f"{dst}/mlp_proj", r, f"{src}.mlp.c_proj")
    _norm(out, "ln_final", r, "ln_final")
    return out, r


def _bn(out: Params, dst: str, r: Reader, src: str) -> None:
    """torch BatchNorm2d (inference) -> utils/clipiqa.BNInfer."""
    _set(out, f"{dst}/scale", r(f"{src}.weight"))
    _set(out, f"{dst}/bias", r(f"{src}.bias"))
    _set(out, f"{dst}/mean", r(f"{src}.running_mean"))
    _set(out, f"{dst}/var", r(f"{src}.running_var"))


def convert_clip_rn50_visual(sd: TorchDict, cfg) -> Params:
    """OpenAI CLIP ModifiedResNet image tower (`visual.*` keys of a CLIP
    RN50 state dict) -> utils/clipiqa.ModifiedResNet params."""
    r = Reader(sd, "visual.")
    out: Params = {}
    for i in (1, 2, 3):
        _set(out, f"conv{i}/kernel", t_conv(r(f"conv{i}.weight")))
        _bn(out, f"bn{i}", r, f"bn{i}")
    for stage, n_blocks in enumerate(cfg.layers):
        for blk in range(n_blocks):
            src = f"layer{stage + 1}.{blk}"
            dst = f"layer{stage + 1}_{blk}"
            for i in (1, 2, 3):
                _set(out, f"{dst}/conv{i}/kernel", t_conv(r(f"{src}.conv{i}.weight")))
                _bn(out, f"{dst}/bn{i}", r, f"{src}.bn{i}")
            if r.has(f"{src}.downsample.0.weight"):
                _set(out, f"{dst}/down_conv/kernel",
                     t_conv(r(f"{src}.downsample.0.weight")))
                _bn(out, f"{dst}/down_bn", r, f"{src}.downsample.1")
    ap = "attnpool"
    _set(out, f"{ap}/positional_embedding", r(f"{ap}.positional_embedding"))
    for p in ("q_proj", "k_proj", "v_proj", "c_proj"):
        _lin(out, f"{ap}/{p}", r, f"{ap}.{p}")
    return out


def convert_retinaface(sd: TorchDict) -> Params:
    """facexlib/biubug6 RetinaFace-ResNet50 (`detection_Resnet50_Final.pth`,
    `module.` prefix already stripped) -> utils/retinaface.RetinaFace params.
    torch Sequential(conv, bn, leaky) packs as `<name>.0` / `<name>.1`."""
    r = Reader(sd, "")
    out: Params = {}

    def conv_bn(dst, src):
        _set(out, f"{dst}/conv/kernel", t_conv(r(f"{src}.0.weight")))
        _bn(out, f"{dst}/bn", r, f"{src}.1")

    # torchvision resnet50 body
    _set(out, "body/conv1/kernel", t_conv(r("body.conv1.weight")))
    _bn(out, "body/bn1", r, "body.bn1")
    for stage, n_blocks in enumerate((3, 4, 6, 3)):
        for blk in range(n_blocks):
            src = f"body.layer{stage + 1}.{blk}"
            dst = f"body/layer{stage + 1}_{blk}"
            for i in (1, 2, 3):
                _set(out, f"{dst}/conv{i}/kernel", t_conv(r(f"{src}.conv{i}.weight")))
                _bn(out, f"{dst}/bn{i}", r, f"{src}.bn{i}")
            if r.has(f"{src}.downsample.0.weight"):
                _set(out, f"{dst}/down_conv/kernel",
                     t_conv(r(f"{src}.downsample.0.weight")))
                _bn(out, f"{dst}/down_bn", r, f"{src}.downsample.1")

    for i in (1, 2, 3):
        conv_bn(f"fpn_output{i}", f"fpn.output{i}")
    conv_bn("fpn_merge1", "fpn.merge1")
    conv_bn("fpn_merge2", "fpn.merge2")
    for i in (1, 2, 3):
        conv_bn(f"ssh{i}/conv3x3", f"ssh{i}.conv3X3")
        conv_bn(f"ssh{i}/conv5x5_1", f"ssh{i}.conv5X5_1")
        conv_bn(f"ssh{i}/conv5x5_2", f"ssh{i}.conv5X5_2")
        conv_bn(f"ssh{i}/conv7x7_2", f"ssh{i}.conv7X7_2")
        conv_bn(f"ssh{i}/conv7x7_3", f"ssh{i}.conv7x7_3")
    for i in range(3):
        for torch_head, dst in (("ClassHead", "class_head"),
                                ("BboxHead", "bbox_head"),
                                ("LandmarkHead", "ldm_head")):
            src = f"{torch_head}.{i}.conv1x1"
            _set(out, f"{dst}{i}/kernel", t_conv(r(f"{src}.weight")))
            _set(out, f"{dst}{i}/bias", r(f"{src}.bias"))
    return out


def convert_maniqa(sd: TorchDict, cfg) -> Params:
    """IIGROUP/MANIQA checkpoint (timm ViT-B/8 backbone + TAB/swin stages)
    -> utils/maniqa.MANIQA params. Key layout reconstructed from the
    official repo (see utils/maniqa.py docstring on validation status)."""
    r = Reader(sd, "")
    out: Params = {}

    _set(out, "vit/patch_embed/kernel", t_conv(r("vit.patch_embed.proj.weight")))
    _set(out, "vit/patch_embed/bias", r("vit.patch_embed.proj.bias"))
    _set(out, "vit/cls_token", r("vit.cls_token").reshape(1, 1, -1))
    _set(out, "vit/pos_embed", r("vit.pos_embed"))
    for i in range(cfg.vit.depth):
        src = f"vit.blocks.{i}"
        dst = f"vit/block_{i}"
        _norm(out, f"{dst}/norm1", r, f"{src}.norm1")
        _lin(out, f"{dst}/qkv", r, f"{src}.attn.qkv")
        _lin(out, f"{dst}/proj", r, f"{src}.attn.proj")
        _norm(out, f"{dst}/norm2", r, f"{src}.norm2")
        _lin(out, f"{dst}/fc1", r, f"{src}.mlp.fc1")
        _lin(out, f"{dst}/fc2", r, f"{src}.mlp.fc2")

    def tab(dst_prefix, src_prefix):
        for i in range(cfg.num_tab):
            for p in ("c_q", "c_k", "c_v"):
                _lin(out, f"{dst_prefix}_{i}/{p}", r, f"{src_prefix}.{i}.{p}")

    def swin(dst_prefix, src_prefix):
        for i in range(len(cfg.depths)):
            for j in range(cfg.depths[i]):
                src = f"{src_prefix}.layers.{i}.blocks.{j}"
                dst = f"{dst_prefix}_{i}/block_{j}"
                _norm(out, f"{dst}/norm1", r, f"{src}.norm1")
                _lin(out, f"{dst}/attn/qkv", r, f"{src}.attn.qkv")
                _lin(out, f"{dst}/attn/proj", r, f"{src}.attn.proj")
                _set(out, f"{dst}/attn/relative_position_bias_table",
                     r(f"{src}.attn.relative_position_bias_table"))
                _norm(out, f"{dst}/norm2", r, f"{src}.norm2")
                _lin(out, f"{dst}/fc1", r, f"{src}.mlp.fc1")
                _lin(out, f"{dst}/fc2", r, f"{src}.mlp.fc2")

    tab("tablock1", "tablock1")
    _conv(out, "conv1", r, "conv1")
    swin("swin1", "swintransformer1")
    tab("tablock2", "tablock2")
    _conv(out, "conv2", r, "conv2")
    swin("swin2", "swintransformer2")
    for head in ("fc_score", "fc_weight"):
        _lin(out, f"{head}_0", r, f"{head}.0")
        _lin(out, f"{head}_3", r, f"{head}.3")
    return out


def convert_musiq(sd: TorchDict, cfg) -> Params:
    """MUSIQ state dict (this repo's documented layout, tests/test_musiq.py)
    -> utils/musiq.MUSIQ params. The published pyiqa checkpoint needs a
    key-rename shim first (utils/musiq.py RECONSTRUCTION STATUS)."""
    r = Reader(sd, "")
    out: Params = {}

    pe = "patch_encoder"
    _set(out, f"{pe}/root/kernel", t_conv(r(f"{pe}.root.weight")))
    _norm(out, f"{pe}/root_gn", r, f"{pe}.root_gn")
    for gn in ("gn1", "gn2", "gn3"):
        _norm(out, f"{pe}/block1/{gn}", r, f"{pe}.block1.{gn}")
    for conv in ("conv1", "conv2", "conv3", "proj"):
        if r.has(f"{pe}.block1.{conv}.weight"):
            _set(out, f"{pe}/block1/{conv}/kernel",
                 t_conv(r(f"{pe}.block1.{conv}.weight")))
    _norm(out, f"{pe}/out_gn", r, f"{pe}.out_gn")
    _lin(out, f"{pe}/embedding", r, f"{pe}.embedding")

    bb = "backbone"
    _set(out, f"{bb}/spatial_embedding", r(f"{bb}.spatial_embedding"))
    _set(out, f"{bb}/scale_embedding", r(f"{bb}.scale_embedding"))
    _set(out, f"{bb}/cls_token", r(f"{bb}.cls_token").reshape(1, 1, -1))
    for i in range(cfg.layers):
        src = f"{bb}.blocks.{i}"
        dst = f"{bb}/block_{i}"
        _norm(out, f"{dst}/norm1", r, f"{src}.norm1")
        _lin(out, f"{dst}/qkv", r, f"{src}.attn.qkv")
        _lin(out, f"{dst}/proj", r, f"{src}.attn.proj")
        _norm(out, f"{dst}/norm2", r, f"{src}.norm2")
        _lin(out, f"{dst}/fc1", r, f"{src}.mlp.fc1")
        _lin(out, f"{dst}/fc2", r, f"{src}.mlp.fc2")
    _norm(out, f"{bb}/encoder_norm", r, f"{bb}.encoder_norm")
    _lin(out, f"{bb}/head", r, f"{bb}.head")
    return out


def convert_ram_plus(sd: TorchDict, cfg) -> Params:
    """RAM++ checkpoint (ram_plus_swin_large_14m.pth layout: BLIP swin
    visual_encoder + frozen label_embed + q2l tagging_head BertModel +
    GroupWiseLinear fc) -> models/ram.RAMPlus params. Layout reconstructed
    from the published ram_plus.py (see models/ram.py RECONSTRUCTION
    STATUS); the reference consumer is terediff/utils/caption.py:152-171."""
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    r = Reader(sd, "")
    out: Params = {}

    ve = "visual_encoder"
    _conv(out, f"{ve}/patch_embed", r, f"{ve}.patch_embed.proj")
    _norm(out, f"{ve}/patch_norm", r, f"{ve}.patch_embed.norm")
    for i, depth in enumerate(cfg.swin.depths):
        for j in range(depth):
            src = f"{ve}.layers.{i}.blocks.{j}"
            dst = f"{ve}/stage_{i}/block_{j}"
            _norm(out, f"{dst}/norm1", r, f"{src}.norm1")
            _lin(out, f"{dst}/attn/qkv", r, f"{src}.attn.qkv")
            _lin(out, f"{dst}/attn/proj", r, f"{src}.attn.proj")
            _set(out, f"{dst}/attn/relative_position_bias_table",
                 r(f"{src}.attn.relative_position_bias_table"))
            _norm(out, f"{dst}/norm2", r, f"{src}.norm2")
            _lin(out, f"{dst}/fc1", r, f"{src}.mlp.fc1")
            _lin(out, f"{dst}/fc2", r, f"{src}.mlp.fc2")
        if i < len(cfg.swin.depths) - 1:
            ds = f"{ve}.layers.{i}.downsample"
            _norm(out, f"{ve}/stage_{i}/downsample/norm", r, f"{ds}.norm")
            _lin(out, f"{ve}/stage_{i}/downsample/reduction", r,
                 f"{ds}.reduction", bias=False)
    _norm(out, f"{ve}/norm", r, f"{ve}.norm")

    _set(out, "label_embed", r("label_embed"))
    _set(out, "reweight_scale", np.asarray(r("reweight_scale")).reshape(()))
    _lin(out, "image_proj", r, "image_proj")
    _lin(out, "wordvec_proj", r, "wordvec_proj")
    for i in range(cfg.layers):
        src = f"tagging_head.encoder.layer.{i}"
        dst = f"tag_layer_{i}"
        for tsrc, tdst in (("attention", "self"), ("crossattention", "cross")):
            for p in ("query", "key", "value"):
                _lin(out, f"{dst}/{tdst}_{p}", r, f"{src}.{tsrc}.self.{p}")
            _lin(out, f"{dst}/{tdst}_out", r, f"{src}.{tsrc}.output.dense")
            _norm(out, f"{dst}/{tdst}_ln", r, f"{src}.{tsrc}.output.LayerNorm")
        _lin(out, f"{dst}/ffn_in", r, f"{src}.intermediate.dense")
        _lin(out, f"{dst}/ffn_out", r, f"{src}.output.dense")
        _norm(out, f"{dst}/ffn_ln", r, f"{src}.output.LayerNorm")
    _set(out, "fc_w", r("fc.W").reshape(cfg.num_class, cfg.hidden))
    _set(out, "fc_b", r("fc.b").reshape(cfg.num_class))
    return out


# --------------------------------------------------------------------------
# SwinIR
# --------------------------------------------------------------------------

def convert_swinir(sd: TorchDict, cfg, prefix: str = "") -> Tuple[Params, Reader]:
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    r = Reader(sd, prefix)
    out: Params = {}
    _conv(out, "conv_first", r,
          "conv_first.1" if cfg.unshuffle else "conv_first")
    _norm(out, "patch_norm", r, "patch_embed.norm")
    for li, depth in enumerate(cfg.depths):
        for bi in range(depth):
            src = f"layers.{li}.residual_group.blocks.{bi}"
            dst = f"layer_{li}/block_{bi}"
            _norm(out, f"{dst}/norm1", r, f"{src}.norm1")
            _norm(out, f"{dst}/norm2", r, f"{src}.norm2")
            _lin(out, f"{dst}/attn/qkv", r, f"{src}.attn.qkv")
            _lin(out, f"{dst}/attn/proj", r, f"{src}.attn.proj")
            _set(out, f"{dst}/attn/rel_pos_bias_table",
                 r(f"{src}.attn.relative_position_bias_table"))
            _lin(out, f"{dst}/mlp_fc1", r, f"{src}.mlp.fc1")
            _lin(out, f"{dst}/mlp_fc2", r, f"{src}.mlp.fc2")
        _conv(out, f"layer_{li}/conv", r, f"layers.{li}.conv")
    _norm(out, "norm", r, "norm")
    _conv(out, "conv_after_body", r, "conv_after_body")
    _conv(out, "conv_before_upsample", r, "conv_before_upsample.0")
    ups = {2: ("conv_up1",), 4: ("conv_up1", "conv_up2"),
           8: ("conv_up1", "conv_up2", "conv_up3")}[cfg.sf]
    for name in ups:
        _conv(out, name, r, name)
    _conv(out, "conv_hr", r, "conv_hr")
    _conv(out, "conv_last", r, "conv_last")
    return out, r


# --------------------------------------------------------------------------
# DiffBIR cleaners (BSRNet / SCUNet)
# --------------------------------------------------------------------------

def convert_bsrnet(sd: TorchDict, cfg, prefix: str = "") -> Tuple[Params, Reader]:
    """BSRNet/BSRGAN RRDBNet checkpoint (bsrnet.py:75-104 key layout:
    conv_first, RRDB_trunk.N.RDBM.convK, trunk_conv, upconv1/2, HRconv,
    conv_last)."""
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    r = Reader(sd, prefix)
    out: Params = {}
    _conv(out, "conv_first", r, "conv_first")
    for i in range(cfg.nb):
        for j in range(3):
            for k in range(5):
                _conv(
                    out, f"rrdb_{i}/rdb{j + 1}/conv{k + 1}", r,
                    f"RRDB_trunk.{i}.RDB{j + 1}.conv{k + 1}",
                )
    _conv(out, "trunk_conv", r, "trunk_conv")
    _conv(out, "upconv1", r, "upconv1")
    if cfg.sf == 4:
        _conv(out, "upconv2", r, "upconv2")
    _conv(out, "hr_conv", r, "HRconv")
    _conv(out, "conv_last", r, "conv_last")
    return out, r


def convert_scunet(sd: TorchDict, cfg, prefix: str = "") -> Tuple[Params, Reader]:
    """SCUNet denoiser checkpoint (scunet.py:163-224 key layout: m_head.0,
    m_{down,up}N / m_body Sequential of ConvTransBlocks with WMSA swin
    branches, m_tail.0).

    WMSA stores its relative bias as [heads, 2w-1, 2w-1]
    (scunet.py:26-32 view+transpose); our WindowAttention uses the swinir
    [(2w-1)^2, heads] table with the standard query-minus-key index, so the
    conversion transposes back. ConvTranspose weights go torch
    [in, out, kh, kw] -> flax [kh, kw, in, out]."""
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    r = Reader(sd, prefix)
    out: Params = {}

    def swin_block(dst, src):
        _norm(out, f"{dst}/trans/norm1", r, f"{src}.trans_block.ln1")
        _norm(out, f"{dst}/trans/norm2", r, f"{src}.trans_block.ln2")
        _lin(out, f"{dst}/trans/attn/qkv", r, f"{src}.trans_block.msa.embedding_layer")
        _lin(out, f"{dst}/trans/attn/proj", r, f"{src}.trans_block.msa.linear")
        rel = r(f"{src}.trans_block.msa.relative_position_params")
        # [h, A, B] -> [(A*B), h]
        _set(out, f"{dst}/trans/attn/rel_pos_bias_table",
             np.transpose(rel, (1, 2, 0)).reshape(-1, rel.shape[0]))
        _lin(out, f"{dst}/trans/mlp_fc1", r, f"{src}.trans_block.mlp.0")
        _lin(out, f"{dst}/trans/mlp_fc2", r, f"{src}.trans_block.mlp.2")
        _conv(out, f"{dst}/conv1_1", r, f"{src}.conv1_1")
        _conv(out, f"{dst}/conv1_2", r, f"{src}.conv1_2")
        _set(out, f"{dst}/cb1/kernel", t_conv(r(f"{src}.conv_block.0.weight")))
        _set(out, f"{dst}/cb2/kernel", t_conv(r(f"{src}.conv_block.2.weight")))

    def conv_transpose(dst, src):
        # torch [in, out, kh, kw] -> flax transpose_kernel=True [kh, kw, out, in]
        w = r(f"{src}.weight")
        _set(out, f"{dst}/kernel", np.transpose(w, (2, 3, 1, 0)))

    def conv_nb(dst, src):  # bias-free convs (head/tail/downN/conv_block)
        _set(out, f"{dst}/kernel", t_conv(r(f"{src}.weight")))

    conv_nb("head", "m_head.0")
    n = cfg.config
    for i in range(n[0]):
        swin_block(f"down1_{i}", f"m_down1.{i}")
    conv_nb("down1_conv", f"m_down1.{n[0]}")
    for i in range(n[1]):
        swin_block(f"down2_{i}", f"m_down2.{i}")
    conv_nb("down2_conv", f"m_down2.{n[1]}")
    for i in range(n[2]):
        swin_block(f"down3_{i}", f"m_down3.{i}")
    conv_nb("down3_conv", f"m_down3.{n[2]}")
    for i in range(n[3]):
        swin_block(f"body_{i}", f"m_body.{i}")
    conv_transpose("up3_conv", "m_up3.0")
    for i in range(n[4]):
        swin_block(f"up3_{i}", f"m_up3.{i + 1}")
    conv_transpose("up2_conv", "m_up2.0")
    for i in range(n[5]):
        swin_block(f"up2_{i}", f"m_up2.{i + 1}")
    conv_transpose("up1_conv", "m_up1.0")
    for i in range(n[6]):
        swin_block(f"up1_{i}", f"m_up1.{i + 1}")
    conv_nb("tail", "m_tail.0")
    return out, r


# --------------------------------------------------------------------------
# TESTR
# --------------------------------------------------------------------------

def convert_testr(sd: TorchDict, cfg, prefix: str = "testr.") -> Tuple[Params, Reader]:
    r = Reader(sd, prefix)
    out: Params = {}
    for i in range(len(cfg.in_channels)):
        src = f"diff_feat_proj.{i}"
        dst = f"diff_feat_proj_{i}"
        _conv(out, f"{dst}/conv1", r, f"{src}.0")
        _norm(out, f"{dst}/gn1", r, f"{src}.1")
        _conv(out, f"{dst}/conv2", r, f"{src}.3")
        _norm(out, f"{dst}/gn2", r, f"{src}.4")

    _set(out, "ctrl_point_embed", r("ctrl_point_embed.weight"))
    _set(out, "text_embed", r("text_embed.weight"))
    # heads are shared across layers; torch stores one copy under index 0
    _lin(out, "ctrl_point_class", r, "ctrl_point_class.0")
    for i in range(3):
        _lin(out, f"ctrl_point_coord/fc{i}", r, f"ctrl_point_coord.0.layers.{i}")
    _lin(out, "text_class", r, "text_class")

    t = "transformer/"
    _set(out, t + "level_embed", r("transformer.level_embed"))
    _lin(out, t + "enc_output", r, "transformer.enc_output")
    _norm(out, t + "enc_output_norm", r, "transformer.enc_output_norm")
    _lin(out, t + "pos_trans", r, "transformer.pos_trans")
    _norm(out, t + "pos_trans_norm", r, "transformer.pos_trans_norm")
    _lin(out, t + "bbox_class_embed", r, "bbox_class")
    for i in range(3):
        _lin(out, t + f"bbox_embed/fc{i}", r, f"bbox_coord.layers.{i}")

    def msda(dst, src):
        for n in ("sampling_offsets", "attention_weights", "value_proj",
                  "output_proj"):
            _lin(out, f"{dst}/{n}", r, f"{src}.{n}")

    for i in range(cfg.num_encoder_layers):
        src = f"transformer.encoder.layers.{i}"
        dst = t + f"enc_{i}"
        msda(f"{dst}/self_attn", f"{src}.self_attn")
        _norm(out, f"{dst}/norm1", r, f"{src}.norm1")
        _norm(out, f"{dst}/norm2", r, f"{src}.norm2")
        _lin(out, f"{dst}/linear1", r, f"{src}.linear1")
        _lin(out, f"{dst}/linear2", r, f"{src}.linear2")

    for i in range(cfg.num_decoder_layers):
        src = f"transformer.decoder.layers.{i}"
        dst = t + f"dec_{i}"
        msda(f"{dst}/attn_cross", f"{src}.attn_cross")
        msda(f"{dst}/attn_cross_text", f"{src}.attn_cross_text")
        for n in ("attn_intra", "attn_inter", "attn_intra_text",
                  "attn_inter_text"):
            _mha(out, f"{dst}/{n}", r, f"{src}.{n}", cfg.n_heads)
        for n in ("norm_intra", "norm_inter", "norm_cross", "norm3",
                  "norm_intra_text", "norm_inter_text", "norm_cross_text",
                  "norm3_text"):
            _norm(out, f"{dst}/{n}", r, f"{src}.{n}")
        for n in ("linear1", "linear2", "linear1_text", "linear2_text"):
            _lin(out, f"{dst}/{n}", r, f"{src}.{n}")
    return out, r


# --------------------------------------------------------------------------
# top-level loaders
# --------------------------------------------------------------------------

def load_torch_file(path: str) -> TorchDict:
    """Load a checkpoint into {name: np.ndarray}. Handles torch .pt/.pth/
    .ckpt (nested under 'state_dict'/'model' as in the reference bundles)
    and detectron2 .pkl files (pickled numpy dicts, the AdetCheckpointer
    format, /root/reference/testr/adet/checkpoint/adet_checkpoint.py:6-36)."""
    import torch

    if path.endswith(".pkl"):
        import pickle

        with open(path, "rb") as f:
            sd = pickle.load(f, encoding="latin1")
    else:
        sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if isinstance(sd, dict) and "model" in sd and all(
        not k.startswith("model.") for k in sd if k != "model"
    ):
        sd = sd["model"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def load_pretrained_sd_bundle(params: Params, sd: TorchDict, model) -> Params:
    """SD2.1 checkpoint -> unet/vae/clip subtrees (cldm.py module_map)."""
    unet, _ = convert_unet(sd, model.cldm.unet.cfg, "model.diffusion_model.")
    vae, _ = convert_vae(sd, model.cldm.vae.cfg, "first_stage_model.")
    clip, _ = convert_clip(sd, model.cldm.clip.cfg, "cond_stage_model.model.")
    return {**params, "unet": _cast_like(unet, params["unet"]),
            "vae": _cast_like(vae, params["vae"]),
            "clip": _cast_like(clip, params["clip"])}


def _cast_like(src: Params, like: Params) -> Params:
    """Structure/shape check against an init tree; dtype follows init."""
    import jax

    flat_like = jax.tree_util.tree_flatten_with_path(like)[0]
    flat_src = dict(jax.tree_util.tree_flatten_with_path(src)[0])
    out = []
    for path, v in flat_like:
        if path in flat_src:
            s = np.asarray(flat_src[path])
            assert s.shape == v.shape, f"{path}: {s.shape} != {v.shape}"
            out.append(s.astype(np.asarray(v).dtype))
        else:
            out.append(v)
    treedef = jax.tree_util.tree_structure(like)
    return jax.tree_util.tree_unflatten(treedef, out)

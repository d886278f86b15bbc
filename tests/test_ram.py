"""RAM++ tagger: forward parity vs a torch mirror in the official layout.

The mirror reimplements the RAM++ inference graph (BLIP-variant Swin
encoder + description-reweighted label embeddings + q2l tagging decoder +
GroupWiseLinear) in the official ram_plus state-dict key layout; the `ram`
package is not available in this environment, so the mirror is
reconstructed alongside the Flax module (see tair_tpu/models/ram.py
RECONSTRUCTION STATUS for what this does and does not prove).
Reference consumer: /root/reference/terediff/utils/caption.py:152-171.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from tair_tpu.models.ram import (  # noqa: E402
    RAMConfig,
    RAMPlus,
    RAMTagger,
    SwinConfig,
    preprocess,
)
from tair_tpu.utils.maniqa import _rel_pos_index  # noqa: E402


def _torch_ram(cfg: RAMConfig):
    import torch
    import torch.nn.functional as F
    from torch import nn

    sc = cfg.swin

    class WindowAttention(nn.Module):
        def __init__(self, dim, ws, heads):
            super().__init__()
            self.heads, self.ws = heads, ws
            self.qkv = nn.Linear(dim, dim * 3)
            self.proj = nn.Linear(dim, dim)
            self.relative_position_bias_table = nn.Parameter(
                torch.randn((2 * ws - 1) ** 2, heads) * 0.02
            )
            self.register_buffer(
                "relative_position_index",
                torch.from_numpy(_rel_pos_index(ws).astype(np.int64)),
            )

        def forward(self, x, mask=None):
            b, t, d = x.shape
            hd = d // self.heads
            qkv = self.qkv(x).reshape(b, t, 3, self.heads, hd)
            q, k, v = qkv.unbind(2)
            attn = torch.einsum("bqhd,bkhd->bhqk", q, k) / hd ** 0.5
            bias = self.relative_position_bias_table[
                self.relative_position_index.view(-1)
            ].view(t, t, -1).permute(2, 0, 1)
            attn = attn + bias.unsqueeze(0)
            if mask is not None:
                nw = mask.shape[0]
                attn = attn.view(-1, nw, self.heads, t, t) + mask[None, :, None]
                attn = attn.view(b, self.heads, t, t)
            attn = attn.softmax(-1)
            o = torch.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, d)
            return self.proj(o)

    def window_partition(x, ws):
        b, h, w, d = x.shape
        x = x.view(b, h // ws, ws, w // ws, ws, d)
        return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, d)

    def window_reverse(x, ws, h, w):
        b = x.shape[0] // ((h // ws) * (w // ws))
        x = x.view(b, h // ws, w // ws, ws, ws, -1)
        return x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)

    class SwinBlock(nn.Module):
        def __init__(self, dim, res, heads, ws, shift, dim_mlp):
            super().__init__()
            self.res, self.ws, self.shift = res, ws, shift
            self.norm1 = nn.LayerNorm(dim)
            self.attn = WindowAttention(dim, ws, heads)
            self.norm2 = nn.LayerNorm(dim)
            self.mlp = nn.Sequential()
            self.mlp.fc1 = nn.Linear(dim, dim_mlp)
            self.mlp.fc2 = nn.Linear(dim_mlp, dim)
            if shift > 0:
                img = torch.zeros(1, res, res, 1)
                cnt = 0
                for hs in (slice(0, -ws), slice(-ws, -shift),
                           slice(-shift, None)):
                    for wsl in (slice(0, -ws), slice(-ws, -shift),
                                slice(-shift, None)):
                        img[:, hs, wsl] = cnt
                        cnt += 1
                wins = window_partition(img, ws).view(-1, ws * ws)
                diff = wins.unsqueeze(1) - wins.unsqueeze(2)
                self.register_buffer(
                    "attn_mask", torch.where(diff != 0, -100.0, 0.0)
                )
            else:
                self.attn_mask = None

        def forward(self, x):  # [B, L, D]
            hh = ww = self.res
            b, t, d = x.shape
            shortcut = x
            x = self.norm1(x).view(b, hh, ww, d)
            if self.shift > 0:
                x = torch.roll(x, (-self.shift, -self.shift), (1, 2))
            wins = window_partition(x, self.ws)
            wins = self.attn(wins, self.attn_mask)
            x = window_reverse(wins, self.ws, hh, ww)
            if self.shift > 0:
                x = torch.roll(x, (self.shift, self.shift), (1, 2))
            x = shortcut + x.reshape(b, t, d)
            return x + self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))

    class PatchMerging(nn.Module):
        def __init__(self, dim, res):
            super().__init__()
            self.res = res
            self.norm = nn.LayerNorm(4 * dim)
            self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)

        def forward(self, x):  # [B, L, C]
            b, t, c = x.shape
            x = x.view(b, self.res, self.res, c)
            x = torch.cat(
                [x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                 x[:, 0::2, 1::2], x[:, 1::2, 1::2]], -1
            ).view(b, t // 4, 4 * c)
            return self.reduction(self.norm(x))

    class BasicLayer(nn.Module):
        def __init__(self, dim, res, depth, heads, downsample):
            super().__init__()
            ws = min(sc.window, res)
            self.blocks = nn.ModuleList(
                SwinBlock(dim, res, heads, ws,
                          0 if (j % 2 == 0 or ws >= res) else ws // 2,
                          int(dim * sc.mlp_ratio))
                for j in range(depth)
            )
            self.downsample = PatchMerging(dim, res) if downsample else None

        def forward(self, x):
            for blk in self.blocks:
                x = blk(x)
            if self.downsample is not None:
                x = self.downsample(x)
            return x

    class SwinTransformer(nn.Module):
        """BLIP/RAM variant: returns [B, 1+L, C] with avg-pooled CLS."""

        def __init__(self):
            super().__init__()
            self.patch_embed = nn.Sequential()
            self.patch_embed.proj = nn.Conv2d(
                3, sc.embed_dim, sc.patch_size, sc.patch_size)
            self.patch_embed.norm = nn.LayerNorm(sc.embed_dim)
            self.layers = nn.ModuleList(
                BasicLayer(sc.embed_dim * 2 ** i, sc.grid // 2 ** i,
                           sc.depths[i], sc.num_heads[i],
                           downsample=i < len(sc.depths) - 1)
                for i in range(len(sc.depths))
            )
            self.norm = nn.LayerNorm(sc.vision_width)

        def forward(self, x):
            x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
            x = self.patch_embed.norm(x)
            for layer in self.layers:
                x = layer(x)
            x = self.norm(x)
            cls = x.mean(1, keepdim=True)
            return torch.cat([cls, x], dim=1)

    class BertTagLayer(nn.Module):
        def __init__(self):
            super().__init__()
            h = cfg.hidden

            def _att(width):
                m = nn.Module()
                m.self = nn.Module()
                m.self.query = nn.Linear(h, h)
                m.self.key = nn.Linear(width, h)
                m.self.value = nn.Linear(width, h)
                m.output = nn.Module()
                m.output.dense = nn.Linear(h, h)
                m.output.LayerNorm = nn.LayerNorm(h, eps=1e-12)
                return m

            self.attention = _att(h)
            self.crossattention = _att(cfg.embed_width)
            self.intermediate = nn.Module()
            self.intermediate.dense = nn.Linear(h, cfg.intermediate)
            self.output = nn.Module()
            self.output.dense = nn.Linear(cfg.intermediate, h)
            self.output.LayerNorm = nn.LayerNorm(h, eps=1e-12)

        @staticmethod
        def _attend(att, q_in, kv_in, heads):
            b, tq, _ = q_in.shape
            q = att.self.query(q_in)
            k = att.self.key(kv_in)
            v = att.self.value(kv_in)
            hd = q.shape[-1] // heads
            q = q.view(b, tq, heads, hd)
            k = k.view(b, -1, heads, hd)
            v = v.view(b, -1, heads, hd)
            a = torch.einsum("bqhd,bkhd->bhqk", q, k) / hd ** 0.5
            a = a.softmax(-1)
            o = torch.einsum("bhqk,bkhd->bqhd", a, v).reshape(b, tq, -1)
            return att.output.LayerNorm(att.output.dense(o) + q_in)

        def forward(self, h, enc):
            h = self._attend(self.attention, h, h, cfg.heads)
            h = self._attend(self.crossattention, h, enc, cfg.heads)
            f = F.gelu(self.intermediate.dense(h))
            return self.output.LayerNorm(self.output.dense(f) + h)

    class GroupWiseLinear(nn.Module):
        def __init__(self):
            super().__init__()
            self.W = nn.Parameter(
                torch.randn(1, cfg.num_class, cfg.hidden) * 0.1)
            self.b = nn.Parameter(torch.randn(1, cfg.num_class) * 0.1)

        def forward(self, x):  # [B, C, H]
            return (self.W * x).sum(-1) + self.b

    class RAMPlusTorch(nn.Module):
        def __init__(self):
            super().__init__()
            self.visual_encoder = SwinTransformer()
            self.label_embed = nn.Parameter(torch.randn(
                cfg.num_class * cfg.des_per_class, cfg.embed_width))
            self.reweight_scale = nn.Parameter(
                torch.ones([]) * np.log(1 / 0.07))
            self.image_proj = nn.Linear(sc.vision_width, cfg.embed_width)
            self.wordvec_proj = nn.Linear(cfg.embed_width, cfg.hidden)
            self.tagging_head = nn.Module()
            self.tagging_head.encoder = nn.Module()
            self.tagging_head.encoder.layer = nn.ModuleList(
                BertTagLayer() for _ in range(cfg.layers))
            self.fc = GroupWiseLinear()

        def forward(self, image):  # [B, 3, H, W]
            embeds = self.image_proj(self.visual_encoder(image))
            cls = embeds[:, 0]
            cls = cls / cls.norm(dim=-1, keepdim=True)
            sims = self.reweight_scale.exp() * cls @ self.label_embed.t()
            w = sims.view(-1, cfg.num_class, cfg.des_per_class).softmax(-1)
            per_class = self.label_embed.view(
                cfg.num_class, cfg.des_per_class, cfg.embed_width)
            queries = torch.einsum("bcd,cde->bce", w, per_class)
            h = F.relu(self.wordvec_proj(queries))
            for layer in self.tagging_head.encoder.layer:
                h = layer(h, embeds)
            return self.fc(h)

    torch.manual_seed(0)
    return RAMPlusTorch().eval()


def _tiny_cfg():
    return RAMConfig(
        swin=SwinConfig(img_size=16, patch_size=4, embed_dim=8,
                        depths=(2, 2), num_heads=(2, 2), window=2,
                        mlp_ratio=2.0),
        num_class=7,
        des_per_class=3,
        embed_width=12,
        hidden=16,
        heads=2,
        intermediate=24,
        layers=2,
        threshold=0.5,
    )


def test_ram_forward_parity():
    import torch

    from tair_tpu.weights.convert import convert_ram_plus

    cfg = _tiny_cfg()
    net = _torch_ram(cfg)
    sd = {k: v.numpy() for k, v in net.state_dict().items()
          if "relative_position_index" not in k and "attn_mask" not in k}
    params = convert_ram_plus(sd, cfg)

    x = np.random.RandomState(0).rand(2, 16, 16, 3).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(RAMPlus(cfg).apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_ram_tagger_thresholds(tmp_path):
    import jax

    cfg = _tiny_cfg()
    params = RAMPlus(cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    tags = [f"word{i}" for i in range(cfg.num_class)]
    tagger = RAMTagger(params, cfg, tag_list=tags, thresholds=0.0)
    out = tagger(np.random.RandomState(1).rand(2, 16, 16, 3).astype(np.float32))
    assert len(out) == 2
    # threshold 0 -> sigmoid(logit) > 0 always -> every tag fires
    assert out[0] == tags
    # per-class thresholds of 1.0 suppress everything
    strict = RAMTagger(params, cfg, tag_list=tags,
                       thresholds=np.ones(cfg.num_class))
    assert strict(np.zeros((1, 16, 16, 3), np.float32)) == [[]]
    # tag-list length is validated
    with pytest.raises(ValueError):
        RAMTagger(params, cfg, tag_list=tags[:-1])


def test_ram_preprocess_shape():
    img = np.random.RandomState(0).rand(10, 14, 3).astype(np.float32)
    x = preprocess(img, 16)
    assert x.shape == (1, 16, 16, 3)
    assert np.isfinite(x).all()

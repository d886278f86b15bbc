"""MANIQA: forward parity vs a torch mirror in the official key layout.

The mirror reimplements the IIGROUP/MANIQA architecture (timm ViT backbone +
TABlocks + scaled swin stages + dual score/weight heads) in the official
state-dict key layout; pyiqa/MANIQA source is not available in this
environment, so the mirror is reconstructed alongside the Flax module (see
tair_tpu/utils/maniqa.py docstring for what this does and does not prove).
Reference consumer: /root/reference/val.py:74.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from tair_tpu.utils.maniqa import (  # noqa: E402
    MANIQA,
    MANIQAConfig,
    MANIQAMetric,
    ViTConfig,
    _rel_pos_index,
)


def _torch_maniqa(cfg: MANIQAConfig):
    import torch
    import torch.nn.functional as F
    from torch import nn

    g = cfg.input_size

    class Attention(nn.Module):
        def __init__(self, dim, heads):
            super().__init__()
            self.heads = heads
            self.qkv = nn.Linear(dim, dim * 3)
            self.proj = nn.Linear(dim, dim)

        def forward(self, x):
            b, t, d = x.shape
            hd = d // self.heads
            qkv = self.qkv(x).reshape(b, t, 3, self.heads, hd)
            q, k, v = qkv.unbind(2)
            attn = torch.einsum("bqhd,bkhd->bhqk", q, k) / hd ** 0.5
            attn = attn.softmax(-1)
            o = torch.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, d)
            return self.proj(o)

    class ViTBlock(nn.Module):
        def __init__(self, dim, heads, hidden):
            super().__init__()
            self.norm1 = nn.LayerNorm(dim, eps=1e-6)
            self.attn = Attention(dim, heads)
            self.norm2 = nn.LayerNorm(dim, eps=1e-6)
            self.mlp = nn.Sequential()
            self.mlp.fc1 = nn.Linear(dim, hidden)
            self.mlp.fc2 = nn.Linear(hidden, dim)

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            return x + self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))

    class ViT(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.patch_embed = nn.Sequential()
            self.patch_embed.proj = nn.Conv2d(
                3, c.dim, c.patch_size, c.patch_size
            )
            n = (c.img_size // c.patch_size) ** 2
            self.cls_token = nn.Parameter(torch.zeros(1, 1, c.dim))
            self.pos_embed = nn.Parameter(torch.randn(1, n + 1, c.dim) * 0.02)
            self.blocks = nn.ModuleList(
                ViTBlock(c.dim, c.heads, int(c.dim * c.mlp_ratio))
                for _ in range(c.depth)
            )

        def forward(self, x):
            x = self.patch_embed.proj(x)           # [B, D, g, g]
            b, d = x.shape[:2]
            x = x.flatten(2).transpose(1, 2)       # [B, N, D]
            x = torch.cat([self.cls_token.expand(b, -1, -1), x], 1)
            x = x + self.pos_embed
            outs = []
            for blk in self.blocks:
                x = blk(x)
                outs.append(x)
            return outs

    class TABlock(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.c_q = nn.Linear(dim, dim)
            self.c_k = nn.Linear(dim, dim)
            self.c_v = nn.Linear(dim, dim)

        def forward(self, x):
            _x = x
            b, c, n = x.shape
            q, k, v = self.c_q(x), self.c_k(x), self.c_v(x)
            attn = (q @ k.transpose(-2, -1) * n ** -0.5).softmax(-1)
            # official recombine quirk: non-contiguous view reshape
            x = (attn @ v).transpose(1, 2).reshape(b, c, n)
            return x + _x

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
                for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
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

        def forward(self, x):
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

    class BasicLayer(nn.Module):
        def __init__(self, dim, res, depth, heads, window, dim_mlp):
            super().__init__()
            ws = min(window, res)
            self.blocks = nn.ModuleList(
                SwinBlock(
                    dim, res, heads, ws,
                    0 if (j % 2 == 0 or ws >= res) else ws // 2, dim_mlp,
                )
                for j in range(depth)
            )

        def forward(self, x):
            for blk in self.blocks:
                x = blk(x)
            return x

    class SwinTransformer(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.layers = nn.ModuleList(
                BasicLayer(dim, g, cfg.depths[i], cfg.num_heads[i],
                           cfg.window_size, cfg.dim_mlp)
                for i in range(len(cfg.depths))
            )

        def forward(self, x):  # [B, T, D]
            for layer in self.layers:
                x = cfg.scale * layer(x) + x
            return x

    class MANIQATorch(nn.Module):
        def __init__(self):
            super().__init__()
            self.vit = ViT(cfg.vit)
            cat_dim = cfg.vit.dim * len(cfg.extract_blocks)
            n = g * g
            self.tablock1 = nn.ModuleList(TABlock(n) for _ in range(cfg.num_tab))
            self.conv1 = nn.Conv2d(cat_dim, cfg.embed_dim, 1)
            self.swintransformer1 = SwinTransformer(cfg.embed_dim)
            self.tablock2 = nn.ModuleList(TABlock(n) for _ in range(cfg.num_tab))
            self.conv2 = nn.Conv2d(cfg.embed_dim, cfg.embed_dim // 2, 1)
            self.swintransformer2 = SwinTransformer(cfg.embed_dim // 2)
            half = cfg.embed_dim // 2
            self.fc_score = nn.Sequential(
                nn.Linear(half, half), nn.ReLU(), nn.Identity(),
                nn.Linear(half, 1), nn.ReLU(),
            )
            self.fc_weight = nn.Sequential(
                nn.Linear(half, half), nn.ReLU(), nn.Identity(),
                nn.Linear(half, 1), nn.Sigmoid(),
            )

        def forward(self, x):
            outs = self.vit(x)
            x = torch.cat([outs[i][:, 1:] for i in cfg.extract_blocks], dim=2)
            b, n, c = x.shape
            x = x.transpose(1, 2)                     # [B, C, N]
            for tab in self.tablock1:
                x = tab(x)
            x = x.reshape(b, c, g, g)
            x = self.conv1(x)
            x = x.flatten(2).transpose(1, 2)          # [B, N, D]
            x = self.swintransformer1(x)
            x = x.transpose(1, 2)                     # [B, D, N]
            for tab in self.tablock2:
                x = tab(x)
            x = x.reshape(b, cfg.embed_dim, g, g)
            x = self.conv2(x)
            x = x.flatten(2).transpose(1, 2)
            x = self.swintransformer2(x)
            score = self.fc_score(x)[..., 0]
            weight = self.fc_weight(x)[..., 0]
            return (score * weight).sum(-1) / weight.sum(-1).clamp_min(1e-12)

    torch.manual_seed(0)
    net = MANIQATorch().eval()
    # rename mlp.fc{1,2} keys the way torch serializes Sequential attrs and
    # fc heads (Sequential index keys .0/.3) — already the official layout
    return net


def _tiny_cfg():
    return MANIQAConfig(
        vit=ViTConfig(img_size=32, patch_size=8, dim=16, depth=2, heads=2),
        extract_blocks=(0, 1),
        embed_dim=16,
        num_tab=2,
        depths=(2, 2),
        num_heads=(2, 2),
        window_size=2,   # resolution 4 > window 2 -> shifted blocks exercise masks
        dim_mlp=24,
        scale=0.8,
    )


def test_maniqa_forward_parity():
    import jax
    import torch

    from tair_tpu.weights.convert import convert_maniqa

    cfg = _tiny_cfg()
    net = _torch_maniqa(cfg)
    sd = {k: v for k, v in net.state_dict().items()
          if "relative_position_index" not in k and "attn_mask" not in k}
    params = convert_maniqa(
        {k: v.numpy() for k, v in sd.items()}, cfg
    )

    x = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(MANIQA(cfg).apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_maniqa_metric_protocol():
    """Crop-averaged metric wrapper: deterministic, finite, batch-shaped;
    images smaller than the crop are edge-padded."""
    import jax

    cfg = _tiny_cfg()
    params = MANIQA(cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )["params"]
    metric = MANIQAMetric(params, cfg, num_crops=3, seed=1)
    imgs = jnp.asarray(np.random.RandomState(2).rand(2, 40, 48, 3), jnp.float32)
    s1 = np.asarray(metric(imgs))
    s2 = np.asarray(metric(imgs))
    assert s1.shape == (2,) and np.isfinite(s1).all()
    np.testing.assert_allclose(s1, s2)
    small = jnp.asarray(np.random.RandomState(3).rand(1, 20, 24, 3), jnp.float32)
    assert np.isfinite(np.asarray(metric(small))).all()

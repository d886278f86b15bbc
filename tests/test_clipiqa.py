"""CLIP-IQA: ModifiedResNet forward parity + end-to-end metric contract.

The visual-tower oracle is a torch mirror written from the official OpenAI
CLIP architecture (model.py ModifiedResNet/Bottleneck/AttentionPool2d) —
the upstream source is not vendored in this environment, so this validates
the converter layout and the Flax graph against an independent torch
implementation of the same published architecture (small geometry,
random weights). Reference metric usage: /root/reference/val.py:75.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402


def _torch_modified_resnet(width, layers, embed_dim, heads, image_size):
    import torch
    import torch.nn.functional as F
    from torch import nn

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.avgpool = nn.AvgPool2d(stride) if stride > 1 else nn.Identity()
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = None
            if stride > 1 or inplanes != planes * 4:
                self.downsample = nn.Sequential(
                    nn.AvgPool2d(stride) if stride > 1 else nn.Identity(),
                    nn.Conv2d(inplanes, planes * 4, 1, bias=False),
                    nn.BatchNorm2d(planes * 4),
                )

        def forward(self, x):
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.avgpool(out)
            out = self.bn3(self.conv3(out))
            identity = x if self.downsample is None else self.downsample(x)
            return self.relu(out + identity)

    class AttentionPool2d(nn.Module):
        def __init__(self, spacial_dim, embed_dim, num_heads, output_dim):
            super().__init__()
            self.positional_embedding = nn.Parameter(
                torch.randn(spacial_dim ** 2 + 1, embed_dim) / embed_dim ** 0.5
            )
            self.k_proj = nn.Linear(embed_dim, embed_dim)
            self.q_proj = nn.Linear(embed_dim, embed_dim)
            self.v_proj = nn.Linear(embed_dim, embed_dim)
            self.c_proj = nn.Linear(embed_dim, output_dim)
            self.num_heads = num_heads

        def forward(self, x):
            x = x.flatten(start_dim=2).permute(2, 0, 1)       # [HW, B, C]
            x = torch.cat([x.mean(dim=0, keepdim=True), x], dim=0)
            x = x + self.positional_embedding[:, None, :]
            x, _ = F.multi_head_attention_forward(
                query=x[:1], key=x, value=x,
                embed_dim_to_check=x.shape[-1],
                num_heads=self.num_heads,
                q_proj_weight=self.q_proj.weight,
                k_proj_weight=self.k_proj.weight,
                v_proj_weight=self.v_proj.weight,
                in_proj_weight=None,
                in_proj_bias=torch.cat(
                    [self.q_proj.bias, self.k_proj.bias, self.v_proj.bias]
                ),
                bias_k=None, bias_v=None, add_zero_attn=False,
                dropout_p=0.0,
                out_proj_weight=self.c_proj.weight,
                out_proj_bias=self.c_proj.bias,
                use_separate_proj_weight=True,
                training=False, need_weights=False,
            )
            return x.squeeze(0)

    class ModifiedResNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, width // 2, 3, stride=2, padding=1, bias=False)
            self.bn1 = nn.BatchNorm2d(width // 2)
            self.conv2 = nn.Conv2d(width // 2, width // 2, 3, padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(width // 2)
            self.conv3 = nn.Conv2d(width // 2, width, 3, padding=1, bias=False)
            self.bn3 = nn.BatchNorm2d(width)
            self.avgpool = nn.AvgPool2d(2)
            self.relu = nn.ReLU(inplace=True)
            self._inplanes = width
            for stage, n in enumerate(layers):
                blocks = []
                planes = width * (2 ** stage)
                for blk in range(n):
                    stride = 2 if (stage > 0 and blk == 0) else 1
                    blocks.append(Bottleneck(self._inplanes, planes, stride))
                    self._inplanes = planes * 4
                setattr(self, f"layer{stage + 1}", nn.Sequential(*blocks))
            self.attnpool = AttentionPool2d(
                image_size // 32, width * 32, heads, embed_dim
            )

        def forward(self, x):
            x = self.relu(self.bn1(self.conv1(x)))
            x = self.relu(self.bn2(self.conv2(x)))
            x = self.relu(self.bn3(self.conv3(x)))
            x = self.avgpool(x)
            for i in range(len(layers)):
                x = getattr(self, f"layer{i + 1}")(x)
            return self.attnpool(x)

    return ModifiedResNet()


def _randomize_bn_stats(model, seed=0):
    import torch

    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
            m.weight.data.copy_(torch.randn(m.num_features, generator=g) * 0.2 + 1)
            m.bias.data.copy_(torch.randn(m.num_features, generator=g) * 0.1)


WIDTH, LAYERS, EMBED, HEADS, IMG = 8, (1, 1, 1, 1), 16, 2, 64


def test_modified_resnet_forward_parity():
    import torch

    from tair_tpu.utils.clipiqa import ModifiedResNet, ModifiedResNetConfig
    from tair_tpu.weights.convert import convert_clip_rn50_visual

    torch.manual_seed(0)
    tnet = _torch_modified_resnet(WIDTH, LAYERS, EMBED, HEADS, IMG)
    with torch.no_grad():
        _randomize_bn_stats(tnet)
    tnet.eval()

    sd = {f"visual.{k}": v.detach().numpy() for k, v in tnet.state_dict().items()}
    # torch's Sequential inside Bottleneck names AvgPool 'downsample.0' when
    # it's first; our converter expects CLIP's key layout where the conv is
    # downsample.0 (CLIP uses ("-1", AvgPool) so the pool has no state dict
    # entry). With Identity/AvgPool first here, conv lands at downsample.1
    # and bn at downsample.2 -> remap to the CLIP layout.
    remapped = {}
    for k, v in sd.items():
        k = k.replace("downsample.1.", "downsample.0.").replace(
            "downsample.2.", "downsample.1."
        ) if ".downsample." in k else k
        remapped[k] = v
    cfg = ModifiedResNetConfig(
        layers=LAYERS, width=WIDTH, embed_dim=EMBED, heads=HEADS, image_size=IMG
    )
    params = convert_clip_rn50_visual(remapped, cfg)

    rs = np.random.RandomState(1)
    x = rs.rand(2, IMG, IMG, 3).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = ModifiedResNet(cfg).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def _tiny_text_sd(rs, width=8, layers=2, embed=EMBED, vocab=49408):
    sd = {
        "token_embedding.weight": rs.randn(vocab, width) * 0.02,
        "positional_embedding": rs.randn(77, width) * 0.01,
        "ln_final.weight": rs.rand(width) + 0.5,
        "ln_final.bias": rs.randn(width) * 0.1,
        "text_projection": rs.randn(width, embed) * 0.1,
        "logit_scale": np.float32(np.log(100.0)),
    }
    for i in range(layers):
        p = f"transformer.resblocks.{i}"
        sd[f"{p}.ln_1.weight"] = rs.rand(width) + 0.5
        sd[f"{p}.ln_1.bias"] = rs.randn(width) * 0.1
        sd[f"{p}.ln_2.weight"] = rs.rand(width) + 0.5
        sd[f"{p}.ln_2.bias"] = rs.randn(width) * 0.1
        sd[f"{p}.attn.in_proj_weight"] = rs.randn(3 * width, width) * 0.1
        sd[f"{p}.attn.in_proj_bias"] = rs.randn(3 * width) * 0.01
        sd[f"{p}.attn.out_proj.weight"] = rs.randn(width, width) * 0.1
        sd[f"{p}.attn.out_proj.bias"] = rs.randn(width) * 0.01
        sd[f"{p}.mlp.c_fc.weight"] = rs.randn(4 * width, width) * 0.1
        sd[f"{p}.mlp.c_fc.bias"] = rs.randn(4 * width) * 0.01
        sd[f"{p}.mlp.c_proj.weight"] = rs.randn(width, 4 * width) * 0.1
        sd[f"{p}.mlp.c_proj.bias"] = rs.randn(width) * 0.01
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def test_clipiqa_metric_end_to_end():
    import torch

    from tair_tpu.utils.clipiqa import CLIPIQAMetric

    torch.manual_seed(0)
    tnet = _torch_modified_resnet(WIDTH, LAYERS, EMBED, HEADS, IMG)
    with torch.no_grad():
        _randomize_bn_stats(tnet)
    sd = {}
    for k, v in tnet.state_dict().items():
        if ".downsample." in k:
            k = k.replace("downsample.1.", "downsample.0.").replace(
                "downsample.2.", "downsample.1."
            )
        sd[f"visual.{k}"] = v.detach().numpy()
    sd.update(_tiny_text_sd(np.random.RandomState(3)))

    metric = CLIPIQAMetric.from_state_dict(sd)
    rs = np.random.RandomState(5)
    imgs = jnp.asarray(rs.rand(2, IMG, IMG, 3), jnp.float32)
    scores = metric(imgs)
    assert scores.shape == (2,)
    s = np.asarray(scores)
    assert np.isfinite(s).all() and (s > 0).all() and (s < 1).all()
    # deterministic
    np.testing.assert_allclose(np.asarray(metric(imgs)), s, rtol=1e-6)

    # arbitrary input size: both pos-embedding modes must accept non-224
    # grids (interpolated grid embedding / the paper's no-pos-emb variant)
    metric_nopos = CLIPIQAMetric.from_state_dict(sd, pos_embedding="none")
    bigger = jnp.asarray(rs.rand(1, IMG * 2, IMG, 3), jnp.float32)
    for m in (metric, metric_nopos):
        out = np.asarray(m(bigger))
        assert out.shape == (1,) and np.isfinite(out).all()


def test_clipiqa_text_tower_quickgelu_parity():
    """The antonym-prompt embeddings must match a torch mirror of the
    ORIGINAL OpenAI CLIP text transformer — which uses QuickGELU
    (x*sigmoid(1.702x)), not the exact GELU of the SD-2.1 OpenCLIP tower.
    A round-2 review found the text side was built with the wrong
    activation; this pins it."""
    import torch
    from torch import nn

    from tair_tpu.models.tokenizer import tokenize
    from tair_tpu.utils.clipiqa import DEFAULT_PROMPTS, CLIPIQAMetric

    width, layers = 8, 2
    rs = np.random.RandomState(3)
    sd = _tiny_text_sd(rs, width=width, layers=layers)

    # visual side present but unused by this check
    torch.manual_seed(0)
    tnet = _torch_modified_resnet(WIDTH, LAYERS, EMBED, HEADS, IMG)
    for k, v in tnet.state_dict().items():
        if ".downsample." in k:
            k = k.replace("downsample.1.", "downsample.0.").replace(
                "downsample.2.", "downsample.1."
            )
        sd[f"visual.{k}"] = v.detach().numpy()

    metric = CLIPIQAMetric.from_state_dict(sd)

    # torch mirror (OpenAI CLIP model.py text path, QuickGELU MLP)
    tokens = torch.from_numpy(np.asarray(tokenize(list(DEFAULT_PROMPTS))))
    x = torch.from_numpy(sd["token_embedding.weight"]).float()[tokens]
    x = x + torch.from_numpy(sd["positional_embedding"]).float()
    t = x.shape[1]
    causal = torch.full((t, t), float("-inf")).triu(1)
    for i in range(layers):
        p = f"transformer.resblocks.{i}"
        attn = nn.MultiheadAttention(width, 1, batch_first=True)
        with torch.no_grad():
            attn.in_proj_weight.copy_(torch.from_numpy(sd[f"{p}.attn.in_proj_weight"]))
            attn.in_proj_bias.copy_(torch.from_numpy(sd[f"{p}.attn.in_proj_bias"]))
            attn.out_proj.weight.copy_(torch.from_numpy(sd[f"{p}.attn.out_proj.weight"]))
            attn.out_proj.bias.copy_(torch.from_numpy(sd[f"{p}.attn.out_proj.bias"]))

        def ln(name, v):
            return torch.nn.functional.layer_norm(
                v, (width,), torch.from_numpy(sd[f"{p}.{name}.weight"]).float(),
                torch.from_numpy(sd[f"{p}.{name}.bias"]).float(), 1e-5,
            )

        h = ln("ln_1", x)
        with torch.no_grad():
            a, _ = attn(h, h, h, attn_mask=causal, need_weights=False)
        x = x + a
        h = ln("ln_2", x)
        h = h @ torch.from_numpy(sd[f"{p}.mlp.c_fc.weight"]).float().T + torch.from_numpy(
            sd[f"{p}.mlp.c_fc.bias"]).float()
        h = h * torch.sigmoid(1.702 * h)  # QuickGELU
        h = h @ torch.from_numpy(sd[f"{p}.mlp.c_proj.weight"]).float().T + torch.from_numpy(
            sd[f"{p}.mlp.c_proj.bias"]).float()
        x = x + h
    x = torch.nn.functional.layer_norm(
        x, (width,), torch.from_numpy(sd["ln_final.weight"]).float(),
        torch.from_numpy(sd["ln_final.bias"]).float(), 1e-5,
    )
    eot = tokens.argmax(dim=-1)
    pooled = x[torch.arange(x.shape[0]), eot]
    emb = pooled @ torch.from_numpy(sd["text_projection"]).float()
    emb = emb / emb.norm(dim=-1, keepdim=True)

    np.testing.assert_allclose(
        np.asarray(metric.text_emb), emb.detach().numpy(), rtol=1e-4, atol=1e-5
    )

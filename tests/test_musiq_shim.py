"""MUSIQ key-rename shim: published-layout state dicts load unmodified.

Builds the torch mirror from tests/test_musiq.py, re-names its state dict
into two published-style naming families (a BiT/timm-flavored fused-qkv
layout and an HF-flavored separate-q/k/v layout), and asserts that
MUSIQMetric.from_state_dict produces bit-identical scores to the direct
repo-layout load — i.e. the shim is a pure renaming. Also pins the loud
failure mode for unknown layouts. Reference consumer:
/root/reference/val.py:68-75 (pyiqa musiq).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from tair_tpu.utils.musiq import MUSIQMetric  # noqa: E402
from tair_tpu.weights.musiq_shim import (  # noqa: E402
    shim_musiq_state_dict,
)
from tests.test_musiq import _tiny_cfg, _torch_musiq  # noqa: E402

# repo-layout key -> BiT/timm-flavored published naming (fused qkv,
# top-level patch-encoder modules, transformer.* backbone)
_TO_BIT = {
    "patch_encoder.root.weight": "conv_root.weight",
    "patch_encoder.root_gn.": "gn_root.",
    "patch_encoder.block1.proj.weight": "block1.downsample.weight",
    "patch_encoder.block1.": "block1.",
    "patch_encoder.out_gn.": "gn_out.",
    "patch_encoder.embedding.": "embedding.",
    "backbone.cls_token": "cls_token",
    "backbone.spatial_embedding": "pos_embed",
    "backbone.scale_embedding": "scale_embed",
    "backbone.blocks.": "transformer.blocks.",
    "backbone.encoder_norm.": "transformer.norm.",
    "backbone.head.": "fc_score.",
}
_BIT_LEAF = {
    ".norm1.": ".ln_1.",
    ".norm2.": ".ln_2.",
    ".attn.proj.": ".attn.out_proj.",
    ".mlp.fc1.": ".linear1.",
    ".mlp.fc2.": ".linear2.",
}


def _rename(sd, table, leaf_table=None):
    out = {}
    for k, v in sd.items():
        nk = k
        for src, dst in table.items():
            if nk.startswith(src):
                nk = dst + nk[len(src):]
                break
        for src, dst in (leaf_table or {}).items():
            nk = nk.replace(src, dst)
        out[nk] = v
    return out


def _as_bit_layout(sd):
    return {f"module.{k}": v for k, v in _rename(sd, _TO_BIT, _BIT_LEAF).items()}


def _as_hf_layout(sd):
    """HF-flavored: encoder.layer.N, layernorm_before/after, separate
    query/key/value, attention.output.dense, intermediate/output dense."""
    import torch

    out = {}
    for k, v in sd.items():
        if k.startswith("backbone.blocks."):
            rest = k[len("backbone.blocks."):]
            i, leaf = rest.split(".", 1)
            p = f"encoder.layer.{i}."
            if leaf.startswith("norm1."):
                out[p + "layernorm_before." + leaf[6:]] = v
            elif leaf.startswith("norm2."):
                out[p + "layernorm_after." + leaf[6:]] = v
            elif leaf.startswith("attn.qkv."):
                d = v.shape[0] // 3
                for j, name in enumerate(("query", "key", "value")):
                    out[p + f"attention.{name}." + leaf[9:]] = v[j * d:(j + 1) * d]
            elif leaf.startswith("attn.proj."):
                out[p + "attention.output.dense." + leaf[10:]] = v
            elif leaf.startswith("mlp.fc1."):
                out[p + "intermediate.dense." + leaf[8:]] = v
            elif leaf.startswith("mlp.fc2."):
                out[p + "output.dense." + leaf[8:]] = v
            else:  # pragma: no cover
                raise AssertionError(f"unmapped block leaf {leaf}")
        else:
            nk = _rename({k: v}, {
                "patch_encoder.root.weight": "stem.conv.weight",
                "patch_encoder.root_gn.": "stem.norm.",
                "patch_encoder.block1.proj.weight": "layer1.0.downsample.0.weight",
                "patch_encoder.block1.": "layer1.0.",
                "patch_encoder.out_gn.": "norm_out.",
                "patch_encoder.embedding.": "patch_embedding.",
                "backbone.cls_token": "cls_token",
                "backbone.spatial_embedding": "position_embedding",
                "backbone.scale_embedding": "scale_embedding",
                "backbone.encoder_norm.": "encoder_norm.",
                "backbone.head.": "classifier.",
            })
            out.update(nk)
    # torch slicing above keeps tensors; ensure plain tensor types
    return {k: torch.as_tensor(np.asarray(v)) for k, v in out.items()}


@pytest.fixture(scope="module")
def mirror():
    import torch

    cfg = _tiny_cfg()
    net = _torch_musiq(cfg)
    sd = {k: torch.as_tensor(v.detach().numpy())
          for k, v in net.state_dict().items()}
    ref = MUSIQMetric.from_state_dict(sd, scales=(64,))
    x = jnp.asarray(
        np.random.RandomState(7).rand(2, 70, 100, 3).astype(np.float32)
    )
    return cfg, sd, np.asarray(ref(x)), x


def test_shim_passthrough_repo_layout(mirror):
    _, sd, _, _ = mirror
    shimmed = shim_musiq_state_dict(sd)
    assert set(shimmed) == {k for k in sd}


@pytest.mark.parametrize("layout", ["bit", "hf"])
def test_shim_published_layouts_load_identically(mirror, layout):
    cfg, sd, ref_scores, x = mirror
    renamed = _as_bit_layout(sd) if layout == "bit" else _as_hf_layout(sd)
    # sanity: the rename really produced a foreign layout
    assert "patch_encoder.root.weight" not in renamed
    metric = MUSIQMetric.from_state_dict(renamed, scales=(64,))
    assert metric.cfg.hidden == cfg.hidden and metric.cfg.layers == cfg.layers
    got = np.asarray(metric(x))
    np.testing.assert_allclose(got, ref_scores, atol=1e-5, rtol=1e-5)


def test_shim_unknown_layout_fails_loudly(mirror):
    _, sd, _, _ = mirror
    bad = {f"mystery.{k}": v for k, v in sd.items()}
    with pytest.raises(ValueError, match="could not classify"):
        shim_musiq_state_dict(bad)


def test_shim_partial_qkv_fails(mirror):
    _, sd, _, _ = mirror
    hf = _as_hf_layout(sd)
    hf.pop("encoder.layer.0.attention.value.weight")
    with pytest.raises(ValueError, match="(partial|could not classify|unfilled)"):
        shim_musiq_state_dict(hf)

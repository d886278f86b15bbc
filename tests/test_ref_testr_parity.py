"""Forward parity: our TESTR (Flax, static shapes) vs the REFERENCE TESTR
(/root/reference/testr/adet/modeling/testr/models.py:27-185 + the
deformable transformer at adet/layers/deformable_transformer.py), loaded
with the compiled CUDA msda routed through the reference's own pure-torch
`ms_deform_attn_core_pytorch` (tests/ref_loader.py).

Pins, against real reference weights: diff_feat_proj, 2D/1D sine positional
encodings, the 6-level deformable encoder, two-stage proposal generation
(top-k + pos_trans), the composite decoder (intra/inter/cross for points and
text), shared prediction heads, aux outputs, and encoder outputs.

Reference TESTR hardcodes d_model=256 (PositionalEncoding2D(128) -> 256
channels) and tap channels [1280,1280,640,320] (models.py:76,114), so the
tiny geometry keeps those and shrinks the spatial dims / layer counts.
"""

import sys
import types

import numpy as np
import pytest
import torch

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ref_loader import load_testr_layers  # noqa: E402


def _fake_cfg():
    tr = types.SimpleNamespace(
        HIDDEN_DIM=256,
        NHEADS=8,
        ENC_LAYERS=1,
        DEC_LAYERS=2,
        DIM_FEEDFORWARD=64,
        DROPOUT=0.0,
        NUM_FEATURE_LEVELS=4,
        ENC_N_POINTS=4,
        DEC_N_POINTS=4,
        NUM_QUERIES=10,
        POSITION_EMBEDDING_SCALE=2 * np.pi,
        NUM_CTRL_POINTS=16,
        NUM_CHARS=25,
        VOC_SIZE=96,
        USE_POLYGON=True,
        AUX_LOSS=True,
    )
    return types.SimpleNamespace(
        MODEL=types.SimpleNamespace(DEVICE="cpu", TRANSFORMER=tr)
    )


def _load_ref_testr():
    load_testr_layers()  # registers testr.adet.* with _C shimmed
    import importlib

    for name, path in (
        ("testr.adet.modeling", "/root/reference/testr/adet/modeling"),
        ("testr.adet.modeling.testr", "/root/reference/testr/adet/modeling/testr"),
    ):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [path]
            pkg.__package__ = name
            sys.modules[name] = pkg
    return importlib.import_module("testr.adet.modeling.testr.models")


def _randomize(mod, seed=0, scale=0.05):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in mod.parameters():
            p.copy_(torch.randn(p.shape, generator=g, dtype=torch.float32) * scale)
    mod.eval()
    return mod


def test_testr_forward_parity_with_reference():
    models = _load_ref_testr()
    ref = _randomize(models.TESTR(_fake_cfg()), seed=6)

    from tair_tpu.spotter.testr import TESTR, TESTRConfig
    from tair_tpu.weights.convert import _cast_like, convert_testr

    cfg = TESTRConfig(
        d_model=256, n_heads=8, num_encoder_layers=1, num_decoder_layers=2,
        dim_feedforward=64, num_proposals=10, num_ctrl_points=16,
        num_chars=25, voc_size=96, in_channels=(1280, 1280, 640, 320),
    )
    model = TESTR(cfg)

    rng = np.random.default_rng(5)
    sizes = [(2, 2), (4, 4), (8, 8), (8, 8)]
    feats_nhwc = [
        rng.normal(size=(1, h, w, c)).astype(np.float32)
        for (h, w), c in zip(sizes, cfg.in_channels)
    ]

    with torch.no_grad():
        ref_out = ref(
            [torch.from_numpy(np.transpose(f, (0, 3, 1, 2))) for f in feats_nhwc]
        )

    sd = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}
    params, reader = convert_testr(sd, cfg, prefix="")
    assert reader.missing == set(), sorted(reader.missing)
    # aliases of already-converted modules: the shared heads are repeated per
    # decoder layer (models.py:103-106) and bbox heads are registered BOTH
    # top-level and on the transformer (models.py:110-111)
    leftovers = {
        k for k in reader.unused()
        if not any(
            k.startswith(p)
            for p in (
                "ctrl_point_class.1", "ctrl_point_coord.1",
                "transformer.bbox_embed.", "transformer.bbox_class_embed.",
                # deterministic sine-frequency buffer, not a weight
                "text_pos_embed.inv_freq",
            )
        )
    }
    assert leftovers == set(), sorted(leftovers)

    jfeats = tuple(jnp.asarray(f) for f in feats_nhwc)
    tmpl = model.init(jax.random.PRNGKey(0), jfeats)["params"]
    params = _cast_like(params, tmpl)
    out = model.apply({"params": params}, jfeats)

    def close(a, t, name, atol=3e-4):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), t.detach().cpu().numpy(),
            atol=atol, rtol=3e-3, err_msg=name,
        )

    close(out["pred_logits"], ref_out["pred_logits"], "pred_logits")
    close(out["pred_ctrl_points"], ref_out["pred_ctrl_points"], "ctrl_points")
    close(out["pred_texts"], ref_out["pred_texts"], "pred_texts")
    assert len(out["aux_outputs"]) == len(ref_out["aux_outputs"]) == 1
    for ours, theirs in zip(out["aux_outputs"], ref_out["aux_outputs"]):
        close(ours["pred_logits"], theirs["pred_logits"], "aux logits")
        close(ours["pred_ctrl_points"], theirs["pred_ctrl_points"], "aux pts")
        close(ours["pred_texts"], theirs["pred_texts"], "aux texts")
    close(
        out["enc_outputs"]["pred_logits"],
        ref_out["enc_outputs"]["pred_logits"], "enc logits",
    )
    close(
        out["enc_outputs"]["pred_boxes"],
        ref_out["enc_outputs"]["pred_boxes"], "enc boxes",
    )

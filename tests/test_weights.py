import jax
import jax.numpy as jnp
import numpy as np

from tair_tpu.models.unet import ControlNet, UNetConfig, UNetModel
from tair_tpu.weights.convert import (
    _cast_like,
    controlnet_from_unet,
    convert_unet,
)
from tair_tpu.weights.export import export_unet

TINY = UNetConfig(
    model_channels=32, num_head_channels=16, context_dim=64
)


def _init_unet(cfg, key=0):
    model = UNetModel(cfg)
    x = jnp.zeros((1, 16, 16, cfg.in_channels))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 77, cfg.context_dim))
    return model, model.init(jax.random.PRNGKey(key), x, t, ctx)["params"]


def test_unet_convert_roundtrip():
    """convert(export(params)) must reproduce params exactly and consume
    every torch key — validates the full UNet mapping table."""
    _, params = _init_unet(TINY)
    sd = export_unet(params, TINY, prefix="model.diffusion_model.")
    converted, reader = convert_unet(sd, TINY, prefix="model.diffusion_model.")
    assert reader.unused() == set()
    assert reader.missing == set()

    converted = _cast_like(converted, params)
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(converted)[0])
    assert len(flat_a) == len(flat_b)
    for path, v in flat_a:
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(flat_b[path]), err_msg=str(path)
        )


def test_converted_unet_output_matches():
    """Forward outputs through converted weights equal the originals."""
    model, params = _init_unet(TINY, key=3)
    sd = export_unet(params, TINY)
    converted, _ = convert_unet(sd, TINY)
    converted = _cast_like(converted, params)

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    t = jnp.array([7])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 64))
    a = model.apply({"params": params}, x, t, ctx)
    b = model.apply({"params": converted}, x, t, ctx)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_controlnet_from_unet_zero_pad_init():
    """ControlNet init from UNet: matching shapes copied; the hint-extended
    input conv zero-pads the extra channels; zero convs remain zero
    (cldm.py:64-90 semantics)."""
    model, uparams = _init_unet(TINY)
    cnet = ControlNet(TINY)
    x = jnp.zeros((1, 16, 16, 4))
    cparams = cnet.init(
        jax.random.PRNGKey(1), x, x, jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 64)),
    )["params"]

    merged = controlnet_from_unet(uparams, cparams)

    # input conv: first 4 input channels equal the unet's, rest zero
    uk = np.asarray(uparams["in_conv"]["kernel"])      # [3,3,4,32]
    mk = np.asarray(merged["in_conv"]["kernel"])       # [3,3,8,32]
    np.testing.assert_array_equal(mk[:, :, :4], uk)
    np.testing.assert_array_equal(mk[:, :, 4:], 0.0)
    # a deep shared block copied exactly
    np.testing.assert_array_equal(
        np.asarray(merged["in_1"]["res"]["in_conv"]["kernel"]),
        np.asarray(uparams["in_1"]["res"]["in_conv"]["kernel"]),
    )
    # zero convs still zero
    np.testing.assert_array_equal(np.asarray(merged["zero_1"]["kernel"]), 0.0)
    # and the controlled forward with this init is a no-op vs plain unet
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 64))
    xr = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 4))
    t = jnp.array([5])
    control = cnet.apply({"params": merged}, xr, xr, t, ctx)
    base = model.apply({"params": uparams}, xr, t, ctx)
    controlled = model.apply({"params": uparams}, xr, t, ctx, control=control)
    np.testing.assert_allclose(
        np.asarray(controlled), np.asarray(base), atol=1e-6
    )


# ---------------------------------------------------------------------------
# VAE / CLIP / SwinIR / TESTR round trips (same pattern as the UNet one)
# ---------------------------------------------------------------------------

def _assert_tree_equal(converted, params):
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(converted)[0])
    missing = [str(p) for p, _ in flat_a if p not in flat_b]
    extra = [str(p) for p in flat_b if p not in dict(flat_a)]
    assert not missing and not extra, f"missing={missing} extra={extra}"
    for path, v in flat_a:
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(flat_b[path]), err_msg=str(path)
        )


def test_vae_convert_roundtrip():
    from tair_tpu.models.vae import AutoencoderKL, VAEConfig
    from tair_tpu.weights.convert import convert_vae
    from tair_tpu.weights.export import export_vae

    cfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    model = AutoencoderKL(cfg)
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    sd = export_vae(params, cfg, prefix="first_stage_model.")
    converted, reader = convert_vae(sd, cfg, prefix="first_stage_model.")
    assert reader.unused() == set()
    assert reader.missing == set()
    _assert_tree_equal(converted, params)

    # and a forward check through the converted weights
    xr = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
    a = model.apply({"params": params}, xr)[0]
    b = model.apply({"params": jax.tree.map(jnp.asarray, converted)}, xr)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_clip_convert_roundtrip():
    from tair_tpu.models.clip import CLIPTextConfig, CLIPTextTower
    from tair_tpu.weights.convert import convert_clip
    from tair_tpu.weights.export import export_clip

    cfg = CLIPTextConfig(
        context_length=8, vocab_size=64, width=32, heads=4, layers=3
    )
    model = CLIPTextTower(cfg)
    toks = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), toks)["params"]

    sd = export_clip(params, cfg, prefix="cond_stage_model.model.")
    converted, reader = convert_clip(sd, cfg, prefix="cond_stage_model.model.")
    assert reader.unused() == set()
    assert reader.missing == set()
    _assert_tree_equal(converted, params)

    toks = jnp.asarray([[1, 5, 9, 2, 0, 0, 0, 63]], jnp.int32)
    a = model.apply({"params": params}, toks)
    b = model.apply({"params": jax.tree.map(jnp.asarray, converted)}, toks)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_swinir_convert_roundtrip():
    from tair_tpu.models.swinir import SwinIR, SwinIRConfig
    from tair_tpu.weights.convert import convert_swinir
    from tair_tpu.weights.export import export_swinir

    cfg = SwinIRConfig(
        embed_dim=16, depths=(2, 2), num_heads=(2, 2), window_size=2,
        num_feat=8,
    )
    model = SwinIR(cfg)
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    # exercise the reference's DDP "module." prefix strip (initialize.py:110-118)
    sd = {f"module.{k}": v for k, v in export_swinir(params, cfg).items()}
    converted, reader = convert_swinir(sd, cfg)
    assert reader.unused() == set()
    assert reader.missing == set()
    _assert_tree_equal(converted, params)

    xr = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3))
    a = model.apply({"params": params}, xr)
    b = model.apply({"params": jax.tree.map(jnp.asarray, converted)}, xr)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_testr_convert_roundtrip():
    from tair_tpu.spotter.testr import TESTR, TESTRConfig
    from tair_tpu.weights.convert import convert_testr
    from tair_tpu.weights.export import export_testr

    cfg = TESTRConfig(
        d_model=32, n_heads=4, num_encoder_layers=2, num_decoder_layers=2,
        dim_feedforward=32, num_feature_levels=2, num_proposals=8,
        num_ctrl_points=4, num_chars=5, voc_size=10, in_channels=(8, 8),
    )
    model = TESTR(cfg)
    feats = (jnp.zeros((1, 8, 8, 8)), jnp.zeros((1, 4, 4, 8)))
    params = model.init(jax.random.PRNGKey(0), feats)["params"]

    sd = export_testr(params, cfg)
    converted, reader = convert_testr(sd, cfg)
    assert reader.unused() == set()
    assert reader.missing == set()
    _assert_tree_equal(converted, params)

    feats = tuple(
        jax.random.normal(jax.random.PRNGKey(i + 1), f.shape) for i, f in enumerate(feats)
    )
    a = model.apply({"params": params}, feats)["pred_logits"]
    b = model.apply(
        {"params": jax.tree.map(jnp.asarray, converted)}, feats
    )["pred_logits"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_load_torch_file_pkl(tmp_path):
    """detectron2 .pkl checkpoints (pickled numpy dicts) load like torch."""
    import pickle

    import numpy as np

    from tair_tpu.weights.convert import load_torch_file

    sd = {"model": {"a.weight": np.ones((2, 3), np.float32),
                    "b.bias": np.zeros((4,), np.float32)}}
    p = str(tmp_path / "ckpt.pkl")
    with open(p, "wb") as f:
        pickle.dump(sd, f)
    out = load_torch_file(p)
    assert set(out) == {"a.weight", "b.bias"}
    np.testing.assert_array_equal(out["a.weight"], np.ones((2, 3)))

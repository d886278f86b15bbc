"""Forward-parity goldens: our Flax models + convert_weights vs the REAL
reference torch modules (/root/reference/terediff/model/*.py), randomly
initialized, exported with the real key layout, converted, and compared.

This closes the round-1 circularity (converter tests previously validated
against our own export.py). Each test:
  1. builds the reference torch module at tiny geometry, seeds all
     *parameters* with randn*0.02 (buffers like CLIP's causal mask kept),
  2. state_dict() -> numpy -> our convert_* -> Flax params,
  3. runs both forwards on the same input (fp32, CPU) and asserts
     agreement to float32 tolerance.

Reference anchors: unet.py:361-719, controlnet.py:16-337, vae.py:562-591,
clip.py:8-48, cldm.py:37-55 (key layout).
"""

import numpy as np
import pytest
import torch

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ref_loader import ref_module  # noqa: E402


def _randomize(mod: torch.nn.Module, seed: int = 0, scale: float = 0.02):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in mod.parameters():
            p.copy_(torch.randn(p.shape, generator=g, dtype=torch.float32) * scale)
    mod.eval()
    return mod


def _sd_numpy(mod: torch.nn.Module):
    return {k: v.detach().cpu().numpy() for k, v in mod.state_dict().items()}


def _nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _to_nhwc(t: torch.Tensor) -> np.ndarray:
    return np.transpose(t.detach().cpu().numpy(), (0, 2, 3, 1))


UNET_KW = dict(
    image_size=32,
    in_channels=4,
    model_channels=32,
    out_channels=4,
    num_res_blocks=2,
    attention_resolutions=(4, 2, 1),
    channel_mult=(1, 2, 4, 4),
    num_head_channels=16,
    use_spatial_transformer=True,
    use_linear_in_transformer=True,
    transformer_depth=1,
    context_dim=64,
    legacy=False,
)


def _our_unet_cfg():
    from tair_tpu.models.unet import UNetConfig

    return UNetConfig(
        model_channels=32, num_head_channels=16, context_dim=64
    )


def test_unet_forward_parity_with_reference():
    ref_controlnet = ref_module("controlnet")
    ref = _randomize(ref_controlnet.ControlledUnetModel(**UNET_KW), seed=1)

    from tair_tpu.models.unet import UNetModel
    from tair_tpu.weights.convert import _cast_like, convert_unet

    cfg = _our_unet_cfg()
    model = UNetModel(cfg)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 16, 16, 4)).astype(np.float32)
    t = np.array([7], np.int64)
    ctx = rng.normal(size=(1, 77, 64)).astype(np.float32)

    with torch.no_grad():
        ref_eps, ref_feats = ref(
            _nchw(x), timesteps=torch.from_numpy(t),
            context=torch.from_numpy(ctx),
        )

    params, reader = convert_unet(_sd_numpy(ref), cfg, prefix="")
    assert reader.missing == set(), sorted(reader.missing)
    assert reader.unused() == set(), sorted(reader.unused())
    tmpl = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t, jnp.int32),
        jnp.asarray(ctx),
    )["params"]
    params = _cast_like(params, tmpl)

    eps, feats = model.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(t, jnp.int32),
        jnp.asarray(ctx), extract_features=True,
    )
    np.testing.assert_allclose(
        np.asarray(eps), _to_nhwc(ref_eps), atol=2e-4, rtol=2e-3
    )
    assert len(feats) == len(ref_feats) == 4
    for ours, theirs in zip(feats, ref_feats):
        np.testing.assert_allclose(
            np.asarray(ours), _to_nhwc(theirs), atol=2e-4, rtol=2e-3
        )


def test_controlnet_forward_parity_with_reference():
    ref_controlnet = ref_module("controlnet")
    kw = dict(UNET_KW)
    kw.pop("out_channels")
    ref = _randomize(ref_controlnet.ControlNet(hint_channels=4, **kw), seed=2)

    from tair_tpu.models.unet import ControlNet
    from tair_tpu.weights.convert import _cast_like, convert_controlnet

    cfg = _our_unet_cfg()
    model = ControlNet(cfg)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 16, 16, 4)).astype(np.float32)
    hint = rng.normal(size=(1, 16, 16, 4)).astype(np.float32)
    t = np.array([3], np.int64)
    ctx = rng.normal(size=(1, 77, 64)).astype(np.float32)

    with torch.no_grad():
        ref_outs = ref(
            _nchw(x), _nchw(hint), timesteps=torch.from_numpy(t),
            context=torch.from_numpy(ctx),
        )

    params, reader = convert_controlnet(_sd_numpy(ref), cfg, prefix="")
    assert reader.missing == set(), sorted(reader.missing)
    assert reader.unused() == set(), sorted(reader.unused())
    tmpl = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(hint),
        jnp.asarray(t, jnp.int32), jnp.asarray(ctx),
    )["params"]
    params = _cast_like(params, tmpl)

    outs = model.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(hint),
        jnp.asarray(t, jnp.int32), jnp.asarray(ctx),
    )
    assert len(outs) == len(ref_outs) == 13
    for ours, theirs in zip(outs, ref_outs):
        np.testing.assert_allclose(
            np.asarray(ours), _to_nhwc(theirs), atol=2e-4, rtol=2e-3
        )


def test_vae_forward_parity_with_reference():
    ref_vae = ref_module("vae")
    ddconfig = dict(
        double_z=True, z_channels=4, resolution=64, in_channels=3,
        out_ch=3, ch=32, ch_mult=(1, 2), num_res_blocks=1,
        attn_resolutions=(), dropout=0.0,
    )
    ref = _randomize(ref_vae.AutoencoderKL(ddconfig, embed_dim=4), seed=3)

    from tair_tpu.models.vae import AutoencoderKL, VAEConfig
    from tair_tpu.weights.convert import _cast_like, convert_vae

    cfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    model = AutoencoderKL(cfg)
    rng = np.random.default_rng(2)
    img = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        post = ref.encode(_nchw(img))
        ref_mean = post.mean
        ref_logvar = post.logvar
        ref_dec = ref.decode(post.mode())

    params, reader = convert_vae(_sd_numpy(ref), cfg, prefix="")
    assert reader.missing == set(), sorted(reader.missing)
    assert reader.unused() == set(), sorted(reader.unused())
    tmpl = model.init(jax.random.PRNGKey(0), jnp.asarray(img))["params"]
    params = _cast_like(params, tmpl)

    mean, logvar = model.apply(
        {"params": params}, jnp.asarray(img),
        method=AutoencoderKL.encode_moments,
    )
    np.testing.assert_allclose(
        np.asarray(mean), _to_nhwc(ref_mean), atol=2e-4, rtol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(logvar), _to_nhwc(ref_logvar), atol=2e-4, rtol=2e-3
    )
    dec = model.apply(
        {"params": params}, mean, method=AutoencoderKL.decode
    )
    np.testing.assert_allclose(
        np.asarray(dec), _to_nhwc(ref_dec), atol=5e-4, rtol=2e-3
    )


def test_swinir_forward_parity_with_reference():
    """TAIR geometry scaled down: pixel-unshuffle x8 input, nearest+conv x8
    upsampler (configs/train/train_stage1_terediff.yaml swinir params)."""
    ref_swinir = ref_module("swinir")
    ref = _randomize(
        ref_swinir.SwinIR(
            img_size=4, patch_size=1, in_chans=3, embed_dim=16,
            depths=[2, 2], num_heads=[2, 2], window_size=4, mlp_ratio=2.0,
            drop_path_rate=0.0, sf=8, img_range=1.0,
            upsampler="nearest+conv", resi_connection="1conv",
            unshuffle=True, unshuffle_scale=8,
        ),
        seed=5,
    )

    from tair_tpu.models.swinir import SwinIR, SwinIRConfig
    from tair_tpu.weights.convert import _cast_like, convert_swinir

    cfg = SwinIRConfig(
        embed_dim=16, depths=(2, 2), num_heads=(2, 2), window_size=4,
        mlp_ratio=2.0, sf=8, unshuffle=True, unshuffle_scale=8, num_feat=64,
    )
    model = SwinIR(cfg)
    rng = np.random.default_rng(4)
    img = rng.uniform(size=(1, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(_nchw(img))

    params, reader = convert_swinir(_sd_numpy(ref), cfg, prefix="")
    assert reader.missing == set(), sorted(reader.missing)
    leftovers = {
        k for k in reader.unused()
        # buffers that aren't learned weights: rgb mean, swin attn masks/index
        if not k.endswith(("attn_mask", "relative_position_index"))
        and k != "mean"
    }
    assert leftovers == set(), sorted(leftovers)
    tmpl = model.init(jax.random.PRNGKey(0), jnp.asarray(img))["params"]
    params = _cast_like(params, tmpl)

    out = model.apply({"params": params}, jnp.asarray(img))
    np.testing.assert_allclose(
        np.asarray(out), _to_nhwc(ref_out), atol=5e-4, rtol=2e-3
    )


def test_bsrnet_forward_parity_with_reference():
    """DiffBIR's BSRNet stage-1 cleaner (bsrnet.py:75-104, x4)."""
    ref_bsrnet = ref_module("bsrnet")
    ref = _randomize(ref_bsrnet.RRDBNet(nf=8, nb=2, gc=4, sf=4), seed=7)

    from tair_tpu.models.cleaners import RRDBNet, RRDBNetConfig
    from tair_tpu.weights.convert import _cast_like, convert_bsrnet

    cfg = RRDBNetConfig(nf=8, nb=2, gc=4, sf=4)
    model = RRDBNet(cfg)
    rng = np.random.default_rng(6)
    img = rng.uniform(size=(1, 16, 16, 3)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(_nchw(img))

    params, reader = convert_bsrnet(_sd_numpy(ref), cfg, prefix="")
    assert reader.missing == set(), sorted(reader.missing)
    assert reader.unused() == set(), sorted(reader.unused())
    tmpl = model.init(jax.random.PRNGKey(0), jnp.asarray(img))["params"]
    params = _cast_like(params, tmpl)

    out = model.apply({"params": params}, jnp.asarray(img))
    np.testing.assert_allclose(
        np.asarray(out), _to_nhwc(ref_out), atol=5e-4, rtol=2e-3
    )


def test_scunet_forward_parity_with_reference():
    """DiffBIR's SCUNet denoiser (scunet.py:163-264; head_dim=32 and
    window=8 are hardcoded there, so dim=64 is the smallest geometry)."""
    ref_scunet = ref_module("scunet")
    ref = _randomize(
        ref_scunet.SCUNet(in_nc=3, config=[1] * 7, dim=64), seed=8
    )

    from tair_tpu.models.cleaners import SCUNet, SCUNetConfig
    from tair_tpu.weights.convert import _cast_like, convert_scunet

    cfg = SCUNetConfig(dim=64, config=(1,) * 7)
    model = SCUNet(cfg)
    rng = np.random.default_rng(7)
    img = rng.uniform(size=(1, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(_nchw(img))

    params, reader = convert_scunet(_sd_numpy(ref), cfg, prefix="")
    assert reader.missing == set(), sorted(reader.missing)
    assert reader.unused() == set(), sorted(reader.unused())
    tmpl = model.init(jax.random.PRNGKey(0), jnp.asarray(img))["params"]
    params = _cast_like(params, tmpl)

    out = model.apply({"params": params}, jnp.asarray(img))
    np.testing.assert_allclose(
        np.asarray(out), _to_nhwc(ref_out), atol=5e-4, rtol=2e-3
    )


def test_clip_forward_parity_with_reference():
    ref_clip = ref_module("clip")
    vision_cfg = dict(layers=1, width=8, head_width=8, patch_size=16, image_size=32)
    text_cfg = dict(context_length=77, vocab_size=128, width=64, heads=4, layers=3)
    ref = _randomize(
        ref_clip.FrozenOpenCLIPEmbedder(
            embed_dim=64, vision_cfg=vision_cfg, text_cfg=text_cfg,
            layer="penultimate",
        ),
        seed=4,
    )

    from tair_tpu.models.clip import CLIPTextConfig, CLIPTextTower
    from tair_tpu.weights.convert import _cast_like, convert_clip

    cfg = CLIPTextConfig(
        vocab_size=128, width=64, heads=4, layers=3, layer="penultimate"
    )
    model = CLIPTextTower(cfg)
    rng = np.random.default_rng(3)
    tokens = rng.integers(0, 128, size=(2, 77)).astype(np.int64)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(tokens))

    # FrozenOpenCLIPEmbedder state keys live under "model."; the penultimate
    # layer never runs, so its weights legitimately stay unused
    sd = _sd_numpy(ref)
    params, reader = convert_clip(sd, cfg, prefix="model.")
    assert reader.missing == set(), sorted(reader.missing)
    # logit_scale/text_projection belong to the contrastive head the
    # reference never calls from FrozenOpenCLIPEmbedder either
    leftovers = {
        k for k in reader.unused()
        if "resblocks.2." not in k
        and k not in ("model.logit_scale", "model.text_projection")
    }
    assert leftovers == set(), sorted(leftovers)
    tmpl = model.init(jax.random.PRNGKey(0), jnp.asarray(tokens, jnp.int32))[
        "params"
    ]
    params = _cast_like(params, tmpl)

    out = model.apply({"params": params}, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(
        np.asarray(out), ref_out.detach().cpu().numpy(), atol=2e-4, rtol=2e-3
    )

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

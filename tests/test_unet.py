import jax
import jax.numpy as jnp
import numpy as np

from tair_tpu.models.unet import ControlNet, UNetConfig, UNetModel

TINY = UNetConfig(
    in_channels=4,
    out_channels=4,
    model_channels=32,
    num_res_blocks=2,
    attention_resolutions=(4, 2, 1),
    channel_mult=(1, 2, 4, 4),
    num_head_channels=16,
    context_dim=64,
)

SD21 = UNetConfig()  # defaults mirror the SD-2.1 config used by TAIR


def test_extract_idx():
    assert SD21.extract_idx == (2, 5, 8, 11)


def _init_and_run(cfg, extract=False, control=None):
    model = UNetModel(cfg)
    x = jnp.zeros((1, 16, 16, cfg.in_channels))
    t = jnp.array([10])
    ctx = jnp.zeros((1, 77, cfg.context_dim))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)
    return model.apply(params, x, t, ctx, control=control, extract_features=extract)


def test_unet_forward_shape():
    eps = _init_and_run(TINY)
    assert eps.shape == (1, 16, 16, 4)


def test_unet_feature_taps():
    eps, feats = _init_and_run(TINY, extract=True)
    assert eps.shape == (1, 16, 16, 4)
    # latent 16x16 -> taps after output blocks (2,5,8,11), each including its
    # trailing upsample: (4x,8x,16x,16x spatial), channels (4m, 4m, 2m, m)
    m = TINY.model_channels
    shapes = [f.shape for f in feats]
    assert shapes == [
        (1, 4, 4, 4 * m),
        (1, 8, 8, 4 * m),
        (1, 16, 16, 2 * m),
        (1, 16, 16, m),
    ]


def test_controlnet_and_controlled_unet():
    cfg = TINY
    cnet = ControlNet(cfg)
    x = jnp.zeros((1, 16, 16, 4))
    hint = jnp.zeros((1, 16, 16, cfg.hint_channels))
    t = jnp.array([10])
    ctx = jnp.zeros((1, 77, cfg.context_dim))
    cparams = cnet.init(jax.random.PRNGKey(1), x, hint, t, ctx)
    control = cnet.apply(cparams, x, hint, t, ctx)
    assert len(control) == 13

    eps, feats = _init_and_run(cfg, extract=True, control=control)
    assert eps.shape == (1, 16, 16, 4)
    assert len(feats) == 4


def test_zero_init_makes_controlnet_noop_at_init():
    """Zero convs mean a fresh ControlNet must not change the UNet output."""
    cfg = TINY
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 16, 16, 4))
    t = jnp.array([3])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, cfg.context_dim))

    model = UNetModel(cfg)
    params = model.init(jax.random.PRNGKey(3), x, t, ctx)
    base = model.apply(params, x, t, ctx)

    cnet = ControlNet(cfg)
    cparams = cnet.init(jax.random.PRNGKey(4), x, x, t, ctx)
    control = cnet.apply(cparams, x, x, t, ctx)
    for c in control:
        np.testing.assert_array_equal(np.asarray(c), 0.0)
    controlled = model.apply(params, x, t, ctx, control=control)
    np.testing.assert_allclose(np.asarray(controlled), np.asarray(base), atol=1e-6)


def test_sd21_shapes_via_eval_shape():
    """Full SD-2.1 geometry without allocating params: abstract eval only."""
    model = UNetModel(SD21)
    x = jax.ShapeDtypeStruct((1, 64, 64, 4), jnp.float32)
    t = jax.ShapeDtypeStruct((1,), jnp.int32)
    ctx = jax.ShapeDtypeStruct((1, 77, 1024), jnp.float32)

    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, t, ctx)
    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(variables))
    # SD-2.1 UNet is ~865M params
    assert 8.0e8 < n_params < 9.3e8

    out = jax.eval_shape(
        lambda v, x, t, c: model.apply(v, x, t, c, extract_features=True),
        variables, x, t, ctx,
    )
    eps, feats = out
    assert eps.shape == (1, 64, 64, 4)
    assert [f.shape for f in feats] == [
        (1, 16, 16, 1280),
        (1, 32, 32, 1280),
        (1, 64, 64, 640),
        (1, 64, 64, 320),
    ]

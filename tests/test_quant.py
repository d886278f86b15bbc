"""w8a8 serving quantization (ops/quant.py + ControlLDM.quantized).

The knob must be a pure serving approximation: param tree identical, exact
path untouched when off (default), zero-init convs still exactly zero, and
the quantized forward close to the bf16 one at random-init scales.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tair_tpu.models.cldm import ControlLDM
from tair_tpu.models.unet import UNetConfig
from tair_tpu.models.vae import VAEConfig
from tair_tpu.models.clip import CLIPTextConfig
from tair_tpu.ops import quant

TINY_UNET = UNetConfig(
    model_channels=32, num_head_channels=16, context_dim=64,
    channel_mult=(1, 2), num_res_blocks=1, attention_resolutions=(2,),
)
TINY_VAE = VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1)
TINY_CLIP = CLIPTextConfig(width=64, layers=2, heads=2)


def _models():
    exact = ControlLDM.create(
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, clip_cfg=TINY_CLIP,
        dtype=jnp.float32,
    )
    q = ControlLDM.create(
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, clip_cfg=TINY_CLIP,
        dtype=jnp.float32, quantized=True,
    )
    return exact, q


def _inputs(cldm):
    s = 8
    x = jax.random.normal(jax.random.PRNGKey(1), (1, s, s, 4))
    hint = jax.random.normal(jax.random.PRNGKey(2), (1, s, s, 4)) * 0.1
    t = jnp.asarray([17], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 77, 64)) * 0.02
    return x, {"c_txt": ctx, "c_img": hint}, t


def test_quant_dot_and_conv_accuracy():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32)) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 64))
    dn = (((1,), (0,)), ((), ()))
    ref = jax.lax.dot_general(x, w, dn)
    got = quant.w8a8_dot_general(x, w, dn)
    err = np.abs(np.asarray(ref - got)).max() / np.abs(np.asarray(ref)).max()
    assert err < 0.04, err

    wc = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 8, 16)) * 0.1
    xc = jax.random.normal(jax.random.PRNGKey(3), (1, 10, 10, 8))
    dnn = jax.lax.conv_dimension_numbers(xc.shape, wc.shape, ("NHWC", "HWIO", "NHWC"))
    ref = jax.lax.conv_general_dilated(xc, wc, (1, 1), "SAME", dimension_numbers=dnn)
    got = quant.w8a8_conv(xc, wc, (1, 1), "SAME", dimension_numbers=dnn)
    err = np.abs(np.asarray(ref - got)).max() / np.abs(np.asarray(ref)).max()
    assert err < 0.04, err


def test_zero_weights_stay_exactly_zero():
    w = jnp.zeros((3, 3, 4, 4))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 6, 4))
    dnn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    out = quant.w8a8_conv(x, w, (1, 1), "SAME", dimension_numbers=dnn)
    assert np.asarray(out).max() == 0.0


def test_param_tree_independent_of_quantized():
    exact, q = _models()
    p0 = exact.init(jax.random.PRNGKey(0))
    p1 = q.init(jax.random.PRNGKey(0))
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    s0 = jax.tree_util.tree_map(lambda a: a.shape, p0)
    s1 = jax.tree_util.tree_map(lambda a: a.shape, p1)
    assert s0 == s1


def test_quantized_forward_close_and_flag_scoped():
    exact, q = _models()
    params = exact.init(jax.random.PRNGKey(0))
    x, cond, t = _inputs(exact)

    out0, feats0 = exact.apply(params, x, t, cond)
    assert not quant.active()  # the scope must not leak
    out1, feats1 = q.apply(params, x, t, cond)
    assert not quant.active()

    # the final out_conv is zero-init, so eps==0 at random init in BOTH
    # paths — quantization activity shows in the tapped decoder features
    a0, a1 = np.asarray(feats0[-1]), np.asarray(feats1[-1])
    assert a0.shape == a1.shape and np.isfinite(a1).all()
    # quantization is active (features differ) but stays a small perturbation
    assert not np.array_equal(a0, a1)
    denom = np.abs(a0).max() + 1e-6
    assert np.abs(a0 - a1).max() / denom < 0.25, np.abs(a0 - a1).max() / denom


def test_exact_path_bit_identical_when_off():
    exact, _ = _models()
    params = exact.init(jax.random.PRNGKey(0))
    x, cond, t = _inputs(exact)
    _, feats0 = exact.apply(params, x, t, cond)
    # a second exact model instance (fresh module objects) must produce the
    # exact same graph/output — i.e. the quant plumbing is inert by default
    exact2 = ControlLDM.create(
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, clip_cfg=TINY_CLIP,
        dtype=jnp.float32,
    )
    _, feats2 = exact2.apply(params, x, t, cond)
    np.testing.assert_array_equal(np.asarray(feats0[-1]), np.asarray(feats2[-1]))


def test_static_act_scale_matches_dynamic_at_true_amax():
    # when the static per-tensor amax equals the actual one, the static
    # path must reproduce the dynamic quantization bit-for-bit
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32)) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 64))
    dn = (((1,), (0,)), ((), ()))
    dyn = quant.w8a8_dot_general(x, w, dn)
    true_amax = float(jnp.max(jnp.abs(x)))
    with quant.quantized(True, static_act_amax=true_amax):
        static = quant.w8a8_dot_general(x, w, dn)
    np.testing.assert_array_equal(np.asarray(dyn), np.asarray(static))


def test_static_act_scale_clips_out_of_range():
    # values beyond the calibrated amax must saturate (the dynamic path
    # never sees out-of-range values; the static one must clip, not wrap)
    x = jnp.asarray([[100.0, -100.0, 1.0]])
    w = jnp.eye(3)
    dn = (((1,), (0,)), ((), ()))
    with quant.quantized(True, static_act_amax=1.0):
        y = np.asarray(quant.w8a8_dot_general(x, w, dn))
    scale = 1.0 / 127.0
    np.testing.assert_allclose(y[0], [127 * scale, -127 * scale, 127 * scale],
                               rtol=1e-6)


def test_static_scope_nesting_restores():
    assert quant.static_act_amax() is None
    with quant.quantized(True, static_act_amax=4.0):
        assert quant.static_act_amax() == 4.0
        with quant.quantized(True):
            assert quant.static_act_amax() is None
        assert quant.static_act_amax() == 4.0
    assert quant.static_act_amax() is None
    assert not quant.active()


def test_cldm_static_quant_forward_finite():
    q = ControlLDM.create(
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, clip_cfg=TINY_CLIP,
        dtype=jnp.float32, quantized=True, quant_static_amax=8.0,
    )
    params = q.init(jax.random.PRNGKey(0))
    x, cond, t = _inputs(q)
    _, feats = q.apply(params, x, t, cond)
    assert np.isfinite(np.asarray(feats[-1])).all()
    assert not quant.active() and quant.static_act_amax() is None


def test_calibrated_per_site_scales_match_dynamic_exactly():
    # calibration records each site's dynamic amax on this input; replaying
    # them as per-site static scales must reproduce the dynamic forward
    # bit-for-bit on the same input
    import dataclasses

    _, q = _models()
    params = q.init(jax.random.PRNGKey(0))
    x, cond, t = _inputs(q)
    _, feats_dyn = q.apply(params, x, t, cond)

    record = q.calibrate_quant(params, x, t, cond)
    assert len(record) > 10  # every UNet+ControlNet conv/dense site
    qs = dataclasses.replace(q, quant_static_amax=tuple(record))
    _, feats_static = qs.apply(params, x, t, cond)
    np.testing.assert_array_equal(
        np.asarray(feats_dyn[-1]), np.asarray(feats_static[-1])
    )
    # repeat calibration max-merges in place, not append
    again = q.calibrate_quant(params, x, t, cond, record=record)
    assert again is record and len(again) == len(record)


def test_per_site_count_mismatch_raises():
    import dataclasses
    import pytest

    _, q = _models()
    params = q.init(jax.random.PRNGKey(0))
    x, cond, t = _inputs(q)
    qs = dataclasses.replace(q, quant_static_amax=(1.0, 2.0))
    with pytest.raises(ValueError, match="quant site"):
        qs.apply(params, x, t, cond)


def test_calibration_under_jit_raises_clearly():
    import pytest

    w = jnp.eye(4)
    x = jnp.ones((2, 4))
    dn = (((1,), (0,)), ((), ()))

    def f(x):
        return quant.w8a8_dot_general(x, w, dn)

    with quant.quantized(True, calibrate=[]):
        with pytest.raises(RuntimeError, match="eagerly"):
            jax.jit(f)(x)


def test_selective_gate_skips_activation_dominated_sites():
    # weight 64x32 (2048 elems) vs activation 16x64 (1024): ratio 2.0
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32)) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 64))
    dn = (((1,), (0,)), ((), ()))
    exact = jax.lax.dot_general(x, w, dn)
    with quant.selective(min_ratio=4.0):  # 2048 < 4*1024 -> skip (exact)
        skipped = quant.w8a8_dot_general(x, w, dn)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(skipped))
    with quant.selective(min_ratio=1.0):  # 2048 >= 1024 -> quantized
        quantized = quant.w8a8_dot_general(x, w, dn)
    assert np.abs(np.asarray(exact - quantized)).max() > 0


def test_selective_calibration_site_count_matches_serving():
    # calibrating under the same selective() scope must produce exactly the
    # per-site list the selective serving path consumes
    import dataclasses

    _, q = _models()
    q = dataclasses.replace(q, quant_min_ratio=2.0)
    params = q.init(jax.random.PRNGKey(0))
    x, cond, t = _inputs(q)
    record = q.calibrate_quant(params, x, t, cond)
    full = dataclasses.replace(q, quant_min_ratio=None).calibrate_quant(
        params, x, t, cond
    )
    assert 0 < len(record) < len(full)  # the gate skips real sites
    qs = dataclasses.replace(q, quant_static_amax=tuple(record))
    _, feats = qs.apply(params, x, t, cond)
    assert np.isfinite(np.asarray(feats[-1])).all()

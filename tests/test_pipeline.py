import jax
import jax.numpy as jnp
import numpy as np

from tair_tpu.models.tokenizer import tokenize
from tair_tpu.pipeline import build_tiny_model


def test_end_to_end_restore():
    model = build_tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    lq = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    toks = jnp.asarray(tokenize([""]))

    restored, clean, feats = jax.jit(
        lambda p, lq, t, r: model.restore(p, lq, t, r, steps=3, feat_iterations=(3,))
    )(params, lq, toks, jax.random.PRNGKey(2))

    assert restored.shape == (1, 64, 64, 3)
    assert clean.shape == (1, 64, 64, 3)
    assert float(restored.min()) >= 0.0 and float(restored.max()) <= 1.0
    assert np.isfinite(np.asarray(restored)).all()
    # feature pyramid captured at the tagged iteration: 4 levels
    assert len(feats) == 4
    assert feats[0].shape[0] == 1  # one tag
    # channels follow (4m, 4m, 2m, m) with m=32
    assert [f.shape[-1] for f in feats] == [128, 128, 64, 32]


def test_restore_deterministic():
    model = build_tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    lq = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    toks = jnp.asarray(tokenize(["some text"]))
    a, _, _ = model.restore(params, lq, toks, jax.random.PRNGKey(5), steps=2)
    b, _, _ = model.restore(params, lq, toks, jax.random.PRNGKey(5), steps=2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_with_cfg_guidance():
    model = build_tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    # the SD output conv is zero-init, which makes a fresh model emit eps=0
    # independent of conditioning; de-zero it so CFG has something to scale
    params["unet"]["out_conv"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(9), params["unet"]["out_conv"]["kernel"].shape
    ) * 0.1
    lq = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    toks = jnp.asarray(tokenize(["text"]))
    neg = jnp.asarray(tokenize([""]))
    out, _, _ = model.restore(
        params, lq, toks, jax.random.PRNGKey(2), steps=2,
        cfg_scale=2.0, negative_tokens=neg, rescale_cfg=True,
    )
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()
    # CFG with a different scale changes the output
    out2, _, _ = model.restore(
        params, lq, toks, jax.random.PRNGKey(2), steps=2,
        cfg_scale=4.0, negative_tokens=neg,
    )
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_cast_params_for_inference():
    from tair_tpu.pipeline import cast_params_for_inference

    model = build_tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    bf = cast_params_for_inference(params)
    assert all(p.dtype == jnp.bfloat16 for p in jax.tree.leaves(bf))
    lq = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    toks = jnp.asarray(tokenize([""]))
    out, _, _ = model.restore(bf, lq, toks, jax.random.PRNGKey(2), steps=2)
    assert np.isfinite(np.asarray(out)).all()

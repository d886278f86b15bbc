"""Joint TeReDiff tests: stage-3 training step with OCR loss, and the
OCR-feedback inference loop (the flagship val path)."""

import jax
import jax.numpy as jnp
import numpy as np

from tair_tpu.data.satext import SyntheticSAText, collate
from tair_tpu.diffusion import Diffusion
from tair_tpu.pipeline import build_tiny_model
from tair_tpu.train.stages import trainable_mask
from tair_tpu.train.step import create_train_state, make_train_step


def small_batch(hw=64, b=2):
    ds = SyntheticSAText(size=hw, length=4)
    batch = collate([ds[0], ds[1]], max_inst=4)
    return {
        "gt": jnp.asarray(batch["hq"]) * 2 - 1,
        "lq": jnp.asarray(batch["hq"]),
        "tokens": jnp.asarray(batch["tokens"]),
        "inst_mask": jnp.asarray(batch["inst_mask"]),
        "boxes": jnp.asarray(batch["boxes"]),
        "ctrl_points": jnp.asarray(batch["ctrl_points"]),
        "texts": jnp.asarray(batch["texts"]),
    }


def test_stage3_train_step_with_ocr_loss():
    model = build_tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    assert "testr" in params
    diffusion = Diffusion(schedule=model.schedule, parameterization="v")
    state, tx = create_train_state(params, "stage3", 1e-4)
    step = make_train_step(
        model, diffusion, tx,
        spotter_loss_fn=model.spotter_loss_fn(),
        ocr_loss_weight=0.01,
        donate=False,
    )
    batch = small_batch()
    new_state, aux = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(aux["loss_total"]))
    assert "loss_ocr" in aux and np.isfinite(float(aux["loss_ocr"]))

    # stage3 trains controlnet, unet-attn, and testr — check testr moved
    changed_testr = any(
        bool(np.any(np.asarray(a) != np.asarray(b)))
        for a, b in zip(
            jax.tree.leaves(params["testr"]),
            jax.tree.leaves(new_state.params["testr"]),
        )
    )
    assert changed_testr


def test_stage2_only_trains_testr():
    model = build_tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    mask = trainable_mask(params, "stage2")
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    for path, v in flat:
        if v:
            assert "testr" in str(path)


def test_ocr_feedback_restore():
    model = build_tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    lq = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    restored, ts_results = model.restore_with_ocr_feedback(
        params, lq, jax.random.PRNGKey(2), steps=3, score_threshold=0.0
    )
    assert restored.shape == (1, 64, 64, 3)
    assert len(ts_results) == 3
    info = ts_results[0][0]
    assert "pred_texts" in info and "pred_prompt" in info
    assert info["pred_polys"].shape[-2:] == (16, 2)
    # with threshold 0 every proposal is kept -> prompts non-trivial
    assert len(info["pred_texts"]) == 10
    # jitted step/spot/encode callables are cached on the instance: a second
    # call with the same (steps, threshold, size) must NOT define fresh jit
    # wrappers (fresh wrappers retrace the full graph per image)
    assert len(model._jit_cache) == 1
    model.restore_with_ocr_feedback(
        params, lq, jax.random.PRNGKey(3), steps=3, score_threshold=0.0
    )
    assert len(model._jit_cache) == 1


def test_fused_feedback_restore():
    """One-compiled-graph TeReDiff loop: spotter feedback without host hops."""
    model = build_tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    lq = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    restored, tokens = jax.jit(
        lambda p, lq, r: model.restore_fused_feedback(
            p, lq, r, steps=3, score_threshold=0.0
        )
    )(params, lq, jax.random.PRNGKey(2))
    assert restored.shape == (1, 64, 64, 3)
    assert tokens.shape == (1, 77)
    assert int(tokens[0, 0]) == 49406  # SOT
    assert (np.asarray(tokens) == 49407).sum() == 1  # one EOT
    assert np.isfinite(np.asarray(restored)).all()


def test_fused_feedback_return_spots():
    """return_spots carries the LAST spotter decode out of the scan with
    the fixed spotter_inference shapes (serving/eval callers need it
    without a second spotter pass)."""
    model = build_tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    tc = model.testr.cfg
    lq = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    restored, tokens, spots = model.restore_fused_feedback(
        params, lq, jax.random.PRNGKey(2), steps=3, score_threshold=0.0,
        return_spots=True,
    )
    assert restored.shape == (1, 64, 64, 3)
    assert spots["scores"].shape == (1, tc.num_proposals)
    assert spots["keep"].shape == (1, tc.num_proposals)
    assert spots["polygons"].shape == (1, tc.num_proposals,
                                       tc.num_ctrl_points, 2)
    assert spots["recs"].shape == (1, tc.num_proposals, tc.num_chars)
    # threshold 0 keeps everything: the spotter really ran
    assert np.asarray(spots["keep"]).all()
    assert np.isfinite(np.asarray(spots["scores"])).all()
    # two-tuple contract unchanged for existing callers
    r2, t2 = model.restore_fused_feedback(
        params, lq, jax.random.PRNGKey(2), steps=3, score_threshold=0.0
    )
    np.testing.assert_array_equal(np.asarray(r2), np.asarray(restored))
    np.testing.assert_array_equal(np.asarray(t2), np.asarray(tokens))


def test_fused_feedback_spotter_every_k():
    model = build_tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    lq = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    restored, tokens = model.restore_fused_feedback(
        params, lq, jax.random.PRNGKey(2), steps=4, score_threshold=0.0,
        spotter_every=2,
    )
    assert restored.shape == (1, 64, 64, 3)
    assert int(tokens[0, 0]) == 49406

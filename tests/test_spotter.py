import jax
import jax.numpy as jnp
import numpy as np

from tair_tpu.spotter import (
    CriterionConfig,
    TESTR,
    TESTRConfig,
    ctrl_point_match,
    decode_text,
    encode_text,
    set_criterion,
    spotter_inference,
)

TINY = TESTRConfig(
    d_model=32,
    n_heads=4,
    num_encoder_layers=2,
    num_decoder_layers=2,
    dim_feedforward=64,
    num_proposals=10,
    num_ctrl_points=4,
    num_chars=6,
    voc_size=96,
    in_channels=(8, 8, 4, 4),
)


def tiny_feats(key, b=2):
    ks = jax.random.split(key, 4)
    shapes = [(2, 2, 8), (4, 4, 8), (8, 8, 4), (8, 8, 4)]
    return tuple(
        jax.random.normal(k, (b, h, w, c)) for k, (h, w, c) in zip(ks, shapes)
    )


def make_targets(b=2, m=3, n_pts=4, n_chars=6):
    rs = np.random.RandomState(0)
    return {
        "inst_mask": jnp.asarray([[1, 1, 0], [1, 0, 0]], bool),
        "boxes": jnp.asarray(
            np.clip(rs.rand(b, m, 4) * 0.5 + 0.25, 0.05, 0.95), jnp.float32
        ),
        "ctrl_points": jnp.asarray(rs.rand(b, m, n_pts, 2), jnp.float32),
        "texts": jnp.asarray(rs.randint(0, 96, (b, m, n_chars)), jnp.int32),
    }


def test_charset_roundtrip():
    ids = encode_text("Hello!")
    assert decode_text(ids) == "Hello!"
    assert ids.shape == (25,)
    assert ids[6] == 96  # pad


def test_testr_output_shapes():
    model = TESTR(TINY)
    feats = tiny_feats(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), feats)
    out = model.apply(params, feats)
    k, npts, nw = TINY.num_proposals, TINY.num_ctrl_points, TINY.num_chars
    assert out["pred_logits"].shape == (2, k, npts, 1)
    assert out["pred_ctrl_points"].shape == (2, k, npts, 2)
    assert out["pred_texts"].shape == (2, k, nw, TINY.voc_size + 1)
    assert len(out["aux_outputs"]) == TINY.num_decoder_layers - 1
    s = sum(h * w for (h, w) in [(2, 2), (4, 4), (8, 8), (8, 8)])
    assert out["enc_outputs"]["pred_logits"].shape == (2, s, 1)
    assert out["enc_outputs"]["pred_boxes"].shape == (2, s, 4)
    # coords are valid probabilities
    assert float(out["pred_ctrl_points"].min()) >= 0.0
    assert float(out["pred_ctrl_points"].max()) <= 1.0


def test_matcher_recovers_identity():
    """If predictions equal the targets at distinct queries, the matcher must
    find exactly that assignment."""
    b, q, m, npts = 1, 5, 2, 4
    rs = np.random.RandomState(3)
    tgt_pts = rs.rand(b, m, npts, 2).astype(np.float32)
    pred_pts = rs.rand(b, q, npts, 2).astype(np.float32)
    pred_pts[0, 3] = tgt_pts[0, 0]
    pred_pts[0, 1] = tgt_pts[0, 1]
    logits = np.full((b, q, npts, 1), -4.0, np.float32)
    logits[0, 3] = 4.0
    logits[0, 1] = 4.0

    targets = {
        "inst_mask": jnp.ones((b, m), bool),
        "ctrl_points": jnp.asarray(tgt_pts),
    }
    outputs = {
        "pred_logits": jnp.asarray(logits),
        "pred_ctrl_points": jnp.asarray(pred_pts),
    }
    idx = np.asarray(ctrl_point_match(outputs, targets))
    assert idx.tolist() == [[3, 1]]


def test_criterion_finite_and_masked():
    model = TESTR(TINY)
    feats = tiny_feats(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), feats)
    out = model.apply(params, feats)
    targets = make_targets()
    losses = jax.jit(lambda o, t: set_criterion(o, t, CriterionConfig()))(out, targets)
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert float(losses["loss_total"]) > 0
    # expected keys: dec + aux suffixes + enc
    assert "loss_ce" in losses and "loss_texts" in losses
    assert "loss_ce_0" in losses
    assert "loss_giou_enc" in losses


def test_unmatched_valid_targets_contribute_nothing():
    """With more valid instances than queries (the matcher's M > Q
    orientation) surplus targets carry src_idx == -1; they must not leak
    into any loss term (clipping them to query 0 would stack one-hot
    targets there)."""
    from tair_tpu.spotter.losses import dec_losses

    rs = np.random.RandomState(11)
    b, q, m, n_pts, n_chars, voc = 1, 2, 4, 4, 6, 96
    outputs = {
        "pred_logits": jnp.asarray(rs.randn(b, q, n_pts, 1), jnp.float32),
        "pred_ctrl_points": jnp.asarray(rs.rand(b, q, n_pts, 2), jnp.float32),
        "pred_texts": jnp.asarray(rs.randn(b, q, n_chars, voc + 1), jnp.float32),
    }
    targets = {
        "inst_mask": jnp.asarray([[1, 1, 1, 0]], bool),  # 3 valid > 2 queries
        "ctrl_points": jnp.asarray(rs.rand(b, m, n_pts, 2), jnp.float32),
        "texts": jnp.asarray(rs.randint(0, voc, (b, m, n_chars)), jnp.int32),
    }
    src_idx = jnp.asarray([[0, 1, -1, -1]], jnp.int32)  # 3rd valid unmatched

    targets_matched_only = dict(
        targets, inst_mask=jnp.asarray([[1, 1, 0, 0]], bool)
    )
    cfg = CriterionConfig()
    num_inst = jnp.float32(3.0)  # same normalizer for both
    a = dec_losses(outputs, targets, src_idx, num_inst, cfg)
    bb = dec_losses(outputs, targets_matched_only, src_idx, num_inst, cfg)
    for k in a:
        np.testing.assert_allclose(
            float(a[k]), float(bb[k]), rtol=1e-6, err_msg=k
        )


def test_criterion_grads_flow_to_params():
    model = TESTR(TINY)
    feats = tiny_feats(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), feats)
    targets = make_targets()

    def loss_fn(p):
        out = model.apply(p, feats)
        return set_criterion(out, targets)["loss_total"]

    grads = jax.grad(loss_fn)(params)
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_inference_decode():
    model = TESTR(TINY)
    feats = tiny_feats(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), feats)
    out = model.apply(params, feats)
    res = spotter_inference(out, score_threshold=0.0, image_size=512)
    assert res["scores"].shape == (2, TINY.num_proposals)
    assert res["keep"].all()  # threshold 0
    assert res["polygons"].shape == (2, TINY.num_proposals, TINY.num_ctrl_points, 2)
    assert res["recs"].shape == (2, TINY.num_proposals, TINY.num_chars)
    texts = [decode_text(r) for r in np.asarray(res["recs"][0])]
    assert all(isinstance(t, str) for t in texts)


def test_testr_remat_gradients_match():
    """use_checkpoint=True (layer remat) must not change gradients."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tair_tpu.spotter.testr import TESTR, TESTRConfig

    kw = dict(d_model=32, n_heads=4, num_encoder_layers=1, num_decoder_layers=1,
              dim_feedforward=32, num_feature_levels=2, num_proposals=8,
              num_ctrl_points=4, num_chars=5, voc_size=10, in_channels=(8, 8))
    feats = (jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 8)),
             jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 8)))
    m0 = TESTR(TESTRConfig(**kw))
    m1 = TESTR(TESTRConfig(**kw, use_checkpoint=True))
    p = m0.init(jax.random.PRNGKey(0), feats)

    def loss(m):
        return lambda p: jnp.sum(
            m.apply(p, feats)["pred_logits"].astype(jnp.float32) ** 2
        )

    g0 = jax.grad(loss(m0))(p)
    g1 = jax.grad(loss(m1))(p)
    for (k, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g0)[0],
        jax.tree_util.tree_flatten_with_path(g1)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, err_msg=str(k)
        )

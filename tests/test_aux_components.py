import jax
import jax.numpy as jnp
import numpy as np

from tair_tpu.models.cleaners import (
    RRDBNet,
    RRDBNetConfig,
    SCUNet,
    SCUNetConfig,
)
from tair_tpu.pipeline import build_tiny_model
from tair_tpu.utils.guidance import MSEGuidance, WeightedMSEGuidance
from tair_tpu.utils.metrics import psnr, ssim, wavelet_reconstruction
from tair_tpu.utils.text_eval import (
    LexiconMatcher,
    SpottingInstance,
    evaluate_dataset,
    polygon_iou,
)
from tair_tpu.utils.tilevae import tiled_vae_decode, tiled_vae_encode


def test_rrdbnet_x4():
    m = RRDBNet(RRDBNetConfig(nf=8, nb=2, gc=4, sf=4))
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 16, 16, 3))
    p = m.init(jax.random.PRNGKey(1), x)
    y = m.apply(p, x)
    assert y.shape == (1, 64, 64, 3)


def test_scunet_shape_preserving():
    m = SCUNet(SCUNetConfig(dim=16, config=(1, 1, 1, 1, 1, 1, 1), head_dim=8))
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    p = m.init(jax.random.PRNGKey(1), x)
    y = m.apply(p, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_metrics_sanity():
    a = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    assert float(psnr(a, a)[0]) > 80
    assert float(ssim(a, a)[0]) > 0.99
    noisy = jnp.clip(a + 0.1 * jax.random.normal(jax.random.PRNGKey(1), a.shape), 0, 1)
    assert float(psnr(a, noisy)[0]) < 30
    assert float(ssim(a, noisy)[0]) < 0.99


def test_wavelet_color_fix():
    content = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3))
    style = content + 0.3  # same detail, shifted color
    fixed = wavelet_reconstruction(content, style)
    # adopts style's mean color, keeps content's detail
    np.testing.assert_allclose(
        float(fixed.mean()), float(style.mean()), atol=0.02
    )


def test_polygon_iou_and_dataset_eval():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], np.float32)
    assert abs(polygon_iou(sq, sq) - 1.0) < 0.02
    shifted = sq + np.array([5, 0], np.float32)
    iou = polygon_iou(sq, shifted)
    assert 0.25 < iou < 0.42  # true 1/3

    gt = [SpottingInstance(sq, "HELLO"), SpottingInstance(sq + 100, "WORLD")]
    pred = [SpottingInstance(sq, "hello"), SpottingInstance(sq + 100, "wrong")]
    res = evaluate_dataset([gt], [pred])
    assert res["det_hmean"] == 1.0
    assert abs(res["e2e_hmean"] - 0.5) < 1e-6


def test_lexicon_matcher():
    lm = LexiconMatcher(["STOP", "SHOP", "OPEN"])
    assert lm.find_match_word("ST0P") == "STOP"
    assert lm.find_match_word("zzzzzz") is None


def test_mse_guidance_moves_toward_target():
    x = jnp.zeros((1, 8, 8, 4))
    target = jnp.ones((1, 8, 8, 4))
    g = MSEGuidance(scale=0.01, t_start=1001, t_stop=-1)
    out = g(x, target, jnp.array([500]))
    assert float(out.mean()) > 0  # moved toward target
    # outside the window: no-op
    g2 = MSEGuidance(scale=0.01, t_start=400, t_stop=-1)
    out2 = g2(x, target, jnp.array([500]))
    np.testing.assert_array_equal(np.asarray(out2), 0.0)
    # weighted variant also runs
    wg = WeightedMSEGuidance(scale=0.01)
    assert wg(x, target, jnp.array([10])).shape == x.shape


def test_tiled_vae_roundtrip_close_to_full():
    model = build_tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3)) * 2 - 1
    z_full = model.cldm.vae_encode(params, img, sample=False)
    z_tiled = tiled_vae_encode(model.cldm, params, img, tile_size=32, overlap=16)
    assert z_tiled.shape == z_full.shape
    # tiles see different context; interiors should still be close
    diff = float(jnp.abs(z_tiled - z_full).mean())
    assert diff < 0.5 * float(jnp.abs(z_full).mean()) + 0.1

    dec_full = model.cldm.vae_decode(params, z_full)
    dec_tiled = tiled_vae_decode(model.cldm, params, z_full, tile_size=4, overlap=2)
    assert dec_tiled.shape == dec_full.shape


def test_average_precision():
    import numpy as np
    from tair_tpu.utils.text_eval import SpottingInstance, average_precision

    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], np.float32)
    gt = [[SpottingInstance(sq, "A"), SpottingInstance(sq + 100, "B")]]
    # perfect detector
    preds = [[SpottingInstance(sq, "A", 0.9), SpottingInstance(sq + 100, "B", 0.8)]]
    res = average_precision(gt, preds, (0.5,))
    assert abs(res["ap50"] - 1.0) < 1e-6
    # one false positive ranked first lowers AP
    preds_fp = [[SpottingInstance(sq + 50, "X", 0.95)] + preds[0]]
    res2 = average_precision(gt, preds_fp, (0.5,))
    assert res2["ap50"] < 1.0
    assert res2["ap"] == res2["ap50"]


def test_metric_logger_tensorboard(tmp_path):
    """log_tool=tensorboard mirrors scalars to a SummaryWriter event file."""
    from tair_tpu.utils.logging import MetricLogger

    lg = MetricLogger(str(tmp_path), log_tool="tensorboard")
    lg.log(1, {"loss": 0.5, "name": "x"})
    lg.log(2, {"loss": 0.25})
    import os

    tb_dir = os.path.join(str(tmp_path), "tb")
    assert os.path.isdir(tb_dir) and os.listdir(tb_dir)

    import pytest

    with pytest.raises(ValueError):
        MetricLogger(str(tmp_path), log_tool="nope")


def test_lexicon_weighted_edit_distance():
    """With recognizer probabilities, the matcher prefers the candidate the
    recognizer found plausible even at equal plain edit distance.

    Reference cost model (lexicon_procesor.py:40-44): replacing pred char c1
    by candidate c2 costs max(1 - 5*P(c2)/P(c1), 0) — so a candidate char
    with at least 1/5 the predicted char's probability substitutes for free,
    while a truly implausible one costs ~1."""
    import numpy as np

    lm = LexiconMatcher(["SAP", "SEP"], weighted_ed=True)
    # predicted "SOP": one substitution from both SAP (O->A) and SEP (O->E).
    # Recognizer at slot 1: P(O)=0.5, P(E)=0.45 (plausible), P(A)=0.01
    # (implausible) -> SEP replace cost max(1-5*0.9,0)=0, SAP cost 0.9.
    chars = {c: i for i, c in enumerate("AEOPS")}
    probs = np.full((3, 5), 0.01)
    probs[1, chars["O"]] = 0.5
    probs[1, chars["E"]] = 0.45
    assert lm.find_match_word("SOP", probs, chars) == "SEP"

    plain = LexiconMatcher(["SAP", "SEP"])
    assert plain.find_match_word("SOP") == "SAP"  # tie -> first strict win


def test_weighted_edit_distance_reference_formulas():
    """Pin the exact delete/insert/replace costs of lexicon_procesor.py."""
    import numpy as np

    from tair_tpu.utils.text_eval import weighted_edit_distance

    chars = {c: i for i, c in enumerate("ABab")}
    # case-insensitivity: P = max(upper, lower) columns (lexicon_procesor:46-50)
    probs = np.zeros((1, 4))
    probs[0, chars["a"]] = 0.7
    probs[0, chars["A"]] = 0.2
    # identical after case fold -> 0
    assert weighted_edit_distance("A", "a", probs, chars) == 0.0
    # replace A by B with P(B)=0: cost = max(1 - 0, 0) = 1
    assert abs(weighted_edit_distance("A", "B", probs, chars) - 1.0) < 1e-6
    # empty word2: reference dp border -> plain length of word1
    assert weighted_edit_distance("A", "", probs, chars) == 1.0

    # delete cost = P_j(word1[j]) (case-folded max): "AA"->"A" deletes the
    # second A at cost max(0.2, 0.7) = 0.7
    probs2 = np.tile(probs, (2, 1))
    assert abs(weighted_edit_distance("AA", "A", probs2, chars) - 0.7) < 1e-6
    # insert cost at the last position = P of the adjacent pred char:
    # "A"->"AB" inserts B at cost P_0("A") = 0.7 (cheaper than replace=1)
    assert abs(weighted_edit_distance("A", "AB", probs, chars) - 0.7) < 1e-6


def test_icdar_dontcare_and_word_spotting_rules():
    """###-GTs and short/non-dictionary words become don't-care; detections
    covering them are excluded (text_eval_script.py:293-354)."""
    import numpy as np

    from tair_tpu.utils.text_eval import evaluate_image

    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], np.float32)
    gts = [
        SpottingInstance(sq, "HELLO"),
        SpottingInstance(sq + 100, "###"),  # explicit don't-care
        SpottingInstance(sq + 200, "ab"),  # < MIN_LENGTH_CARE_WORD
        SpottingInstance(sq + 300, "12ab"),  # digits -> not in dictionary
    ]
    preds = [
        SpottingInstance(sq, "HELLO"),
        SpottingInstance(sq + 100, "NOISE"),  # overlaps ### -> excluded
        SpottingInstance(sq + 200, "ab"),  # overlaps short-word don't-care
    ]
    res = evaluate_image(gts, preds, word_spotting=True)
    # e2e: only HELLO is a care GT; the ###/short/digit dets are excluded
    assert res["num_gt"] == 1 and res["num_pred"] == 1
    assert res["matched_e2e"] == 1
    # det-only: ### is the only det-only don't-care
    assert res["num_gt_det"] == 3 and res["num_pred_det"] == 2
    assert res["matched_det"] == 2

    # word-spotting normalization: GT "stop's" -> dictionary word "stop"
    res2 = evaluate_image(
        [SpottingInstance(sq, "stop's")],
        [SpottingInstance(sq, "STOP")],
        word_spotting=True,
    )
    assert res2["matched_e2e"] == 1

    # non-word-spotting: leniency on GT first/last special characters
    res3 = evaluate_image(
        [SpottingInstance(sq, '"stop"')],
        [SpottingInstance(sq, "STOP")],
        word_spotting=False,
    )
    assert res3["matched_e2e"] == 1

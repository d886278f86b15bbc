"""scripts/render_quality_docs.py renders committed A/B artifacts into the
SERVING.md quality section (the mechanism that keeps doc tables tied to
measurements, tests/test_doc_provenance.py's provenance class)."""

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mod():
    spec = importlib.util.spec_from_file_location(
        "render_quality_docs",
        os.path.join(REPO, "scripts/render_quality_docs.py"),
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_render_from_artifacts(tmp_path):
    m = _mod()
    mdir = tmp_path / "docs" / "measurements"
    mdir.mkdir(parents=True)
    ab = [
        {"config": "exact", "spotter_every": 1, "enc_topk": 0,
         "n_tokens": 1360, "steps": 50, "n_images": 4, "psnr": 21.5,
         "ssim": 0.71, "img_per_s": 1.2, "sec_per_img": 0.83,
         "det_f@0.3": 0.62, "e2e_f@0.3": 0.41},
        {"config": "hostexact", "spotter_every": 1, "enc_topk": 0,
         "n_tokens": 1360, "steps": 50, "n_images": 4, "psnr": 21.4,
         "ssim": 0.70, "img_per_s": 0.5, "sec_per_img": 2.0,
         "det_f@0.5": 0.60, "e2e_f@0.5": 0.40},
    ]
    (mdir / "serving_ab_r4.json").write_text(json.dumps(ab))
    (mdir / "sampler_ab_r4.json").write_text(json.dumps(
        [{"sampler": "dpm_solver_2", "steps": 10, "psnr": 20.9,
          "ssim": 0.68, "sec_per_img": 0.3, "img_per_s": 3.3,
          "n_images": 4}]
    ))
    block = m.render(base=str(tmp_path))
    assert block.startswith(m.BEGIN) and block.rstrip().endswith(m.END)
    # the header threshold is derived from the artifact keys (ADVICE r4:
    # no hardcoded @0.3 label over differently-thresholded numbers)
    assert "det-F@0.3" in block
    assert "| exact | 21.5 | 0.71 | 0.62 | 0.41 | 1.2 | 0.83 |" in block
    # the hostexact row only carries @0.5 keys: rendered as missing under
    # the @0.3 header, never silently mixed across thresholds
    assert "| hostexact | 21.4 | 0.7 | - | - | 0.5 | 2.0 |" in block
    assert "val_sample semantics" in block
    assert "| dpm_solver_2 | 10 | 20.9 | 0.68 | 0.3 |" in block
    # cites the artifacts it rendered from
    assert "docs/measurements/serving_ab_r4.json" in block
    assert "docs/measurements/sampler_ab_r4.json" in block


def test_render_no_artifacts_is_empty_shell(tmp_path):
    m = _mod()
    block = m.render(base=str(tmp_path))
    assert "| exact" not in block


def test_render_header_follows_artifact_threshold(tmp_path):
    """A run at --score-threshold 0.5 renders an @0.5 header, not @0.3."""
    m = _mod()
    mdir = tmp_path / "docs" / "measurements"
    mdir.mkdir(parents=True)
    ab = [
        {"config": "exact", "spotter_every": 1, "enc_topk": 0,
         "n_tokens": 1360, "steps": 50, "n_images": 4, "psnr": 21.5,
         "ssim": 0.71, "img_per_s": 1.2, "sec_per_img": 0.83,
         "det_f@0.5": 0.60, "e2e_f@0.5": 0.40},
    ]
    (mdir / "serving_ab_r4.json").write_text(json.dumps(ab))
    block = m.render(base=str(tmp_path))
    assert "det-F@0.5" in block and "det-F@0.3" not in block
    assert "| exact | 21.5 | 0.71 | 0.6 | 0.4 | 1.2 | 0.83 |" in block

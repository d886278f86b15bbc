"""Entry-point smoke gates on the bundled demo assets (SURVEY §4: the
reference's quality control is a runnable demo on assets/demo_imgs — this is
that golden-path gate, exercising the real CLIs end to end: config loading,
image IO, the restoration loop, metric computation, and output saving)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=900):
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    for k in list(env):
        if k.startswith(("PALLAS_AXON", "AXON_")):
            env.pop(k)
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env, timeout=timeout,
        capture_output=True, text=True,
    )


@pytest.mark.slow
def test_val_cli_smoke(tmp_path):
    out_dir = tmp_path / "val_out"
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        "model_preset: tiny\ndtype: float32\nval:\n"
        f"  lq_dir: {REPO}/assets/smoke/lq\n"
        f"  gt_dir: {REPO}/assets/smoke/gt\n"
        f"  output_dir: {out_dir}\n  steps: 2\n"
    )
    r = _run(["val.py", "--config", str(cfg), "--image-size", "64"])
    assert r.returncode == 0, r.stdout + r.stderr
    files = os.listdir(out_dir)
    assert "restored_demo0.png" in files and "restored_demo1.png" in files
    metrics = [
        json.loads(line)
        for line in (out_dir / "val_metrics.jsonl").read_text().splitlines()
    ]
    assert len(metrics) == 2
    assert all("psnr" in m for m in metrics)


@pytest.mark.slow
def test_spotter_eval_cli_smoke():
    """Spotting-only eval end to end on the synthetic dataset: degradation
    conditioning, fixed-timestep feature tap, ICDAR scoring, JSON output."""
    r = _run([
        "spotter_eval.py", "--config", "configs/train_smoke.yaml",
        "--num-images", "2", "--score-threshold", "0.0",
    ])
    assert r.returncode == 0, r.stdout + r.stderr
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    scores = json.loads(line)
    assert "det_hmean" in scores and "e2e_hmean" in scores


@pytest.mark.slow
def test_val_patches_cli_smoke(tmp_path):
    out_dir = tmp_path / "patches_out"
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        "model_preset: tiny\ndtype: float32\nval:\n"
        f"  lq_dir: {REPO}/assets/smoke/lq\n"
        f"  gt_dir: {REPO}/assets/smoke/gt\n"
        f"  output_dir: {out_dir}\n  steps: 2\n"
        "  patch_size: 16\n  overlap: 4\n  out_scale: 4\n  chunk: 8\n"
        "  tiled_ocr_loop: false\n"
    )
    r = _run(["val_patches.py", "--config", str(cfg)])
    assert r.returncode == 0, r.stdout + r.stderr
    files = os.listdir(out_dir)
    assert any(f.startswith("restored_") for f in files)


def test_image_splitter_cli(tmp_path):
    from PIL import Image
    import numpy as np

    src = tmp_path / "in"
    dst = tmp_path / "out"
    src.mkdir()
    Image.fromarray(np.zeros((300, 260, 3), np.uint8)).save(src / "a.png")
    r = _run(
        ["image_splitter.py", "--input-dir", str(src), "--output-dir", str(dst)],
        timeout=120,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    tiles = list(dst.rglob("*.png"))
    # non-overlapping 128^2 tiles: 2x2 grid fits fully inside 300x260
    assert len(tiles) == 4
    assert all(Image.open(t).size == (128, 128) for t in tiles)

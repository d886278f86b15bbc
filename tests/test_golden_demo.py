"""Golden-image regression anchors on the reference demo crops.

Mirrors the reference's only QC mechanism (README:152-176: run the demo
images, compare against committed expected outputs). The goldens in
tests/goldens/ were produced by scripts/make_goldens.py with fixed seeds on
the CPU backend; this test recomputes the restoration and requires the
result to stay within a small pixel tolerance — catching any behavioral
drift through the whole stack (SwinIR clean -> VAE -> CLIP -> ControlNet/
UNet -> spaced sampler -> VAE decode) while tolerating XLA-version-level
float noise.
"""

import os
import sys

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_demo_restoration_matches_goldens():
    from PIL import Image

    from make_goldens import golden_restore

    names, restored = golden_restore()
    assert len(names) == 4
    for f, out in zip(names, restored):
        path = os.path.join(GOLDEN_DIR, f.replace(".jpg", ".png"))
        if not os.path.exists(path):
            pytest.fail(
                f"golden {path} missing — run scripts/make_goldens.py and "
                "commit the outputs"
            )
        golden = np.asarray(Image.open(path), np.float32) / 255.0
        got = np.clip(out, 0, 1)
        mad = np.abs(got - golden).mean()
        p99 = np.quantile(np.abs(got - golden), 0.99)
        assert mad < 1.5 / 255, f"{f}: mean abs diff {mad * 255:.2f}/255"
        assert p99 < 8 / 255, f"{f}: p99 abs diff {p99 * 255:.2f}/255"

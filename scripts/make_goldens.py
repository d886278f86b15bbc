"""(Re)generate the demo-image golden regression anchors.

Runs the reference demo LQ crops (assets/demo/lq, from
/root/reference/assets/demo_imgs — the reference's only QC mechanism,
README:152-176) through the tiny pipeline with fixed seeds and writes the
restored outputs to tests/goldens/. Commit the outputs; tests compare
against them with a pixel tolerance (tests/test_golden_demo.py).

Run under the test env:
  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/make_goldens.py
"""

import os

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")
DEMO_LQ = os.path.join(os.path.dirname(__file__), "..", "assets", "demo", "lq")


def golden_restore():
    """The exact computation the golden pins: tiny model, fixed seeds,
    4 demo crops at 64^2, 4 spaced-DDPM steps."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from tair_tpu.pipeline import build_tiny_model

    model = build_tiny_model()
    params = model.init(jax.random.PRNGKey(0))

    imgs = []
    names = sorted(os.listdir(DEMO_LQ))
    for f in names:
        im = Image.open(os.path.join(DEMO_LQ, f)).convert("RGB")
        im = im.resize((64, 64), Image.BICUBIC)
        imgs.append(np.asarray(im, np.float32) / 255.0)
    lq = jnp.asarray(np.stack(imgs))
    tokens = jnp.zeros((lq.shape[0], 77), jnp.int32)

    restored, _, _ = jax.jit(
        lambda p, x, t, r: model.restore(p, x, t, r, steps=4)
    )(params, lq, tokens, jax.random.PRNGKey(7))
    return names, np.asarray(restored)


def main():
    from PIL import Image

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    names, restored = golden_restore()
    for f, out in zip(names, restored):
        dst = os.path.join(GOLDEN_DIR, f.replace(".jpg", ".png"))
        Image.fromarray((np.clip(out, 0, 1) * 255).astype(np.uint8)).save(dst)
        print("wrote", dst)


if __name__ == "__main__":
    main()

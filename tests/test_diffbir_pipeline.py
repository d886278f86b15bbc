import jax
import jax.numpy as jnp
import numpy as np

from tair_tpu.diffbir_pipeline import DiffBIRPipeline
from tair_tpu.models.tokenizer import tokenize
from tair_tpu.pipeline import build_tiny_model
from tair_tpu.utils.caption import EmptyCaptioner, build_captioner
from tair_tpu.utils.guidance import MSEGuidance


def test_diffbir_pipeline_nonmultiple_size_and_colorfix():
    model = build_tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    pipe = DiffBIRPipeline(model)
    # H, W deliberately not multiples of 64 -> exercises pad + crop
    lq = jax.random.uniform(jax.random.PRNGKey(1), (1, 80, 100, 3))
    toks = jnp.asarray(tokenize([""]))
    out = pipe.run(params, lq, toks, jax.random.PRNGKey(2), steps=2)
    assert out.shape == (1, 80, 100, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_diffbir_pipeline_with_guidance():
    model = build_tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    pipe = DiffBIRPipeline(model)
    lq = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    toks = jnp.asarray(tokenize([""]))
    out = pipe.run(
        params, lq, toks, jax.random.PRNGKey(2), steps=2,
        guidance=MSEGuidance(scale=1e-4), color_fix=False,
    )
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_captioner_registry():
    assert build_captioner("empty")(np.zeros((8, 8, 3))) == ""
    assert isinstance(build_captioner("none"), EmptyCaptioner)
    try:
        build_captioner("llava")
        raise AssertionError("should have raised")
    except ValueError:
        pass

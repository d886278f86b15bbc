import jax
import jax.numpy as jnp
import numpy as np

from tair_tpu.models.clip import CLIPTextConfig, CLIPTextTower
from tair_tpu.models.tokenizer import get_tokenizer, tokenize
from tair_tpu.models.vae import AutoencoderKL, VAEConfig, vae_decode, vae_encode

TINY_VAE = VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1)
TINY_CLIP = CLIPTextConfig(width=64, heads=4, layers=3)


def test_tokenizer_known_ids():
    # Canonical OpenAI-CLIP BPE ids for a standard phrase.
    toks = tokenize("a photo of a cat")
    expected = [49406, 320, 1125, 539, 320, 2368, 49407]
    assert toks.shape == (1, 77)
    assert list(toks[0, : len(expected)]) == expected
    assert toks[0, len(expected):].sum() == 0


def test_tokenizer_roundtrip_and_truncation():
    tok = get_tokenizer()
    text = "Hello WORLD, restoration!"
    ids = tok.encode(text)
    assert tok.decode(ids).strip() == "hello world , restoration !"
    long = tokenize(" ".join(["word"] * 200))
    assert long.shape == (1, 77)
    assert long[0, -1] == tok.eot_token
    assert long[0, 0] == tok.sot_token


def test_tokenizer_caption_prompt_style():
    # the TAIR CAPTION prompt template must tokenize without error
    texts = ['"STOP"', '"open"']
    caption = (
        f"A realistic scene where the texts {', '.join(texts)} appear clearly "
        "on signs, boards, buildings, or other objects."
    )
    toks = tokenize(caption)
    assert toks[0, 0] == 49406
    assert (toks[0] == 49407).sum() == 1


def test_vae_shapes_and_determinism():
    vae = AutoencoderKL(TINY_VAE)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3))
    params = vae.init(jax.random.PRNGKey(1), x)
    z = vae_encode(vae, params, x)  # mode (deterministic)
    assert z.shape == (1, 8, 8, 4)  # f=2**(len(ch_mult)-1)=2 downsamples
    z2 = vae_encode(vae, params, x)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(z2))
    rec = vae_decode(vae, params, z)
    assert rec.shape == x.shape


def test_vae_sample_uses_rng():
    vae = AutoencoderKL(TINY_VAE)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3))
    params = vae.init(jax.random.PRNGKey(1), x)
    za = vae_encode(vae, params, x, rng=jax.random.PRNGKey(2), sample=True)
    zb = vae_encode(vae, params, x, rng=jax.random.PRNGKey(3), sample=True)
    assert not np.allclose(np.asarray(za), np.asarray(zb))


def test_clip_tower_shapes_and_penultimate():
    tower = CLIPTextTower(TINY_CLIP)
    toks = jnp.asarray(tokenize(["hello world", ""]))
    params = tower.init(jax.random.PRNGKey(0), toks)
    out = tower.apply(params, toks)
    assert out.shape == (2, 77, TINY_CLIP.width)
    # penultimate config must create layers-1 blocks
    names = set(params["params"].keys())
    assert "block_0" in names and "block_1" in names and "block_2" not in names


def test_clip_causal_mask():
    """Changing a later token must not affect earlier positions' embeddings."""
    tower = CLIPTextTower(TINY_CLIP)
    t1 = jnp.asarray(tokenize("a photo of a cat"))
    t2 = np.asarray(t1).copy()
    t2[0, 5] = 999  # mutate token at position 5
    t2 = jnp.asarray(t2)
    params = tower.init(jax.random.PRNGKey(0), t1)
    o1 = tower.apply(params, t1)
    o2 = tower.apply(params, t2)
    np.testing.assert_allclose(
        np.asarray(o1[0, :5]), np.asarray(o2[0, :5]), atol=1e-5
    )
    assert not np.allclose(np.asarray(o1[0, 5:]), np.asarray(o2[0, 5:]))

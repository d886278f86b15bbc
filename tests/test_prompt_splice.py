import jax.numpy as jnp
import numpy as np

from tair_tpu.models.prompt_splice import splice_tag_prompt
from tair_tpu.models.tokenizer import get_tokenizer, tokenize
from tair_tpu.spotter.charset import CTLABELS, PAD_ID, encode_text


def _recs(words, k=6, nw=25):
    arr = np.full((1, k, nw), PAD_ID, np.int32)
    for i, w in enumerate(words):
        arr[0, i, : len(w)] = [CTLABELS.index(c) for c in w]
    return jnp.asarray(arr)


def test_splice_decodes_to_tag_prompt():
    tok = get_tokenizer()
    recs = _recs(["STOP", "open"])
    scores = jnp.asarray([[0.9, 0.8, 0, 0, 0, 0]], jnp.float32)
    keep = jnp.asarray([[True, True, False, False, False, False]])
    frame = np.asarray(splice_tag_prompt(recs, scores, keep))
    assert frame.shape == (1, 77)
    assert frame[0, 0] == tok.sot_token
    ids = [int(t) for t in frame[0, 1:] if t not in (0, tok.eot_token)]
    assert tok.decode(ids).strip() == "stop , open"
    # exactly one EOT
    assert (frame[0] == tok.eot_token).sum() == 1
    # nothing after EOT
    eot = int(np.argmax(frame[0] == tok.eot_token))
    assert (frame[0, eot + 1 :] == 0).all()


def test_splice_single_char_words_match_canonical_tokenizer():
    # single-character words: char-level splicing == canonical BPE
    recs = _recs(["a", "b"])
    scores = jnp.asarray([[0.9, 0.8, 0, 0, 0, 0]], jnp.float32)
    keep = jnp.asarray([[True, True, False, False, False, False]])
    frame = np.asarray(splice_tag_prompt(recs, scores, keep))
    ref = tokenize("a , b")[0]
    np.testing.assert_array_equal(frame[0], ref)


def test_splice_empty_keep_gives_empty_prompt():
    tok = get_tokenizer()
    recs = _recs([])
    scores = jnp.zeros((1, 6))
    keep = jnp.zeros((1, 6), bool)
    frame = np.asarray(splice_tag_prompt(recs, scores, keep))
    assert frame[0, 0] == tok.sot_token
    assert frame[0, 1] == tok.eot_token
    assert (frame[0, 2:] == 0).all()


def test_splice_ranks_by_score_and_caps_words():
    recs = _recs(["AA", "BB", "CC", "DD", "EE"])
    scores = jnp.asarray([[0.1, 0.9, 0.5, 0.8, 0.7, 0.0]], jnp.float32)
    keep = jnp.asarray([[True, True, True, True, True, False]])
    frame = np.asarray(splice_tag_prompt(recs, scores, keep, max_words=2))
    tok = get_tokenizer()
    ids = [int(t) for t in frame[0, 1:] if t not in (0, tok.eot_token)]
    assert tok.decode(ids).strip() == "bb , dd"

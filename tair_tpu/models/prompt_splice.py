"""On-device prompt assembly from spotter predictions (jit-safe feedback).

The reference's val_sample loop leaves the compiled graph every step to
tokenize the OCR'd text on host (spaced_sampler.py:303-317) — the "hardest
correctness-vs-jit tension" of the system. This module closes the loop
ON DEVICE: every printable-ASCII character is itself a valid CLIP BPE token
(byte tokens and their '</w>' end-of-word forms), so a predicted word can be
spliced token-by-token from two precomputed 95-entry lookup tables, and the
whole TAG-style prompt ("w1, w2, ...") assembled with cumsum positions and
one scatter — no host round-trip.

Divergence note: char-level tokenization is a valid but non-canonical BPE
segmentation (e.g. "stop" becomes s,t,o,p</w> instead of the single token
"stop</w>"); CLIP is robust to it, and the host-loop path
(pipeline.restore_with_ocr_feedback) remains the exact-parity reference.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..spotter.charset import CTLABELS, PAD_ID
from .tokenizer import CONTEXT_LENGTH, get_tokenizer


@functools.lru_cache()
def char_token_tables() -> Tuple[np.ndarray, np.ndarray, int, int, int]:
    """(mid[95], end[95], comma_id, sot, eot): CLIP token ids per charset char
    in mid-word and end-of-word form."""
    tok = get_tokenizer()
    mid = np.zeros(len(CTLABELS), np.int32)
    end = np.zeros(len(CTLABELS), np.int32)
    for i, ch in enumerate(CTLABELS):
        enc = tok.byte_encoder[ord(ch.lower())]
        mid[i] = tok.encoder.get(enc, 0)
        end[i] = tok.encoder.get(enc + "</w>", mid[i])
    comma = tok.encoder[","] if "," in tok.encoder else tok.encoder[",</w>"]
    comma_end = tok.encoder.get(",</w>", comma)
    return mid, end, comma_end, tok.sot_token, tok.eot_token


def splice_tag_prompt(
    recs: jnp.ndarray,        # [B, K, Nw] predicted char ids (PAD_ID padded)
    scores: jnp.ndarray,      # [B, K] instance scores
    keep: jnp.ndarray,        # [B, K] bool
    max_words: int = 4,
) -> jnp.ndarray:             # [B, 77] int32 CLIP tokens
    """Assemble TAG-style prompts ("word1, word2, ...") on device."""
    mid_t, end_t, comma_id, sot, eot = char_token_tables()
    mid_t = jnp.asarray(mid_t)
    end_t = jnp.asarray(end_t)
    b, k, nw = recs.shape
    ctx = CONTEXT_LENGTH

    # pick the top max_words kept instances by score
    ranked = jnp.where(keep, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(ranked, max_words)       # [B, W]
    words = jnp.take_along_axis(recs, top_idx[..., None], axis=1)  # [B, W, Nw]
    word_valid = jnp.isfinite(top_scores)                        # [B, W]

    # per-word char validity and lengths (chars after the first PAD ignored)
    is_char = words < len(CTLABELS)                              # [B, W, Nw]
    first_pad = jnp.cumprod(is_char, axis=-1)                    # run of chars
    char_valid = first_pad.astype(bool) & word_valid[..., None]
    lengths = char_valid.sum(-1)                                 # [B, W]
    has_word = lengths > 0

    # token per char: end-form on the word's last char, else mid-form
    pos_in_word = jnp.cumsum(char_valid, axis=-1) - 1
    is_last = char_valid & (pos_in_word == (lengths[..., None] - 1))
    safe = jnp.clip(words, 0, len(CTLABELS) - 1)
    char_tok = jnp.where(is_last, end_t[safe], mid_t[safe])

    # word slots: chars + one separator (comma) after each non-final word
    n_words = has_word.sum(-1, keepdims=True)                    # [B, 1]
    word_order = jnp.cumsum(has_word, -1) - 1                    # index among kept
    sep_valid = has_word & (word_order < n_words - 1)            # [B, W]

    # flatten (char tokens ++ separator) per word with cumsum positions
    unit_len = lengths + sep_valid                               # [B, W]
    word_start = jnp.cumsum(unit_len, -1) - unit_len + 1         # +1 for SOT
    char_pos = word_start[..., None] + pos_in_word               # [B, W, Nw]
    sep_pos = word_start + lengths                               # [B, W]

    total = 1 + unit_len.sum(-1)                                 # EOT position

    frame = jnp.zeros((b, ctx + nw), jnp.int32)                  # overflow room
    bi = jnp.arange(b)[:, None, None]
    frame = frame.at[
        bi, jnp.where(char_valid, jnp.clip(char_pos, 0, ctx + nw - 1), ctx)
    ].set(jnp.where(char_valid, char_tok, 0), mode="drop")
    frame = frame.at[
        jnp.arange(b)[:, None],
        jnp.where(sep_valid, jnp.clip(sep_pos, 0, ctx + nw - 1), ctx + nw - 1),
    ].set(jnp.where(sep_valid, comma_id, 0), mode="drop")

    frame = frame[:, :ctx]
    frame = frame.at[:, 0].set(sot)
    eot_pos = jnp.clip(total, 1, ctx - 1)
    frame = frame.at[jnp.arange(b), eot_pos].set(eot)
    # zero everything past EOT (scatter overflow hygiene)
    past = jnp.arange(ctx)[None] > eot_pos[:, None]
    frame = jnp.where(past, 0, frame)
    return frame

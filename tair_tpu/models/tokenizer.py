"""CLIP byte-pair-encoding tokenizer (pure Python, host-side).

Functional parity with the vendored open_clip SimpleTokenizer
(/root/reference/terediff/model/open_clip/tokenizer.py:72-201): lowercased,
whitespace-normalized BPE over byte-to-unicode text, SOT/EOT framing,
77-token context with EOT-preserving truncation. The merge table
(`bpe_simple_vocab_16e6.txt.gz`) is public OpenAI-CLIP vocabulary data
shipped as an asset. Implemented from the published BPE algorithm; this
module never runs inside jit — prompts are tokenized on host and the token
ids fed to the on-device text tower.
"""

from __future__ import annotations

import functools
import gzip
import html
import os
import re
from typing import Iterable, List, Union

import regex

import numpy as np

DEFAULT_BPE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets",
    "bpe_simple_vocab_16e6.txt.gz",
)

CONTEXT_LENGTH = 77


@functools.lru_cache()
def _bytes_to_unicode():
    """Reversible mapping from bytes to printable unicode chars (GPT-2 style)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word):
    return {(a, b) for a, b in zip(word[:-1], word[1:])}


def _basic_clean(text: str) -> str:
    # The reference uses ftfy.fix_text; ftfy is not in this image, so we do
    # the html-unescape part (the common effect on ASCII prompts is identical).
    return html.unescape(html.unescape(text)).strip()


def _whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


class SimpleTokenizer:
    def __init__(self, bpe_path: str = DEFAULT_BPE_PATH):
        self.byte_encoder = _bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
            merges = f.read().split("\n")
        merges = merges[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges]

        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        vocab.extend(["<start_of_text>", "<end_of_text>"])

        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {
            "<start_of_text>": "<start_of_text>",
            "<end_of_text>": "<end_of_text>",
        }
        self.pat = regex.compile(
            r"<start_of_text>|<end_of_text>|'s|'t|'re|'ve|'m|'ll|'d"
            r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
            regex.IGNORECASE,
        )
        self.sot_token = self.encoder["<start_of_text>"]
        self.eot_token = self.encoder["<end_of_text>"]
        self.vocab_size = len(self.encoder)

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"

        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        bpe_tokens: List[int] = []
        text = _whitespace_clean(_basic_clean(text)).lower()
        for token in regex.findall(self.pat, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return bpe_tokens

    def decode(self, tokens: Iterable[int]) -> str:
        text = "".join(self.decoder[int(t)] for t in tokens)
        return (
            bytearray(self.byte_decoder[c] for c in text)
            .decode("utf-8", errors="replace")
            .replace("</w>", " ")
        )


_GLOBAL_TOKENIZER: SimpleTokenizer | None = None


def get_tokenizer() -> SimpleTokenizer:
    global _GLOBAL_TOKENIZER
    if _GLOBAL_TOKENIZER is None:
        _GLOBAL_TOKENIZER = SimpleTokenizer()
    return _GLOBAL_TOKENIZER


def tokenize(
    texts: Union[str, List[str]], context_length: int = CONTEXT_LENGTH
) -> np.ndarray:
    """Tokenize prompt(s) -> int32 [batch, context_length] with SOT/EOT framing.

    Over-long prompts are truncated with EOT forced into the last slot,
    matching open_clip's truncate behavior.
    """
    if isinstance(texts, str):
        texts = [texts]
    tok = get_tokenizer()
    result = np.zeros((len(texts), context_length), dtype=np.int32)
    for i, text in enumerate(texts):
        ids = [tok.sot_token] + tok.encode(text) + [tok.eot_token]
        if len(ids) > context_length:
            ids = ids[:context_length]
            ids[-1] = tok.eot_token
        result[i, : len(ids)] = ids
    return result


def empty_tokens(batch: int, context_length: int = CONTEXT_LENGTH) -> np.ndarray:
    """Empty-prompt token batch ([SOT, EOT, 0...]) — the CFG uncond branch
    and the prompt-recycling loop's initial condition share this framing."""
    tok = get_tokenizer()
    out = np.zeros((batch, context_length), np.int32)
    out[:, 0] = tok.sot_token
    out[:, 1] = tok.eot_token
    return out

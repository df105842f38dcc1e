"""CLIP byte-pair-encoding tokenizer (self-contained, no downloads).

The reference tokenizes through HF ``AutoTokenizer`` (``generate_data.py:
891-900``, ``tokenize_prompt`` at ``:770-784``). We implement CLIP's BPE
directly: given the standard ``bpe_simple_vocab_16e6.txt.gz`` merges file
(pass its path, or set ``DISTDIFF_CLIP_BPE``), tokenization is equivalent.
When no merges file is available (air-gapped test environments) a
deterministic hash tokenizer stands in — same API, same shapes, stable ids —
so every downstream shape/caching path still runs.
"""

from __future__ import annotations

import functools
import gzip
import html
import os
import re
from typing import List, Optional, Sequence

import numpy as np


@functools.lru_cache()
def _bytes_to_unicode():
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(2**8):
        if b not in bs:
            bs.append(b)
            cs.append(2**8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _basic_clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    return re.sub(r"\s+", " ", text).strip().lower()


_PAT = re.compile(
    r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"
    if False  # \p classes need `regex`; plain `re` fallback below is CLIP's ASCII-equivalent
    else r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+"
)


class CLIPTokenizer:
    """BPE tokenizer with CLIP's vocab layout: 256 byte tokens, 256 byte
    tokens + '</w>', 48894 merge tokens, <|startoftext|>, <|endoftext|>."""

    def __init__(self, bpe_path: str, max_length: int = 77,
                 vocab_path: Optional[str] = None):
        """``bpe_path``: OpenAI ``bpe_simple_vocab_16e6.txt.gz`` or a HF
        ``merges.txt`` (both start with a header line). ``vocab_path``: an
        optional HF ``vocab.json`` giving the authoritative token->id map
        (diffusers checkpoints ship both under ``tokenizer/``); without it
        the standard CLIP layout is reconstructed from the merges."""
        self.max_length = max_length
        opener = gzip.open if bpe_path.endswith(".gz") else open
        with opener(bpe_path, "rt", encoding="utf-8") as f:
            merges = f.read().split("\n")
        merges = merges[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges if m]
        self.byte_encoder = _bytes_to_unicode()
        if vocab_path:
            import json

            with open(vocab_path, encoding="utf-8") as f:
                self.encoder = json.load(f)
        else:
            vocab = list(self.byte_encoder.values())
            vocab = vocab + [v + "</w>" for v in vocab]
            for m in merges:
                vocab.append("".join(m))
            vocab.extend(["<|startoftext|>", "<|endoftext|>"])
            self.encoder = {v: i for i, v in enumerate(vocab)}
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.bot = self.encoder["<|startoftext|>"]
        self.eot = self.encoder["<|endoftext|>"]
        self._cache = {}

    def _bpe(self, token: str) -> List[str]:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = set(zip(word[:-1], word[1:]))
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                if (
                    i < len(word) - 1
                    and word[i] == first
                    and word[i + 1] == second
                ):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
        self._cache[token] = list(word)
        return list(word)

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for tok in _PAT.findall(_basic_clean(text)):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(tok))
        return ids

    def __call__(self, texts) -> np.ndarray:
        """Tokenize to ``[B, max_length]`` int32 with bot/eot + eot padding
        (CLIP pads with eot; HF's CLIPTokenizer pads likewise for SD)."""
        if isinstance(texts, str):
            texts = [texts]
        out = np.full((len(texts), self.max_length), self.eot, np.int32)
        for i, t in enumerate(texts):
            ids = [self.bot] + self.encode(t)[: self.max_length - 2] + [self.eot]
            out[i, : len(ids)] = ids
        return out


class HashTokenizer:
    """Deterministic stand-in tokenizer for environments without the BPE
    merges file: word -> stable hash bucket. NOT equivalent to CLIP BPE —
    only for tests and synthetic runs (real runs should provide merges)."""

    def __init__(self, vocab_size: int = 49408, max_length: int = 77):
        self.vocab_size = vocab_size
        self.max_length = max_length
        self.bot = vocab_size - 2
        self.eot = vocab_size - 1

    def encode(self, text: str) -> List[int]:
        import hashlib

        ids = []
        for w in _basic_clean(text).split():
            h = int(hashlib.md5(w.encode()).hexdigest(), 16)
            ids.append(h % (self.vocab_size - 2))
        return ids

    def __call__(self, texts) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        out = np.full((len(texts), self.max_length), self.eot, np.int32)
        for i, t in enumerate(texts):
            ids = [self.bot] + self.encode(t)[: self.max_length - 2] + [self.eot]
            out[i, : len(ids)] = ids
        return out


def discover_bpe(checkpoint_dir: Optional[str]):
    """Find the tokenizer files a diffusers checkpoint ships alongside its
    weights (``{dir}/tokenizer/merges.txt`` + ``vocab.json``). Returns
    (merges_path, vocab_path_or_None) or (None, None)."""
    if not checkpoint_dir or not os.path.isdir(checkpoint_dir):
        return None, None
    for sub in ("tokenizer", "."):
        m = os.path.join(checkpoint_dir, sub, "merges.txt")
        if os.path.exists(m):
            v = os.path.join(checkpoint_dir, sub, "vocab.json")
            return m, (v if os.path.exists(v) else None)
    return None, None


def load_tokenizer(
    bpe_path: Optional[str] = None,
    max_length: int = 77,
    vocab_size: int = 49408,
    checkpoint_dir: Optional[str] = None,
    strict: bool = False,
):
    """Real CLIP BPE if a merges file is available, else hash stand-in.

    Resolution order: explicit ``bpe_path`` -> ``DISTDIFF_CLIP_BPE`` env ->
    auto-discovery inside ``checkpoint_dir`` (diffusers checkpoints ship
    ``tokenizer/merges.txt``). With ``strict=True`` (real SD weights were
    provided) the hash fallback RAISES instead of silently producing wrong
    text conditioning — reference loads a real tokenizer unconditionally
    (``generate_data.py:891-900``).
    """
    import logging

    bpe_path = bpe_path or os.environ.get("DISTDIFF_CLIP_BPE")
    vocab_path = None
    if not (bpe_path and os.path.exists(bpe_path)):
        bpe_path, vocab_path = discover_bpe(checkpoint_dir)
    if bpe_path and os.path.exists(bpe_path):
        return CLIPTokenizer(bpe_path, max_length=max_length,
                             vocab_path=vocab_path)
    msg = (
        "no CLIP BPE merges file found (tried --bpe_path, $DISTDIFF_CLIP_BPE"
        + (f", {checkpoint_dir}/tokenizer/merges.txt" if checkpoint_dir else "")
        + ") — the HashTokenizer fallback produces ids that do NOT match "
        "real CLIP text-encoder weights"
    )
    if strict:
        raise RuntimeError(msg + "; refusing to run with real SD weights.")
    logging.getLogger("distdiff.tokenizer").warning(
        "%s; proceeding (synthetic/test run).", msg
    )
    return HashTokenizer(vocab_size=vocab_size, max_length=max_length)

"""CLIP byte-level BPE tokenizer, self-contained pure python.

Functionally equivalent to the vendored OpenAI tokenizer the reference uses
(reference: src/models/base/clip_tokenize.py + the ``tokenize()`` wrapper at
src/models/clip.py:210-249): byte->unicode vocab, 48,894 merge rules, a
case-insensitive word/number/punctuation split pattern, ``</w>`` end-of-word
markers, SOT/EOT specials, and fixed-length [N, 77] int output with optional
truncation (truncated sequences keep EOT as the last token).

Text cleaning: the reference runs ftfy.fix_text + double html.unescape +
whitespace collapse + lowercase. ftfy is a no-op on the clean ASCII of
MUSIC-AVQA questions and is not in this image, so cleaning here is the
html/whitespace/lowercase part; a hook is kept for ftfy when available.

The BPE merge table ships with OpenAI CLIP (public,
``bpe_simple_vocab_16e6.txt.gz``). The file is located via, in order: an
explicit argument, the ``QA_TIGER_BPE_VOCAB`` env var, the package assets
dir, and known local checkouts.
"""
from __future__ import annotations

import functools
import gzip
import html
import os
from pathlib import Path
from typing import Dict, List, Sequence, Tuple, Union

import numpy as np

try:
    import regex as re  # supports \p{L}/\p{N} classes
except ImportError as _exc:  # pragma: no cover
    raise ImportError("the 'regex' package is required for the tokenizer") from _exc

CONTEXT_LENGTH = 77
SOT_TOKEN = "<|startoftext|>"
EOT_TOKEN = "<|endoftext|>"

_VOCAB_SEARCH_PATHS = (
    Path(__file__).resolve().parent / "assets" / "bpe_simple_vocab_16e6.txt.gz",
    Path("/root/reference/src/models/base/bpe_simple_vocab_16e6.txt.gz"),
)


def find_vocab_file(path: Union[str, Path, None] = None) -> Path:
    if path is not None:
        return Path(path)
    env = os.environ.get("QA_TIGER_BPE_VOCAB")
    if env:
        return Path(env)
    for cand in _VOCAB_SEARCH_PATHS:
        if cand.exists():
            return cand
    raise FileNotFoundError(
        "CLIP BPE vocab not found; set QA_TIGER_BPE_VOCAB or pass a path"
    )


@functools.lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2 style reversible byte -> printable unicode char mapping."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word: Tuple[str, ...]) -> set:
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def _clean(text: str) -> str:
    try:  # ftfy when available (matches reference basic_clean exactly)
        import ftfy

        text = ftfy.fix_text(text)
    except ImportError:
        pass
    text = html.unescape(html.unescape(text))
    text = re.sub(r"\s+", " ", text)
    return text.strip()


class ClipTokenizer:
    def __init__(self, vocab_path: Union[str, Path, None] = None):
        vocab_file = find_vocab_file(vocab_path)
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}

        with gzip.open(vocab_file, "rt", encoding="utf-8") as f:
            lines = f.read().split("\n")
        # line 0 is a header; CLIP uses merges [1 : 49152-256-2+1)
        merge_lines = lines[1: 49152 - 256 - 2 + 1]
        merges = [tuple(line.split()) for line in merge_lines]

        base = list(bytes_to_unicode().values())
        vocab: List[str] = base + [c + "</w>" for c in base]
        vocab.extend("".join(m) for m in merges)
        vocab.extend([SOT_TOKEN, EOT_TOKEN])

        self.encoder: Dict[str, int] = {tok: i for i, tok in enumerate(vocab)}
        self.decoder: Dict[int, str] = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks: Dict[Tuple[str, str], int] = {
            m: i for i, m in enumerate(merges)
        }
        self._cache: Dict[str, str] = {SOT_TOKEN: SOT_TOKEN, EOT_TOKEN: EOT_TOKEN}
        self._pattern = re.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"""
            r"""|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            re.IGNORECASE,
        )

    @property
    def sot_id(self) -> int:
        return self.encoder[SOT_TOKEN]

    @property
    def eot_id(self) -> int:
        return self.encoder[EOT_TOKEN]

    def bpe(self, token: str) -> str:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
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
        merged = " ".join(word)
        self._cache[token] = merged
        return merged

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        text = _clean(text).lower()
        for token in re.findall(self._pattern, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        text = "".join(self.decoder[i] for i in ids)
        raw = bytearray(self.byte_decoder[c] for c in text)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")

    def __call__(self, texts: Union[str, Sequence[str]],
                 context_length: int = CONTEXT_LENGTH,
                 truncate: bool = False) -> np.ndarray:
        """Tokenize to a fixed [N, context_length] int64 array
        (semantics of reference tokenize(), src/models/clip.py:210-249)."""
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), context_length), dtype=np.int64)
        for i, text in enumerate(texts):
            ids = [self.sot_id] + self.encode(text) + [self.eot_id]
            if len(ids) > context_length:
                if truncate:
                    ids = ids[:context_length]
                    ids[-1] = self.eot_id
                else:
                    raise RuntimeError(
                        f"Input {text!r} is too long for context length "
                        f"{context_length}"
                    )
            out[i, : len(ids)] = ids
        return out


@functools.lru_cache()
def _default_tokenizer() -> ClipTokenizer:
    return ClipTokenizer()


def tokenize(texts: Union[str, Sequence[str]],
             context_length: int = CONTEXT_LENGTH,
             truncate: bool = False) -> np.ndarray:
    """Module-level convenience mirroring ``clip.tokenize``."""
    return _default_tokenizer()(texts, context_length, truncate)

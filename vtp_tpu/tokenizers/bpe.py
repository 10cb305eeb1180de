"""OpenAI-CLIP byte-level BPE tokenizer.

Behavioral reference: ``vtp/tokenizers/text_tokenizer.py:144-294`` (which
is itself the OpenAI CLIP tokenizer). Token-ID output must match exactly
for zero-shot parity: vocab = 256 byte symbols + 256 ``</w>`` variants +
48,894 merges + ``<start_of_text>``/``<end_of_text>`` = 49,408.

The merge table ships as ``bpe_simple_vocab_16e6.txt.gz``; we read it
from ``$VTP_BPE_PATH``, the package directory, or the mounted reference
checkout — the file is data, not code, and is not vendored here.

Differences from the reference implementation (behavior-preserving):
  * returns numpy int32 arrays rather than torch tensors;
  * ftfy text fixing degrades to identity when ftfy is absent (the
    reference does the same, text_tokenizer.py:13-19);
  * adds ``encode_batch`` with an LRU-cached word->BPE map sized for the
    80k-template zero-shot classifier build (SURVEY.md section 7,
    "Python BPE throughput").
"""

from __future__ import annotations

import functools
import gzip
import html
import os
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

try:
    import ftfy

    _fix_text = ftfy.fix_text
except ImportError:  # pragma: no cover
    _fix_text = lambda s: s

import regex as re

DEFAULT_CONTEXT_LENGTH = 77

_VOCAB_CANDIDATES = (
    os.environ.get("VTP_BPE_PATH", ""),
    os.path.join(os.path.dirname(__file__), "bpe_simple_vocab_16e6.txt.gz"),
    "/root/reference/tools/bpe_simple_vocab_16e6.txt.gz",
)


def find_bpe_vocab() -> str:
    for path in _VOCAB_CANDIDATES:
        if path and os.path.exists(path):
            return path
    raise FileNotFoundError(
        "bpe_simple_vocab_16e6.txt.gz not found; set VTP_BPE_PATH to the "
        "OpenAI CLIP BPE vocab file."
    )


@functools.lru_cache()
def byte_to_unicode() -> Dict[int, str]:
    """GPT-2 reversible byte<->unicode table: printable latin-1 ranges map
    to themselves, the rest to U+0100+."""
    keep = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    mapping = {b: chr(b) for b in keep}
    offset = 0
    for b in range(256):
        if b not in mapping:
            mapping[b] = chr(256 + offset)
            offset += 1
    return mapping


def _clean(text: str, lowercase: bool = True) -> str:
    text = _fix_text(text)
    text = html.unescape(html.unescape(text)).strip()
    text = " ".join(text.split()).strip()
    return text.lower() if lowercase else text


class SimpleTokenizer:
    """CLIP BPE with numpy output."""

    def __init__(
        self,
        bpe_path: Optional[str] = None,
        additional_special_tokens: Optional[List[str]] = None,
        context_length: Optional[int] = DEFAULT_CONTEXT_LENGTH,
        clean: str = "lower",
    ):
        bpe_path = bpe_path or find_bpe_vocab()
        self.byte_encoder = byte_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}

        with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
            lines = f.read().split("\n")
        # first line is a version header; the table holds 49152-256-2 merges
        merge_lines = lines[1 : 49152 - 256 - 2 + 1]
        merges: List[Tuple[str, str]] = [tuple(l.split()) for l in merge_lines]

        base = list(self.byte_encoder.values())
        vocab = base + [s + "</w>" for s in base]
        vocab.extend("".join(m) for m in merges)
        specials = ["<start_of_text>", "<end_of_text>"]
        if additional_special_tokens:
            specials = specials + list(additional_special_tokens)
        vocab.extend(specials)

        self.encoder: Dict[str, int] = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks: Dict[Tuple[str, str], int] = {m: i for i, m in enumerate(merges)}
        self._word_cache: Dict[str, List[str]] = {s: [s] for s in specials}

        self.pat = re.compile(
            "|".join(specials)
            + r"""|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            re.IGNORECASE,
        )
        self.vocab_size = len(self.encoder)
        self.all_special_ids = [self.encoder[s] for s in specials]
        self.sot_token_id = self.all_special_ids[0]
        self.eot_token_id = self.all_special_ids[1]
        self.context_length = context_length
        self.lowercase = clean != "whitespace"

    # ------------------------------------------------------------- BPE

    def _merge_word(self, token: str) -> List[str]:
        """Greedy lowest-rank merging of one pre-token (with </w>)."""
        cached = self._word_cache.get(token)
        if cached is not None:
            return cached
        parts: List[str] = list(token[:-1]) + [token[-1] + "</w>"]
        if len(parts) == 1:
            self._word_cache[token] = parts
            return parts
        ranks = self.bpe_ranks
        while len(parts) > 1:
            best_rank = None
            best_i = -1
            for i in range(len(parts) - 1):
                r = ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            merged = parts[best_i] + parts[best_i + 1]
            # merge every non-overlapping occurrence of this pair
            out: List[str] = []
            i = 0
            while i < len(parts):
                if (
                    i < len(parts) - 1
                    and parts[i] + parts[i + 1] == merged
                    and ranks.get((parts[i], parts[i + 1])) == best_rank
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            parts = out
        self._word_cache[token] = parts
        return parts

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        enc = self.encoder
        for token in re.findall(self.pat, _clean(text, self.lowercase)):
            mapped = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(enc[p] for p in self._merge_word(mapped))
        return ids

    def decode(self, tokens) -> str:
        text = "".join(self.decoder[int(t)] for t in tokens)
        raw = bytearray(self.byte_decoder[c] for c in text)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")

    # ------------------------------------------------------------ batch

    def __call__(
        self,
        texts: Union[str, List[str]],
        context_length: Optional[int] = None,
    ) -> np.ndarray:
        """Tokenize to a zero-padded ``(B, context_length)`` int32 array;
        over-long sequences are truncated with EOT forced at the end
        (text_tokenizer.py:285-294)."""
        if isinstance(texts, str):
            texts = [texts]
        L = context_length or self.context_length
        assert L, "context length required"
        out = np.zeros((len(texts), L), dtype=np.int32)
        for i, text in enumerate(texts):
            toks = [self.sot_token_id] + self.encode(text) + [self.eot_token_id]
            if len(toks) > L:
                toks = toks[:L]
                toks[-1] = self.eot_token_id
            out[i, : len(toks)] = toks
        return out

    encode_batch = __call__


def get_tokenizer(
    model_name: str = "ViT-B-32",
    context_length: Optional[int] = None,
    cache_dir: Optional[str] = None,
    **kwargs,
):
    """API-compatible with the reference's get_tokenizer
    (text_tokenizer.py:297-325), including its preference for
    open_clip's tokenizer when that package is importable (it is not
    in this environment; token IDs are bit-identical either way —
    tests/test_tokenizer.py pins ours against the live reference)."""
    context_length = context_length or DEFAULT_CONTEXT_LENGTH
    try:  # pragma: no cover - open_clip absent here by design
        from open_clip import get_tokenizer as _get_tokenizer

        return _get_tokenizer(
            model_name, context_length=context_length,
            cache_dir=cache_dir, **kwargs,
        )
    except ImportError:
        pass
    return SimpleTokenizer(context_length=context_length, **kwargs)

"""TextAnalyzer chains + registry + vectorized Arrow batch path.

Mirrors tantivy's ``TextAnalyzer`` (tokenizer → filter chain,
/root/reference/src/tokenizer/tokenizer.rs:9-74) and ``TokenizerManager``
defaults (/root/reference/src/tokenizer/tokenizer_manager.rs:56-80):

- ``raw``        : RawTokenizer
- ``default``    : SimpleTokenizer → RemoveLong(40) → LowerCaser
- ``en_stem``    : default → Stemmer(English)
- ``whitespace`` : WhitespaceTokenizer

Two execution paths:
- :meth:`TextAnalyzer.analyze` — exact per-string reference path (tests, API).
- :func:`analyze_batch` — vectorized Arrow path used inside ``map_batches``:
  ``pyarrow.compute.split_pattern_regex`` + ``utf8_lower`` (utf8proc performs
  per-char lowercasing with no final-sigma context, same as the reference's
  LowerCaser) + numpy mask/offset arithmetic. Stemming is applied to the
  *unique* terms of the batch only (web text repeats terms heavily).

Index-time cap: tokens longer than ``MAX_TOKEN_LEN`` bytes are dropped by the
postings writer (reference src/tokenizer/mod.rs:168 — 2**16 - 6 bytes — and
src/postings/postings_writer.rs:132-150); the default chain's RemoveLong(40)
makes this unreachable, but standalone tokenizers honor it at build time.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .filters import (
    AlphaNumOnlyFilter,
    AsciiFoldingFilter,
    ENGLISH_STOP_WORDS,
    LowerCaser,
    RemoveLongFilter,
    Stemmer,
    StopWordFilter,
)
from .stemmer import snowball_english_stem
from .tokenizers import (
    NgramTokenizer,
    RawTokenizer,
    RegexTokenizer,
    SimpleTokenizer,
    Token,
    WhitespaceTokenizer,
)

MAX_TOKEN_LEN = (1 << 16) - 6  # reference src/tokenizer/mod.rs:168

#: RE2 class used by the Arrow fast path. \p{L}\p{N} ≈ Rust
#: char::is_alphanumeric (Alphabetic ∪ Nd/Nl/No); see module docstring.
SIMPLE_SPLIT_PATTERN = r"[^\p{L}\p{N}]+"
WHITESPACE_SPLIT_PATTERN = r"\s+"


class TextAnalyzer:
    """tokenizer → filters, applied in order (reference tokenizer.rs:9-74)."""

    def __init__(self, tokenizer, filters: Optional[Sequence] = None, name: str = ""):
        self.tokenizer = tokenizer
        self.filters = list(filters or [])
        self.name = name

    def analyze(self, text: str) -> List[Token]:
        tokens = self.tokenizer.tokenize(text)
        for f in self.filters:
            tokens = f.apply(tokens)
        return tokens

    def token_texts(self, text: str) -> List[str]:
        return [t.text for t in self.analyze(text)]


def _default_registry() -> Dict[str, TextAnalyzer]:
    return {
        "raw": TextAnalyzer(RawTokenizer(), [], "raw"),
        "default": TextAnalyzer(
            SimpleTokenizer(), [RemoveLongFilter(40), LowerCaser()], "default"
        ),
        "en_stem": TextAnalyzer(
            SimpleTokenizer(),
            [RemoveLongFilter(40), LowerCaser(), Stemmer("english")],
            "en_stem",
        ),
        # per-language stemming chains (reference registers <lang>_stem
        # names through rust-stemmers; german/french/spanish/russian are
        # the natively-implemented Snowball ports, snowball_langs.py)
        **{
            f"{code}_stem": TextAnalyzer(
                SimpleTokenizer(),
                [RemoveLongFilter(40), LowerCaser(), Stemmer(lang)],
                f"{code}_stem",
            )
            for code, lang in (("de", "german"), ("fr", "french"),
                               ("es", "spanish"), ("ru", "russian"),
                               ("sv", "swedish"), ("no", "norwegian"),
                               ("da", "danish"), ("it", "italian"),
                               ("pt", "portuguese"), ("nl", "dutch"),
                               ("ro", "romanian"), ("fi", "finnish"),
                               ("hu", "hungarian"), ("tr", "turkish"),
                               ("el", "greek"), ("ar", "arabic"),
                               ("ta", "tamil"))
        },
        "whitespace": TextAnalyzer(WhitespaceTokenizer(), [], "whitespace"),
    }


class TokenizerManager:
    """name → TextAnalyzer registry (reference tokenizer_manager.rs:56-80)."""

    def __init__(self) -> None:
        self._analyzers = _default_registry()

    def get(self, name: str) -> TextAnalyzer:
        try:
            return self._analyzers[name]
        except KeyError:
            raise KeyError(f"unknown analyzer {name!r}; registered: {sorted(self._analyzers)}")

    def register(self, name: str, analyzer: TextAnalyzer) -> None:
        self._analyzers[name] = analyzer

    def names(self) -> List[str]:
        return sorted(self._analyzers)


_MANAGER = TokenizerManager()


_LANG_ANALYZER = {"en": "en_stem", "de": "de_stem", "fr": "fr_stem",
                  "es": "es_stem", "ru": "ru_stem", "sv": "sv_stem",
                  "no": "no_stem", "da": "da_stem", "it": "it_stem",
                  "pt": "pt_stem", "nl": "nl_stem", "ro": "ro_stem",
                  "fi": "fi_stem", "hu": "hu_stem", "tr": "tr_stem",
                  "el": "el_stem", "ar": "ar_stem", "ta": "ta_stem"}


def analyzer_for_lang(lang: str) -> str:
    """Analyzer name for a document language code: the language's
    Snowball stemming chain when implemented, else `default` (the
    lang-routed build/analysis choice — multilingual corpora stem each
    document with its own language's algorithm)."""
    return _LANG_ANALYZER.get(lang, "default")


def get_analyzer(name: str) -> TextAnalyzer:
    return _MANAGER.get(name)


def register_analyzer(name: str, analyzer: TextAnalyzer) -> None:
    _MANAGER.register(name, analyzer)


# --------------------------------------------------------------------------
# Vectorized Arrow batch path
# --------------------------------------------------------------------------

def _stem_unique(values: pa.Array, stem_fn=None) -> pa.Array:
    """Stem a string array by stemming only its dictionary of unique values."""
    if len(values) == 0:
        return values
    fn = stem_fn or snowball_english_stem
    dict_arr = pc.dictionary_encode(values)
    uniq = dict_arr.dictionary.to_pylist()
    stemmed = pa.array([fn(u) for u in uniq], type=pa.string())
    return stemmed.take(dict_arr.indices)


class AnalyzedBatch:
    """Result of the Arrow analyzer path for one batch of documents."""

    __slots__ = ("tokens", "positions", "num_tokens")

    def __init__(self, tokens: pa.ListArray, positions: Optional[pa.ListArray],
                 num_tokens: np.ndarray):
        self.tokens = tokens          # list<string> per doc, post-filter
        self.positions = positions    # list<int32> pre-filter ordinals, or None
        self.num_tokens = num_tokens  # int64 per doc (fieldnorm input)


def analyze_batch(
    texts: Union[pa.Array, pa.ChunkedArray],
    analyzer: str = "default",
    with_positions: bool = False,
    stop_words: Optional[frozenset] = None,
) -> AnalyzedBatch:
    """Vectorized analyzer for a batch of document texts.

    Supported names: ``default``, ``en_stem``, ``whitespace``, ``raw``
    (other registered analyzers fall back to the per-string path).
    Position semantics match the reference: positions are assigned by the
    tokenizer (token ordinal), so tokens dropped by RemoveLong/stopwords
    leave gaps.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    if pa.types.is_large_string(texts.type):
        texts = texts.cast(pa.string())

    if analyzer == "raw":
        # whole text = one token; cap at MAX_TOKEN_LEN
        keep = pc.and_(
            pc.greater(pc.binary_length(texts), 0),
            pc.less(pc.binary_length(texts), MAX_TOKEN_LEN),
        ).to_numpy(zero_copy_only=False)
        n = len(texts)
        counts = keep.astype(np.int64)
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(counts, out=offsets[1:])
        vals = texts.filter(pa.array(keep))
        tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), vals)
        positions = None
        if with_positions:
            positions = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()),
                pa.array(np.zeros(int(counts.sum()), dtype=np.int32)),
            )
        return AnalyzedBatch(tokens, positions, counts)

    stem_fn = None
    if analyzer in ("default", "en_stem"):
        pattern, lower, long_limit, stem = SIMPLE_SPLIT_PATTERN, True, 40, (analyzer == "en_stem")
    elif analyzer.endswith("_stem") and analyzer[:-5] in _LANG_ANALYZER:
        # every per-language chain shares the default tokenizer shape
        # (Simple + RemoveLong(40) + Lower + Stemmer); the stemmer is the
        # only per-language part — vectorized via the unique dictionary
        from .snowball_langs import LANGUAGE_STEMMERS

        pattern, lower, long_limit, stem = SIMPLE_SPLIT_PATTERN, True, 40, True
        stem_fn = LANGUAGE_STEMMERS[analyzer[:-5]]
    elif analyzer == "whitespace":
        pattern, lower, long_limit, stem = WHITESPACE_SPLIT_PATTERN, False, MAX_TOKEN_LEN, False
    else:
        return _analyze_batch_fallback(texts, analyzer, with_positions)

    split = pc.split_pattern_regex(texts, pattern=pattern)
    offsets = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = split.values
    if lower:
        vals = pc.utf8_lower(vals)

    blen = pc.binary_length(vals).to_numpy(zero_copy_only=False)
    nonempty = blen > 0
    keep = nonempty & (blen < long_limit)

    row_counts_all = np.diff(offsets)

    if with_positions:
        # ordinal among nonempty values, per row, before drop-filters
        prefix = np.zeros(len(vals) + 1, dtype=np.int64)
        np.cumsum(nonempty.astype(np.int64), out=prefix[1:])
        row_base = np.repeat(prefix[offsets[:-1]], row_counts_all)
        pos_all = (prefix[1:] - 1 - row_base if len(vals) else np.empty(0, dtype=np.int64))
        # prefix[1:]-1 is (count of nonempty up to and including i) - 1 ==
        # ordinal of value i when value i itself is nonempty
        pos_all = pos_all.astype(np.int32)

    keep_pa = pa.array(keep)
    vals_kept = vals.filter(keep_pa)
    if stem:
        vals_kept = _stem_unique(vals_kept, stem_fn)
    if stop_words is not None and len(vals_kept):
        stop_mask = pc.is_in(vals_kept, value_set=pa.array(sorted(stop_words)))
        keep2 = pc.invert(stop_mask)
        vals_kept = vals_kept.filter(keep2)
        keep2_np = keep2.to_numpy(zero_copy_only=False)
    else:
        keep2_np = None

    # counts of kept values per row
    if len(keep):
        kept_prefix = np.zeros(len(keep) + 1, dtype=np.int64)
        np.cumsum(keep.astype(np.int64), out=kept_prefix[1:])
        counts = kept_prefix[offsets[1:]] - kept_prefix[offsets[:-1]]
    else:
        counts = np.zeros(len(texts), dtype=np.int64)

    if keep2_np is not None:
        # fold the stopword drop into per-row counts
        kp = np.zeros(len(keep2_np) + 1, dtype=np.int64)
        np.cumsum(keep2_np.astype(np.int64), out=kp[1:])
        cum_row_end = np.zeros(len(texts) + 1, dtype=np.int64)
        np.cumsum(counts, out=cum_row_end[1:])
        counts = kp[cum_row_end[1:]] - kp[cum_row_end[:-1]]

    new_offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(counts, out=new_offsets[1:])
    tokens = pa.ListArray.from_arrays(
        pa.array(new_offsets, type=pa.int32() if new_offsets[-1] < 2**31 else pa.int64()).cast(pa.int32()),
        vals_kept,
    )

    positions = None
    if with_positions:
        pos_kept = pos_all[keep]
        if keep2_np is not None:
            pos_kept = pos_kept[keep2_np]
        positions = pa.ListArray.from_arrays(
            tokens.offsets, pa.array(pos_kept, type=pa.int32())
        )
    # num_tokens (fieldnorm input) counts tokens actually indexed, i.e. the
    # post-filter count (reference src/indexer/segment_writer.rs:294-297)
    return AnalyzedBatch(tokens, positions, counts)


def _analyze_batch_fallback(texts: pa.Array, analyzer: str,
                            with_positions: bool) -> AnalyzedBatch:
    ana = get_analyzer(analyzer)
    toks_per_doc: List[List[Token]] = [ana.analyze(t.as_py() or "") for t in texts]
    counts = np.array([len(ts) for ts in toks_per_doc], dtype=np.int64)
    offsets = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    flat_text = pa.array(
        [t.text for ts in toks_per_doc for t in ts], type=pa.string()
    )
    tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), flat_text)
    positions = None
    if with_positions:
        flat_pos = pa.array(
            [t.position for ts in toks_per_doc for t in ts], type=pa.int32()
        )
        positions = pa.ListArray.from_arrays(tokens.offsets, flat_pos)
    return AnalyzedBatch(tokens, positions, counts)


__all__ = [
    "AnalyzedBatch",
    "AlphaNumOnlyFilter",
    "AsciiFoldingFilter",
    "ENGLISH_STOP_WORDS",
    "LowerCaser",
    "MAX_TOKEN_LEN",
    "NgramTokenizer",
    "RawTokenizer",
    "RegexTokenizer",
    "RemoveLongFilter",
    "SimpleTokenizer",
    "Stemmer",
    "StopWordFilter",
    "TextAnalyzer",
    "Token",
    "TokenizerManager",
    "WhitespaceTokenizer",
    "analyze_batch",
    "analyzer_for_lang",
    "get_analyzer",
    "register_analyzer",
]

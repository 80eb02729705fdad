"""Text-analysis batch functions for training-data pipelines.

All operate on Arrow batches (map_batches-ready):
- language-ID: stopword-profile + script heuristic (n-gram-free, fast);
- quality features: token counts, stopword ratio, mean token length,
  punctuation ratio, digit ratio;
- fingerprints: md5 of the normalized token stream + a 64-bit rolling
  (polynomial) hash — mergeable identity for shard-local dedup.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..analyzer import ENGLISH_STOP_WORDS, analyze_batch

LANG_STOPWORDS: Dict[str, frozenset] = {
    "en": frozenset(ENGLISH_STOP_WORDS),
    "de": frozenset("der die das und ist ich nicht mit ein eine von den dem "
                    "zu im für auf des sich auch".split()),
    "fr": frozenset("le la les de des du et un une est pas pour que qui dans "
                    "sur avec au aux ce cette".split()),
    "es": frozenset("el la los las de del y un una es no por que en con para "
                    "se su al lo como".split()),
    "ru": frozenset("и в не на я что он с как это по но они мы вы из у за "
                    "от то же бы".split()),
}


def detect_language_batch(texts: pa.Array) -> pa.Array:
    """→ string array of language codes ('und' when no signal)."""
    out_lang: List[str] = []
    analyzed = analyze_batch(texts, "default")
    for toks in analyzed.tokens.to_pylist():
        if not toks:
            out_lang.append("und")
            continue
        # script check first: cyrillic dominance → ru
        sample = "".join(toks[:20])
        n_cyr = sum(1 for c in sample if "Ѐ" <= c <= "ӿ")
        if n_cyr > len(sample) * 0.4:
            out_lang.append("ru")
            continue
        tokset = toks if len(toks) < 200 else toks[:200]
        best, best_hits = "und", 0
        for lang, stops in LANG_STOPWORDS.items():
            hits = sum(1 for t in tokset if t in stops)
            if hits > best_hits:
                best, best_hits = lang, hits
        out_lang.append(best if best_hits > 0 else "und")
    return pa.array(out_lang, type=pa.string())


def quality_features_batch(texts: pa.Array) -> pa.Table:
    """→ table of per-doc quality features (all float64/int64)."""
    analyzed = analyze_batch(texts, "default")
    n = analyzed.num_tokens
    flat = analyzed.tokens.values
    is_stop = pc.is_in(
        flat, value_set=pa.array(sorted(ENGLISH_STOP_WORDS))
    ).to_numpy(zero_copy_only=False)
    tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    offs = np.zeros(len(n) + 1, dtype=np.int64)
    np.cumsum(n, out=offs[1:])
    pre_stop = np.zeros(len(flat) + 1, dtype=np.int64)
    np.cumsum(is_stop.astype(np.int64), out=pre_stop[1:])
    pre_len = np.zeros(len(flat) + 1, dtype=np.int64)
    np.cumsum(tok_len.astype(np.int64), out=pre_len[1:])
    stops = pre_stop[offs[1:]] - pre_stop[offs[:-1]]
    lens = pre_len[offs[1:]] - pre_len[offs[:-1]]

    raw = pc.fill_null(texts, "")
    total_chars = pc.utf8_length(raw).to_numpy(zero_copy_only=False)
    alnum_chars = np.array([
        sum(ch.isalnum() or ch.isspace() for ch in (t or ""))
        for t in raw.to_pylist()
    ], dtype=np.int64)
    digits = np.array([
        sum(ch.isdigit() for ch in (t or "")) for t in raw.to_pylist()
    ], dtype=np.int64)

    safe_n = np.maximum(n, 1)
    safe_c = np.maximum(total_chars, 1)
    return pa.table({
        "num_tokens": pa.array(n, type=pa.int64()),
        "stop_ratio": pa.array(
            np.where(n > 0, stops / safe_n, 0.0), type=pa.float64()),
        "mean_token_len": pa.array(
            np.where(n > 0, lens / safe_n, 0.0), type=pa.float64()),
        "punct_ratio": pa.array(
            (total_chars - alnum_chars) / safe_c, type=pa.float64()),
        "digit_ratio": pa.array(digits / safe_c, type=pa.float64()),
    })


_FP_BASE = np.uint64(1099511628211)
def _make_powers(n: int) -> np.ndarray:
    """[B^0, B^1, ..., B^(n-1)] mod 2^64 (cumprod wraps correctly)."""
    return np.concatenate([
        np.ones(1, dtype=np.uint64),
        np.cumprod(np.full(n - 1, _FP_BASE, dtype=np.uint64)),
    ])


_FP_POWERS = _make_powers(1 << 16)


def _poly_hash64(data: bytes) -> int:
    """Polynomial rolling hash over bytes, mod 2^64 (uint64 wraparound):
    h = Σ b_i · B^(n-1-i).  A dot product against precomputed powers —
    fully vectorized, unlike byte-sequential FNV."""
    global _FP_POWERS
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = len(arr)
    if n == 0:
        return 0
    while n > len(_FP_POWERS):
        _FP_POWERS = _make_powers(len(_FP_POWERS) * 2)
    return int((arr * _FP_POWERS[:n][::-1]).sum())


def fingerprint_batch(texts: pa.Array) -> pa.Table:
    """→ (md5_fp: string, roll_fp: uint64) per doc over normalized tokens."""
    analyzed = analyze_batch(texts, "default")
    md5s: List[str] = []
    rolls: List[int] = []
    for toks in analyzed.tokens.to_pylist():
        joined = " ".join(toks).encode()
        md5s.append(hashlib.md5(joined).hexdigest())
        rolls.append(_poly_hash64(joined))
    return pa.table({
        "md5_fp": pa.array(md5s, type=pa.string()),
        "roll_fp": pa.array(rolls, type=pa.uint64()),
    })

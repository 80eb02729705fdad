"""HTML → text extraction stage (input_hint `html:binary` column).

Deterministic, dependency-free extraction (regex tag stripping):
script/style/head blocks dropped, tags removed, entities decoded,
whitespace collapsed. The per-row invariant the north star demands —
byte-identical extracted text per url — holds because the transform is a
pure function of the html bytes (same input ⇒ same output on every
worker/retry).

Usage: ``ds.map_batches(ExtractTextStage(), batch_format="pyarrow")``
before the index build when `text` is absent.
"""

from __future__ import annotations

import html as _html
import re

import pyarrow as pa

_SCRIPT_RE = re.compile(
    r"<(script|style|head|noscript)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_BLOCK_TAG_RE = re.compile(
    r"</?(p|div|br|li|ul|ol|tr|td|th|table|h[1-6]|section|article|header|"
    r"footer|blockquote)\b[^>]*>",
    re.IGNORECASE,
)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def extract_text(html_bytes: bytes) -> str:
    """Pure function: html bytes → extracted text (utf-8, lossy decode)."""
    s = (html_bytes or b"").decode("utf-8", errors="replace")
    s = _COMMENT_RE.sub(" ", s)
    s = _SCRIPT_RE.sub(" ", s)
    s = _BLOCK_TAG_RE.sub(" ", s)  # block boundaries become whitespace
    s = _TAG_RE.sub("", s)
    s = _html.unescape(s)
    return _WS_RE.sub(" ", s).strip()


class ExtractTextStage:
    """map_batches stage: html binary column → text string column."""

    def __init__(self, html_col: str = "html", text_col: str = "text"):
        self.html_col = html_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [extract_text(h) for h in batch.column(self.html_col).to_pylist()]
        arr = pa.array(texts, type=pa.string())
        if self.text_col in batch.column_names:
            return batch.set_column(
                batch.schema.get_field_index(self.text_col),
                self.text_col, arr)
        return batch.append_column(self.text_col, arr)

"""Fieldnorm codec — 1 byte per (doc, field), 256-entry decode table.

Re-derives the reference's codec rule (verified against the unit test in
/root/reference/src/fieldnorm/code.rs:277-328): values below 24 are stored
as themselves ("identity part"); above, a 3-bit-mantissa / 5-bit-shift
exponential code. Consequences (reference tests): ids 0..40 are exact,
fieldnorm 41 encodes to id 40, and encoding picks the largest table entry
<= fieldnorm (binary search, insertion-point - 1).
"""

from __future__ import annotations

import numpy as np

_IDENTITY_PART = 24


def _decode_exp_part(b: int) -> int:
    bits = b & 0b111
    shift = b >> 3
    if shift == 0:
        return bits
    return (bits | 8) << (shift - 1)


def _build_table() -> np.ndarray:
    out = np.empty(256, dtype=np.uint32)
    for i in range(256):
        if i < _IDENTITY_PART:
            out[i] = i
        else:
            out[i] = _IDENTITY_PART + _decode_exp_part(i - _IDENTITY_PART)
    return out


#: FIELD_NORMS_TABLE equivalent (reference src/fieldnorm/code.rs:13-270)
FIELD_NORMS_TABLE: np.ndarray = _build_table()
FIELD_NORMS_TABLE.setflags(write=False)


def id_to_fieldnorm(fieldnorm_id: int) -> int:
    return int(FIELD_NORMS_TABLE[fieldnorm_id])


def fieldnorm_to_id(fieldnorm: int) -> int:
    """Largest id whose table value <= fieldnorm."""
    idx = int(np.searchsorted(FIELD_NORMS_TABLE, fieldnorm, side="right")) - 1
    return idx


def fieldnorms_to_ids(fieldnorms: np.ndarray) -> np.ndarray:
    """Vectorized encode: uint32 token counts -> uint8 fieldnorm ids."""
    fn = np.asarray(fieldnorms, dtype=np.int64)
    ids = np.searchsorted(FIELD_NORMS_TABLE.astype(np.int64), fn, side="right") - 1
    return ids.astype(np.uint8)


def ids_to_fieldnorms(ids: np.ndarray) -> np.ndarray:
    return FIELD_NORMS_TABLE[np.asarray(ids, dtype=np.uint8)]

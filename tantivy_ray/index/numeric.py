"""Order-preserving numeric/date term encodings.

The reference indexes numbers/dates as terms whose byte encoding preserves
order (value↔u64 monotone maps, /root/reference/src/termdict/mod.rs:10-18,
columnar/src/column_values/monotonic_mapping.rs; dates truncated to seconds,
src/schema/date_time_options.rs:9).  Here the encoded form is a fixed-width
lowercase-hex string, so LEXICOGRAPHIC order == numeric order and the plain
sorted-term-table RangeQuery machinery works unchanged:

- i64  → (v + 2^63) as 16 hex digits
- f64  → IEEE-754 bits with the standard monotone flip (sign bit set →
         invert all bits; else set sign bit) as 16 hex digits
- date → epoch SECONDS via the i64 encoding (tantivy's seconds truncation)
"""

from __future__ import annotations

import struct
from datetime import datetime, timezone
from typing import Union

_OFFSET = 1 << 63
_MASK = (1 << 64) - 1


def encode_i64(v: int) -> str:
    return format((int(v) + _OFFSET) & _MASK, "016x")


def decode_i64(s: str) -> int:
    return (int(s, 16) - _OFFSET)


def encode_f64(v: float) -> str:
    bits = struct.unpack("<Q", struct.pack("<d", float(v)))[0]
    if bits & _OFFSET:
        bits = (~bits) & _MASK
    else:
        bits |= _OFFSET
    return format(bits, "016x")


def decode_f64(s: str) -> float:
    bits = int(s, 16)
    if bits & _OFFSET:
        bits &= ~_OFFSET & _MASK
    else:
        bits = (~bits) & _MASK
    return struct.unpack("<d", struct.pack("<Q", bits))[0]


def encode_datetime_s(v: Union[datetime, int, float]) -> str:
    """Datetime → epoch-seconds i64 encoding (seconds truncation)."""
    if isinstance(v, datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=timezone.utc)
        secs = int(v.timestamp())
    else:
        secs = int(v)
    return encode_i64(secs)


def encode_bool(v: bool) -> str:
    """Bool field (reference field_type.rs Bool): false < true."""
    return "1" if v else "0"


def decode_bool(s: str) -> bool:
    return s == "1"


def encode_bytes(v: bytes) -> str:
    """Bytes field (reference field_type.rs:170-192 Bytes): raw bytes as
    lowercase hex — fixed 2-chars-per-byte, so lexicographic order of
    the encoding == bytewise order of the value."""
    return bytes(v).hex()


def decode_bytes(s: str) -> bytes:
    return bytes.fromhex(s)


def encode_ip(v) -> str:
    """IpAddr field (reference stores every address as a u128 — IPv4
    mapped into IPv6, field_type.rs IpAddr): 32 hex digits of the
    big-endian u128, so lexicographic order == numeric address order."""
    import ipaddress

    a = ipaddress.ip_address(v)
    if a.version == 4:
        a = ipaddress.IPv6Address(bytes(12 * b"\x00")[:10]
                                  + b"\xff\xff" + a.packed)
    return format(int(a), "032x")


def decode_ip(s: str):
    import ipaddress

    a = ipaddress.IPv6Address(int(s, 16))
    v4 = a.ipv4_mapped
    return v4 if v4 is not None else a


class EncodeNumericStage:
    """map_batches stage: numeric column → encoded-term string column
    (index the output as an extra 'raw' field)."""

    def __init__(self, col: str, out_col: str = None, kind: str = "i64"):
        self.col = col
        self.out_col = out_col or f"{col}_enc"
        self.kind = kind

    def __call__(self, batch):
        import pyarrow as pa

        enc = {"i64": encode_i64, "f64": encode_f64,
               "date": encode_datetime_s, "bool": encode_bool,
               "bytes": encode_bytes, "ip": encode_ip}[self.kind]
        vals = [enc(v) if v is not None else ""
                for v in batch.column(self.col).to_pylist()]
        arr = pa.array(vals, type=pa.string())
        if self.out_col in batch.column_names:
            return batch.set_column(
                batch.schema.get_field_index(self.out_col), self.out_col, arr)
        return batch.append_column(self.out_col, arr)

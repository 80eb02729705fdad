"""Pure-python/numpy image codecs: PPM/PGM (netpbm) and uncompressed BMP.

These are REAL decoders/encoders (not stubs): the formats are simple
enough to implement with numpy alone, so the multimodal pipeline has a
genuine end-to-end codec path in this container.  Compressed formats
(JPEG/PNG) still require external codecs and stay behind the strict
NotImplementedError seam in stages.py.
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedImage(Exception):
    pass


# ---------------------------------------------------------------------------
# netpbm (P5 = grayscale binary, P6 = RGB binary)
# ---------------------------------------------------------------------------

def _pnm_header(data: bytes):
    # header tokens separated by whitespace/comments
    pos = 0
    tokens = []
    while len(tokens) < 4 and pos < len(data):
        # skip whitespace
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":            # comment to end of line
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        tokens.append(data[start:pos])
    pos += 1  # single whitespace after maxval
    return tokens, pos


def decode_ppm(data: bytes) -> np.ndarray:
    """P6 → (H, W, 3) uint8; P5 → (H, W) uint8."""
    if data[:2] not in (b"P5", b"P6"):
        raise UnsupportedImage("not a binary PGM/PPM")
    tokens, pos = _pnm_header(data)
    magic, w, h, maxval = tokens[0], int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval > 255:
        raise UnsupportedImage("16-bit netpbm not supported")
    ch = 3 if magic == b"P6" else 1
    n = w * h * ch
    px = np.frombuffer(data, dtype=np.uint8, count=n, offset=pos)
    return px.reshape(h, w, 3) if ch == 3 else px.reshape(h, w)


def encode_ppm(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 3 and img.shape[2] == 3:
        head = b"P6"
    elif img.ndim == 2:
        head = b"P5"
    else:
        raise UnsupportedImage(f"bad shape {img.shape}")
    h, w = img.shape[:2]
    return head + f"\n{w} {h}\n255\n".encode() + img.tobytes()


# ---------------------------------------------------------------------------
# BMP (uncompressed 24-bit BI_RGB)
# ---------------------------------------------------------------------------

def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (H, W, 3) uint8 RGB."""
    if data[:2] != b"BM":
        raise UnsupportedImage("not a BMP")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise UnsupportedImage("pre-BITMAPINFOHEADER BMP")
    w = struct.unpack_from("<i", data, 18)[0]
    h = struct.unpack_from("<i", data, 22)[0]
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or comp != 0:
        raise UnsupportedImage(f"only 24-bit BI_RGB (got bpp={bpp}, comp={comp})")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h,
                         offset=pixel_off).reshape(h, stride)
    bgr = rows[:, :w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return rgb[::-1].copy() if flip else rgb.copy()


def encode_bmp(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise UnsupportedImage(f"bad shape {img.shape}")
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    px = rows.tobytes()
    header = (b"BM" + struct.pack("<IHHI", 54 + len(px), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(px), 2835, 2835, 0, 0))
    return header + px


def decode_image(data: bytes) -> np.ndarray:
    """Sniff + decode any supported format → (H, W, 3) uint8 RGB
    (grayscale is broadcast to 3 channels)."""
    if data[:2] in (b"P5", b"P6"):
        img = decode_ppm(data)
    elif data[:2] == b"BM":
        img = decode_bmp(data)
    else:
        raise UnsupportedImage(
            f"unknown/compressed format (magic {data[:2]!r}); JPEG/PNG "
            "need an external codec")
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    return img

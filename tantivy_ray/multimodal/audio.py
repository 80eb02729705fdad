"""Pure-numpy audio codec + features: PCM WAV decode/encode and real
DSP feature extraction (frame energy, zero-crossing rate, spectral
centroid/rolloff via FFT).

Like the image codecs (codecs.py), these are REAL implementations —
RIFF/WAVE PCM parsing needs only struct+numpy — so the audio half of
the multimodal pipeline has a genuine end-to-end path in this
container.  Compressed audio (MP3/AAC/Opus) still needs external codecs
and stays behind the strict NotImplementedError seam.
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np
import pyarrow as pa


class UnsupportedAudio(Exception):
    pass


def decode_wav(data: bytes) -> Tuple[np.ndarray, int]:
    """PCM WAV → (float64 mono samples in [-1, 1], sample_rate).

    Supports 8/16/32-bit integer PCM and 32-bit float, any channel
    count (channels are averaged to mono)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise UnsupportedAudio("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, n_ch, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0)
            fmt = (audio_fmt, n_ch, rate, bits)
        elif cid == b"data":
            samples = body
        pos += 8 + size + (size & 1)
    if fmt is None or samples is None:
        raise UnsupportedAudio("missing fmt/data chunk")
    audio_fmt, n_ch, rate, bits = fmt
    if audio_fmt == 1:          # integer PCM
        if bits == 8:
            x = (np.frombuffer(samples, dtype=np.uint8)
                 .astype(np.float64) - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(samples, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 32:
            x = np.frombuffer(samples, dtype="<i4").astype(np.float64) / 2147483648.0
        else:
            raise UnsupportedAudio(f"{bits}-bit integer PCM")
    elif audio_fmt == 3 and bits == 32:   # IEEE float
        x = np.frombuffer(samples, dtype="<f4").astype(np.float64)
    else:
        raise UnsupportedAudio(f"format {audio_fmt} ({bits}-bit) — "
                               "compressed audio needs an external codec")
    if n_ch > 1:
        x = x[: (len(x) // n_ch) * n_ch].reshape(-1, n_ch).mean(axis=1)
    return x, rate


def encode_wav(x: np.ndarray, rate: int) -> bytes:
    """float mono samples in [-1, 1] → 16-bit PCM WAV."""
    pcm = (np.clip(np.asarray(x, dtype=np.float64), -1, 1)
           * 32767.0).astype("<i2").tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate,
                                   rate * 2, 2, 16)
           + b"data" + struct.pack("<I", len(pcm)))
    return hdr + pcm


def audio_features(x: np.ndarray, rate: int, frame: int = 1024) -> np.ndarray:
    """8-dim descriptor: [duration_s, rms, peak, zero_crossing_rate,
    spectral_centroid_hz, spectral_rolloff85_hz, frame_rms_mean,
    frame_rms_std] — real DSP over the decoded signal."""
    n = len(x)
    if n == 0:
        return np.zeros(8)
    rms = float(np.sqrt(np.mean(x * x)))
    peak = float(np.abs(x).max())
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
    spec = np.abs(np.fft.rfft(x * np.hanning(n)))
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    power = spec * spec
    total = power.sum()
    if total > 0:
        centroid = float((freqs * power).sum() / total)
        cum = np.cumsum(power)
        rolloff = float(freqs[np.searchsorted(cum, 0.85 * total)])
    else:
        centroid = rolloff = 0.0
    n_frames = max(1, n // frame)
    framed = x[: n_frames * frame].reshape(n_frames, frame)
    frms = np.sqrt((framed * framed).mean(axis=1))
    return np.array([n / rate, rms, peak, zcr, centroid, rolloff,
                     float(frms.mean()), float(frms.std())])


class DecodeAudioStage:
    """binary WAV column → fixed-rate mono sample column (list<float>)
    + sample_rate.  Actor-pool stage: map_batches(DecodeAudioStage,
    batch_size=B, concurrency=N) with SMALL B — audio payloads are
    large.  strict=True raises only for compressed formats."""

    def __init__(self, payload_col: str = "audio", max_samples: int = 1 << 18,
                 strict: bool = False):
        self.payload_col = payload_col
        self.max_samples = max_samples
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        waves, rates = [], []
        for payload in batch.column(self.payload_col).to_pylist():
            try:
                x, rate = decode_wav(payload or b"")
            except UnsupportedAudio:
                if self.strict:
                    raise NotImplementedError(
                        "compressed audio codec not available; wire "
                        "ffmpeg here or run with strict=False")
                x, rate = np.zeros(0), 16000
            waves.append(x[: self.max_samples])
            rates.append(rate)
        return batch.append_column(
            "samples", pa.array([w.tolist() for w in waves],
                                type=pa.list_(pa.float64()))
        ).append_column("sample_rate", pa.array(rates, type=pa.int32()))


class ExtractAudioFeaturesStage:
    """samples + sample_rate → 8-dim audio_features column."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        rates = batch.column("sample_rate").to_pylist()
        for samples, rate in zip(batch.column("samples").to_pylist(), rates):
            feats.append(audio_features(
                np.asarray(samples, dtype=np.float64), int(rate)))
        flat = np.stack(feats) if feats else np.zeros((0, 8))
        return batch.append_column(
            "audio_features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(flat.ravel(), type=pa.float64()), 8),
        )

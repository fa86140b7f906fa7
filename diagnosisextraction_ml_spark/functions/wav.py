"""Minimal from-spec WAV/PCM codec (stdlib only) for the multimodal path.

Companion to :mod:`.png`: the container has no audio libraries, but
RIFF/WAVE is a public spec (Microsoft/IBM RIFF, used unchanged since
1991) parseable with nothing beyond ``struct`` — a RIFF header, a
``fmt `` chunk describing the sample format, and a ``data`` chunk of
raw frames. Supporting PCM 8/16/32-bit and IEEE float32, mono or
multi-channel, covers what a training-data pipeline's audio
fixtures/probes need and makes ``multimodal.extract_features`` a REAL
audio decode path end-to-end — deterministic, no external codecs.

The encoder exists for fixtures/round-trip tests; production writers
would use a real audio library.
"""

from __future__ import annotations

import struct

import numpy as np

# fmt-chunk audio format tags (public spec values)
_FMT_PCM = 1
_FMT_IEEE_FLOAT = 3

_PCM_DTYPES = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE payload → (samples, sample_rate).

    ``samples`` is float64 of shape (n_frames, n_channels) scaled to
    [-1, 1] (PCM 8-bit is unsigned per spec — recentered; 16/32-bit are
    signed little-endian; format 3 is IEEE float32 passed through).
    Raises ``ValueError`` on anything that is not a supported WAV.
    """
    b = bytes(payload or b"")
    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE signature)")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(b):
        ctype = b[pos : pos + 4]
        (length,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = b[pos + 8 : pos + 8 + length]
        if ctype == b"fmt ":
            fmt = body
        elif ctype == b"data":
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, n_channels, sample_rate, _byte_rate, _block_align, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if n_channels < 1:
        raise ValueError("zero channels")
    if audio_format == _FMT_IEEE_FLOAT:
        if bits != 32:
            raise ValueError(f"unsupported float bit depth {bits}")
        flat = np.frombuffer(data, dtype="<f4").astype(np.float64)
    elif audio_format == _FMT_PCM:
        dtype = _PCM_DTYPES.get(bits)
        if dtype is None:
            raise ValueError(f"unsupported PCM bit depth {bits}")
        raw = np.frombuffer(data, dtype=dtype).astype(np.float64)
        if bits == 8:
            flat = (raw - 128.0) / 128.0
        else:
            flat = raw / float(2 ** (bits - 1))
    else:
        raise ValueError(f"unsupported audio format tag {audio_format}")
    n_frames = len(flat) // n_channels
    return flat[: n_frames * n_channels].reshape(n_frames, n_channels), sample_rate


def encode_wav(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """Encode float samples in [-1, 1] (frames × channels or 1-D mono)
    as PCM WAV — fixture/round-trip helper."""
    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 1:
        a = a[:, None]
    n_frames, n_channels = a.shape
    clipped = np.clip(a, -1.0, 1.0)
    if bits == 8:
        raw = (np.round(clipped * 127.0) + 128.0).astype(np.uint8).tobytes()
    elif bits in (16, 32):
        scale = float(2 ** (bits - 1) - 1)
        raw = np.round(clipped * scale).astype(_PCM_DTYPES[bits]).tobytes()
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    block_align = n_channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", _FMT_PCM, n_channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    chunks = b"".join(
        [
            b"fmt ", struct.pack("<I", len(fmt)), fmt,
            b"data", struct.pack("<I", len(raw)), raw,
        ]
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def wav_feature_decoder(payload: bytes, dim: int = 8) -> np.ndarray:
    """Real-decode feature hook for ``multimodal.extract_features``:
    decode the WAV and emit a fixed-width deterministic feature vector
    [sample_rate, n_channels, n_frames, duration_s, rms, peak,
    zero_crossing_rate, dc_mean] over the channel-mixed signal."""
    samples, sr = decode_wav(payload)
    mono = samples.mean(axis=1)
    n = len(mono)
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    feats = np.array(
        [
            float(sr),
            float(samples.shape[1]),
            float(n),
            float(n / sr) if sr else 0.0,
            float(np.sqrt(np.mean(mono**2))) if n else 0.0,
            float(np.abs(mono).max()) if n else 0.0,
            zcr,
            float(mono.mean()) if n else 0.0,
        ]
    )
    return feats[:dim]

"""Audio/video payload codecs — multimodal columns beyond images.

Design: every modality is an opaque `binary` column plus typed metadata
columns; decode/feature-extraction runs in Arrow-batched UDFs only.
This container ships no audio/video libraries, so:

- **audio**: a REAL minimal WAV codec (PCM16 mono, stdlib struct) —
  readable by any standard tool — plus deterministic synthesis of tone
  mixtures; feature extraction (RMS, zero-crossing rate, spectral
  centroid via numpy rFFT) is real DSP on the decoded samples.
- **video**: a clearly-marked DETERMINISTIC FAKE container ("FVID"):
  a header + N independently zlib-compressed RGB frames. It is NOT a
  real video codec — swap `encode_fvid/decode_fvid_frame` for PyAV/
  ffmpeg bindings in production. Frame-sampling semantics (decode only
  the k requested frames, never the whole stream) are the part that
  matters at 100TB and they are real here: `decode_fvid_frame` seeks
  the frame index table and inflates ONE frame.

Everything is deterministic (seeded per id) and pure numpy/stdlib.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

WAV_RATE = 8000
FVID_MAGIC = b"FVID"


# --- audio: real minimal WAV (PCM16 mono) ----------------------------------


def encode_wav(samples: np.ndarray, rate: int = WAV_RATE) -> bytes:
    """int16 samples -> RIFF/WAVE PCM16 mono bytes."""
    assert samples.dtype == np.int16
    data = samples.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (int16 samples, rate). Minimal reader (PCM16 mono)."""
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE", "not a WAV"
    pos = 12
    rate, samples = WAV_RATE, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            fmt, channels, rate = struct.unpack("<HHI", body[:8])
            assert fmt == 1 and channels == 1, "PCM16 mono only"
        elif tag == b"data":
            samples = np.frombuffer(body, np.int16)
        pos += 8 + size
    assert samples is not None
    return samples, rate


def synth_audio(i: int, n_samples: int = 4000, rate: int = WAV_RATE) -> np.ndarray:
    """Deterministic tone mixture + noise for row i (int16)."""
    rng = np.random.default_rng(0xA0D10 + i)
    t = np.arange(n_samples) / rate
    f1, f2 = rng.integers(100, 1500), rng.integers(100, 3000)
    sig = 0.5 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t)
    sig = sig + 0.05 * rng.standard_normal(n_samples)
    return np.clip(sig * 20000, -32768, 32767).astype(np.int16)


def audio_features(samples: np.ndarray, rate: int) -> dict:
    """RMS, zero-crossing rate, spectral centroid — real DSP."""
    x = samples.astype(np.float64)
    rms = float(np.sqrt(np.mean(x**2)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x)))))
    mag = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(len(x), 1.0 / rate)
    centroid = float((freqs * mag).sum() / mag.sum()) if mag.sum() > 0 else 0.0
    return {"rms": rms, "zcr": zcr, "spectral_centroid": centroid}


# --- video: deterministic fake container with real frame-seek --------------


def encode_fvid(frames: list[np.ndarray]) -> bytes:
    """list of HxWx3 uint8 -> FVID bytes (per-frame zlib, index table).

    DETERMINISTIC FAKE (see module docstring). NOT a real video codec.
    """
    h, w, _ = frames[0].shape
    blobs = [zlib.compress(f.tobytes(), 6) for f in frames]
    index = []
    off = 0
    for b in blobs:
        index.append(off)
        off += len(b)
    head = struct.pack("<4sHHH", FVID_MAGIC, w, h, len(frames))
    head += b"".join(struct.pack("<I", o) for o in index) + struct.pack("<I", off)
    return head + b"".join(blobs)


def fvid_meta(data: bytes) -> tuple[int, int, int]:
    """(w, h, n_frames) from the header — no frame decode."""
    magic, w, h, n = struct.unpack("<4sHHH", data[:10])
    assert magic == FVID_MAGIC, "not an FVID payload"
    return w, h, n


def decode_fvid_frame(data: bytes, frame_idx: int) -> np.ndarray:
    """Decode ONE frame by seeking the index table (the frame-sampling
    contract: cost is O(frame), not O(stream))."""
    w, h, n = fvid_meta(data)
    assert 0 <= frame_idx < n, f"frame {frame_idx} out of range {n}"
    table = data[10 : 10 + 4 * (n + 1)]
    offs = struct.unpack(f"<{n + 1}I", table)
    body = data[10 + 4 * (n + 1) :]
    blob = body[offs[frame_idx] : offs[frame_idx + 1]]
    return np.frombuffer(zlib.decompress(blob), np.uint8).reshape(h, w, 3).copy()


def synth_video(i: int, w: int = 32, h: int = 24, n_frames: int = 8) -> list[np.ndarray]:
    """Deterministic moving-block frames for row i."""
    rng = np.random.default_rng(0xF1D + i)
    base = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    frames = []
    for f in range(n_frames):
        fr = base.copy()
        x = (f * 3 + int(rng.integers(0, w))) % max(w - 4, 1)
        y = (f * 2) % max(h - 4, 1)
        fr[y : y + 4, x : x + 4] = [255, f * 30 % 256, 0]
        frames.append(fr)
    return frames

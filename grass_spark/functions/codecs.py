"""Pure-python media codecs (numpy only) for the multimodal kernels.

Two deliberately simple, fully-public formats make the decode path real
end-to-end in this dependency-free container:

* **BMP** (Windows bitmap, BITMAPINFOHEADER, uncompressed BI_RGB,
  24/32-bit) — decode to an (H, W, 3) uint8 array and encode back.
  Bottom-up and top-down row orders both handled; rows are 4-byte
  padded per the spec.
* **WAV** (RIFF PCM, 8/16-bit, any channel count) — decode to mono
  float32 in [-1, 1] plus the sample rate, and encode back (16-bit).

Anything that needs an external codec (JPEG/PNG/Opus/H.264…) is out of
contract here: the kernels raise ``ValueError`` naming the unsupported
payload — an input-domain error, not a stub.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> 24-bit bottom-up BI_RGB BMP bytes."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_bmp expects (H, W, 3)")
    h, w, _ = img.shape
    row_size = (w * 3 + 3) & ~3
    data_size = row_size * h
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + data_size, 0, 0, offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size,
                       2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    # BMP stores BGR, bottom-up
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP bytes -> (H, W, 3) uint8 (RGB).  Supports uncompressed
    BI_RGB 24/32-bit with BITMAPINFOHEADER, bottom-up or top-down."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    top_down = h_raw < 0
    h = abs(h_raw)
    nbytes = bpp // 8
    row_size = (w * nbytes + 3) & ~3
    body = np.frombuffer(payload, dtype=np.uint8,
                         count=row_size * h, offset=offset)
    rows = body.reshape(h, row_size)[:, : w * nbytes].reshape(h, w, nbytes)
    rgb = rows[:, :, 2::-1]  # BGR(A) -> RGB
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def bmp_size(payload: bytes, pos: int = 0) -> int:
    """Declared byte length of the BMP starting at ``pos`` (the file
    header stores the total size at bytes 2-6) — lets a concatenated
    BMP stream be split without decoding."""
    if payload[pos : pos + 2] != b"BM":
        raise ValueError("not a BMP at offset")
    return struct.unpack_from("<I", payload, pos + 2)[0]


def split_bmp_stream(payload: bytes) -> list[bytes]:
    """Split a concatenation of BMP files into the individual frames."""
    out, pos = [], 0
    while pos < len(payload):
        size = bmp_size(payload, pos)
        if size <= 0 or pos + size > len(payload):
            raise ValueError("truncated BMP stream")
        out.append(payload[pos : pos + size])
        pos += size
    return out


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """mono float array in [-1, 1] -> 16-bit PCM RIFF/WAVE bytes."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm16 = (pcm * 32767.0).astype("<i2")
    data = pcm16.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF PCM bytes -> (mono float32 in [-1, 1], sample_rate)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1:
                raise ValueError(f"unsupported WAV format code {audio_fmt}")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    if channels and channels > 1:
        x = x[: len(x) // channels * channels].reshape(-1, channels).mean(axis=1)
    return x, int(rate)


# ---------------------------------------------------------------------------
# deterministic featurizers over decoded media
# ---------------------------------------------------------------------------


def image_features(img: np.ndarray, dim: int = 16) -> np.ndarray:
    """(H, W, 3) -> dim floats: per-channel mean/std (6), 3x3 grid of
    grayscale means (9), aspect ratio (1); zero-padded/truncated."""
    f = np.asarray(img, dtype=np.float64) / 255.0
    h, w, _ = f.shape
    gray = f.mean(axis=2)
    hs = np.array_split(np.arange(h), 3)
    ws = np.array_split(np.arange(w), 3)
    grid = [gray[np.ix_(r, c)].mean() if r.size and c.size else 0.0
            for r in hs for c in ws]
    feats = np.concatenate([
        f.reshape(-1, 3).mean(axis=0), f.reshape(-1, 3).std(axis=0),
        np.asarray(grid), [w / max(h, 1)],
    ])
    out = np.zeros(dim, dtype=np.float32)
    out[: min(dim, feats.size)] = feats[:dim]
    return out


def audio_features(x: np.ndarray, rate: int, dim: int = 16) -> np.ndarray:
    """mono float samples -> dim floats: rms, zero-crossing rate, mean,
    std + 12 equal-window energy bins."""
    x = np.asarray(x, dtype=np.float64)
    if x.size == 0:
        return np.zeros(dim, dtype=np.float32)
    rms = float(np.sqrt((x * x).mean()))
    zcr = float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean()) if x.size > 1 else 0.0
    bins = [float(np.sqrt((seg * seg).mean())) if seg.size else 0.0
            for seg in np.array_split(x, 12)]
    feats = np.concatenate([[rms, zcr, x.mean(), x.std()], bins])
    out = np.zeros(dim, dtype=np.float32)
    out[: min(dim, feats.size)] = feats[:dim]
    return out

"""Pure-stdlib media codecs (uncompressed BMP, binary PPM, PCM-16 WAV).

The sandbox ships no imaging/audio libraries, but these three formats
are simple enough to encode/decode with struct + numpy alone — which
lets ONE real decode path run end-to-end through the multimodal
actor-pool pipeline (VERDICT r03 next #7) instead of the hash-based
fake decoder.  Real deployments swap in Pillow/torchaudio for the
compressed formats; the pipeline plumbing is identical.

All functions are deterministic and byte-exact round-trips:
decode(encode(x)) == x for valid inputs; malformed payloads raise
ValueError (never return garbage).
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# BMP — uncompressed 24-bit BGR, BITMAPINFOHEADER, bottom-up rows padded
# to 4 bytes (the original Windows DIB layout; public spec)
# --------------------------------------------------------------------------


def encode_bmp(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit uncompressed BMP bytes."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"encode_bmp expects (H, W, 3) uint8, got {a.shape}")
    h, w, _ = a.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    img_size = stride * h
    # rows bottom-up, channels BGR
    bgr = a[::-1, :, ::-1]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    return header + info + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> (H, W, 3) uint8 RGB."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("decode_bmp: not a BMP payload")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(
            f"decode_bmp: only 24-bit uncompressed supported (bpp={bpp}, "
            f"compression={compression})")
    if w <= 0 or h == 0:
        raise ValueError(f"decode_bmp: bad dimensions {w}x{h}")
    flip = h > 0  # positive height = bottom-up rows
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    if len(data) < offset + stride * h:
        raise ValueError("decode_bmp: truncated pixel data")
    rows = np.frombuffer(data, dtype=np.uint8,
                         count=stride * h, offset=offset).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return (rgb[::-1] if flip else rgb).copy()


# --------------------------------------------------------------------------
# PPM (P6) — "P6\n<w> <h>\n255\n" + raw RGB bytes
# --------------------------------------------------------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"encode_ppm expects (H, W, 3) uint8, got {a.shape}")
    h, w, _ = a.shape
    return f"P6\n{w} {h}\n255\n".encode() + a.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise ValueError("decode_ppm: not a binary PPM payload")
    # header = three whitespace-separated tokens after the magic
    # (comments are legal in PPM but never produced by encode_ppm)
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("decode_ppm: truncated header")
        tokens.append(data[start:pos])
    pos += 1  # single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255 or w <= 0 or h <= 0:
        raise ValueError(f"decode_ppm: unsupported header {w}x{h} max {maxval}")
    need = w * h * 3
    if len(data) < pos + need:
        raise ValueError("decode_ppm: truncated pixel data")
    return np.frombuffer(data, dtype=np.uint8, count=need, offset=pos) \
        .reshape(h, w, 3).copy()


# --------------------------------------------------------------------------
# WAV — RIFF/WAVE, PCM 16-bit (mono or interleaved multichannel)
# --------------------------------------------------------------------------


def encode_wav_pcm16(samples: np.ndarray, rate: int) -> bytes:
    """int16 samples (n,) mono or (n, C) interleaved -> WAV bytes."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    payload = s.reshape(-1).tobytes()
    block = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, 16)
    out = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload))
           + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(payload)) + payload)
    return out


def decode_wav_pcm16(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n, C) int16 samples, sample_rate).  PCM-16 only."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("decode_wav_pcm16: not a RIFF/WAVE payload")
    pos, fmt, payload = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("decode_wav_pcm16: missing fmt/data chunk")
    audio_fmt, ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if audio_fmt != 1 or bits != 16 or ch < 1:
        raise ValueError(
            f"decode_wav_pcm16: only PCM-16 supported (fmt={audio_fmt}, bits={bits})")
    n = len(payload) // (2 * ch)
    s = np.frombuffer(payload, dtype="<i2", count=n * ch).reshape(n, ch)
    return s.copy(), int(rate)

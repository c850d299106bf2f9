"""Multimodal column plumbing — image/audio/video as opaque binary
columns with typed metadata (task brief).

Decode tiers:
- fake=True: deterministic hash-of-bytes feature vector — exercises the
  Ray-side plumbing (schema, actor-pool signature, batch size, output
  layout) for payloads in formats this sandbox cannot decode.
- fake=False: REAL decode for the stdlib-decodable formats
  (functions/codecs.py: PNG incl. zlib DEFLATE + all five scanline
  filters, uncompressed BMP, binary PPM, PCM-16 WAV) —
  pixels/samples -> feature vectors end-to-end (VERDICT r03 next #7,
  r04 next #5).  The remaining compressed formats (JPEG/MP3/MP4)
  raise ValueError per row-batch: real deployments drop
  Pillow/torchaudio into Decoder.__init__ and keep everything else
  unchanged.  Video container parsing stays a declared stub
  (FrameSampler indexes frames without decoding).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions.codecs import (decode_bmp, decode_png, decode_ppm,
                                decode_wav_pcm16)

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synthesize_media_table(n: int, seed: int = 42, real: bool = False) -> pa.Table:
    """Deterministic media corpus matching MEDIA_SCHEMA.

    real=False: opaque random bytes (the fake-decode plumbing corpus).
    real=True: image rows are valid 16x16 images (seeded pixel
    patterns, cycling BMP / PPM / Paeth-filtered PNG / GIF — the GIF
    palette is exact: a 16x16 frame has <=256 pixels, so np.unique
    yields a lossless color table), audio rows are valid PCM-16 WAV
    sine clips, and video rows are 4-frame uncompressed RIFF/AVI clips
    — all decodable by the stdlib codecs, so every fake=False pipeline
    (decode_images, decode_audio, sample_frames) runs end-to-end on
    real bytes."""
    from ..functions.codecs import (encode_avi_raw, encode_bmp, encode_gif,
                                    encode_png, encode_ppm, encode_wav_pcm16)

    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        kind = kinds[i % 3]
        if not real:
            payload = rng.integers(0, 256, size=64 + (i % 5) * 32, dtype=np.uint8).tobytes()
            mime = {"image": "image/png", "audio": "audio/wav",
                    "video": "video/mp4"}[kind]
            w = h = 64 if kind != "audio" else 0
        elif kind == "video":  # real video: 4-frame 8x8 uncompressed AVI
            frames = rng.integers(0, 256, size=(4, 8, 8, 3), dtype=np.uint8)
            payload, mime = encode_avi_raw(frames, fps=8), "video/x-msvideo"
            w = h = 8
        elif kind == "image":
            img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
            img[:, :, 0] = np.linspace(0, 255, 16, dtype=np.uint8)[None, :]
            variant = (i // 3) % 4
            if variant == 0:
                payload, mime = encode_bmp(img), "image/bmp"
            elif variant == 1:
                payload, mime = encode_ppm(img), "image/x-portable-pixmap"
            elif variant == 2:
                payload, mime = encode_png(img), "image/png"
            else:
                pal, inv = np.unique(img.reshape(-1, 3), axis=0,
                                     return_inverse=True)
                payload = encode_gif(inv.astype(np.uint8).reshape(16, 16),
                                     pal, interlace=bool(i % 2))
                mime = "image/gif"
            w = h = 16
        else:  # real audio: 50 ms sine at a seeded frequency, 8 kHz mono
            t = np.arange(400) / 8000.0
            freq = 200.0 + float(rng.integers(0, 800))
            wave = (8000.0 * np.sin(2 * np.pi * freq * t)).astype(np.int16)
            payload, mime = encode_wav_pcm16(wave, 8000), "audio/wav"
            w = h = 0
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append(mime)
        rows["width"].append(w)
        rows["height"].append(h)
        if kind == "image":
            dur = 0
        elif not real:
            dur = 1000 + i
        else:  # 50 ms audio clips; 4-frame @ 8 fps video = 500 ms
            dur = 50 if kind == "audio" else 500
        rows["duration_ms"].append(dur)
    return pa.table(
        {f.name: pa.array(rows[f.name], f.type) for f in MEDIA_SCHEMA}
    )


class ImageDecoder:
    """Actor-pool decode/feature stage.  fake=True -> deterministic
    16-float feature from sha256(payload); fake=False -> REAL stdlib
    decode (PNG / BMP / PPM, functions/codecs.py): pixels are nearest-neighbor
    resized to `resize` and summarized as [mean_r, mean_g, mean_b,
    std_r, std_g, std_b, 10-bin grayscale histogram fractions] — 16
    float64 features per image.  Unsupported formats raise ValueError
    (a real deployment swaps Pillow into __init__)."""

    FEATURE_DIM = 16

    def __init__(self, fake: bool = False, resize: tuple[int, int] = (32, 32)):
        self.fake = fake
        self.resize = resize

    def _fake_features(self, payload: bytes) -> np.ndarray:
        d = hashlib.sha256(payload or b"").digest()
        return np.frombuffer(d[: self.FEATURE_DIM * 2], dtype=np.uint16).astype(np.float64) / 65535.0

    @staticmethod
    def decode(payload: bytes) -> np.ndarray:
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            img = decode_png(payload)
            if img.shape[2] in (2, 4):  # drop alpha
                img = img[:, :, :-1]
            if img.shape[2] == 1:  # grey -> RGB for the feature layout
                img = np.repeat(img, 3, axis=2)
            return img
        if payload[:2] == b"BM":
            return decode_bmp(payload)
        if payload[:2] == b"P6":
            return decode_ppm(payload)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            from ..functions.codecs import decode_gif

            return decode_gif(payload)
        if payload[:2] == b"\xff\xd8":
            from ..functions.codecs import decode_jpeg

            return decode_jpeg(payload)
        raise ValueError(
            "ImageDecoder: payload is not JPEG/PNG/GIF/BMP/PPM — the only "
            "formats decodable with the stdlib; use fake=True or add a "
            "codec lib")

    def features(self, payload: bytes) -> np.ndarray:
        img = self.decode(payload)
        h, w, _ = img.shape
        rh, rw = self.resize
        # nearest-neighbor resize via index gather (pure numpy)
        yi = np.minimum(((np.arange(rh) + 0.5) * h / rh).astype(np.int64), h - 1)
        xi = np.minimum(((np.arange(rw) + 0.5) * w / rw).astype(np.int64), w - 1)
        small = img[yi][:, xi].astype(np.float64) / 255.0
        gray = small.mean(axis=2)
        hist, _ = np.histogram(gray, bins=10, range=(0.0, 1.0))
        return np.concatenate([
            small.reshape(-1, 3).mean(axis=0),
            small.reshape(-1, 3).std(axis=0),
            hist.astype(np.float64) / gray.size,
        ])

    def __call__(self, t: pa.Table) -> pa.Table:
        fn = self._fake_features if self.fake else self.features
        feats = [fn(p) for p in t["payload"].to_pylist()]
        return pa.table(
            {
                "media_id": t["media_id"],
                "features": pa.array([f.tolist() for f in feats], pa.list_(pa.float64())),
            }
        )


class AudioDecoder:
    """Actor-pool audio decode/feature stage (PCM-16 WAV via the stdlib
    RIFF parser).  16 float64 features per clip: [duration_s,
    rate/48000, n_channels, rms, mean, std, peak, zero-crossing rate,
    8-bin |amplitude| histogram fractions]."""

    FEATURE_DIM = 16

    def __init__(self, fake: bool = False):
        self.fake = fake

    def _fake_features(self, payload: bytes) -> np.ndarray:
        d = hashlib.sha256(payload or b"").digest()
        return np.frombuffer(d[: self.FEATURE_DIM * 2], dtype=np.uint16).astype(np.float64) / 65535.0

    def features(self, payload: bytes) -> np.ndarray:
        samples, rate = decode_wav_pcm16(payload)
        x = samples.astype(np.float64) / 32768.0
        mono = x.mean(axis=1)
        zc = float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
        hist, _ = np.histogram(np.abs(mono), bins=8, range=(0.0, 1.0))
        n = max(mono.size, 1)
        return np.concatenate([
            np.array([
                mono.size / rate, rate / 48000.0, samples.shape[1],
                float(np.sqrt(np.mean(mono**2))) if mono.size else 0.0,
                float(mono.mean()) if mono.size else 0.0,
                float(mono.std()) if mono.size else 0.0,
                float(np.abs(mono).max()) if mono.size else 0.0,
                zc / n,
            ], dtype=np.float64),
            hist.astype(np.float64) / n,
        ])

    def __call__(self, t: pa.Table) -> pa.Table:
        fn = self._fake_features if self.fake else self.features
        feats = [fn(p) for p in t["payload"].to_pylist()]
        return pa.table(
            {
                "media_id": t["media_id"],
                "features": pa.array([f.tolist() for f in feats], pa.list_(pa.float64())),
            }
        )


class FrameSampler:
    """Video frame sampling.  fake=True emits deterministic stride
    indices derived from duration_ms (the plumbing-only path for opaque
    payloads).  fake=False REALLY decodes the payload — uncompressed
    RIFF/AVI via codecs.decode_avi_raw — samples frames at `fps`
    against the container's own frame rate, and emits each sampled
    frame's mean luminance (mean_lum in [0, 1]) as decode evidence.
    Compressed fourccs raise with the handler named (the ffmpeg/PyAV
    drop-in point)."""

    def __init__(self, fps: float = 1.0, fake: bool = False):
        self.fps = fps
        self.fake = fake

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.fake:
            ids, frames = [], []
            for mid, dur in zip(t["media_id"].to_pylist(), t["duration_ms"].to_pylist()):
                n_frames = max(int((dur or 0) / 1000.0 * self.fps), 1)
                for k in range(n_frames):
                    ids.append(mid)
                    frames.append(k)
            return pa.table(
                {"media_id": pa.array(ids, pa.int64()), "frame_idx": pa.array(frames, pa.int32())}
            )
        from ..functions.codecs import decode_avi_raw

        ids, frames, lums = [], [], []
        for mid, payload in zip(t["media_id"].to_pylist(), t["payload"].to_pylist()):
            arr, src_fps = decode_avi_raw(payload)
            step = max(int(round(src_fps / self.fps)), 1) if self.fps > 0 else 1
            for k in range(0, arr.shape[0], step):
                ids.append(mid)
                frames.append(k)
                lums.append(float(arr[k].astype(np.float64).mean()) / 255.0)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(frames, pa.int32()),
            "mean_lum": pa.array(lums, pa.float64()),
        })


def decode_images(media_ds, fake: bool = False, batch_size: int = 64, concurrency=None):
    """Images are wide binary rows: small batch_size keeps batch x
    concurrency within worker heap (task brief memory note).
    concurrency=None sizes the decode pool to the session."""
    if concurrency is None:
        from ..stages.shuffle import pool_size

        concurrency = pool_size()
    imgs = media_ds.map_batches(
        lambda t: t.filter(pa.compute.equal(t["kind"], "image")), batch_format="pyarrow"
    )
    return imgs.map_batches(
        ImageDecoder,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def decode_audio(media_ds, fake: bool = False, batch_size: int = 64, concurrency=None):
    """Audio twin of decode_images: PCM-16 WAV rows through the
    AudioDecoder actor pool."""
    if concurrency is None:
        from ..stages.shuffle import pool_size

        concurrency = pool_size()
    clips = media_ds.map_batches(
        lambda t: t.filter(pa.compute.equal(t["kind"], "audio")), batch_format="pyarrow"
    )
    return clips.map_batches(
        AudioDecoder,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(media_ds, fps: float = 1.0, fake: bool = False):
    from ..stages.shuffle import pool_size

    vids = media_ds.map_batches(
        lambda t: t.filter(pa.compute.equal(t["kind"], "video")), batch_format="pyarrow"
    )
    return vids.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"fps": fps, "fake": fake},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=pool_size(),
    )

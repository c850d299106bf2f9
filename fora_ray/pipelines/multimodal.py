"""Multimodal column plumbing — image/audio/video as opaque binary
columns with typed metadata (task brief).

The container has no image/audio codecs, so the actual decode kernels
are STUBS: ``decode_image``/``decode_audio`` raise NotImplementedError
unless ``fake=True``, in which case a deterministic fake decoder (hash
of the bytes -> fixed-shape feature vector) exercises the real Ray-side
plumbing — schema, actor-pool signature, batch size, output layout —
which is what the tests assert.

Real deployments drop in Pillow/torchaudio inside Decoder.__init__ and
keep everything else unchanged.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

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


def synthesize_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus matching MEDIA_SCHEMA."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=64 + (i % 5) * 32, dtype=np.uint8).tobytes()
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append({"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind])
        rows["width"].append(64 if kind != "audio" else 0)
        rows["height"].append(64 if kind != "audio" else 0)
        rows["duration_ms"].append(0 if kind == "image" else 1000 + i)
    return pa.table(
        {f.name: pa.array(rows[f.name], f.type) for f in MEDIA_SCHEMA}
    )


class ImageDecoder:
    """Actor-pool decode/feature stage.  fake=True -> deterministic
    16-float feature from sha256(payload); fake=False -> real decoder
    (not available in this container)."""

    FEATURE_DIM = 16

    def __init__(self, fake: bool = False, resize: tuple[int, int] = (32, 32)):
        self.fake = fake
        self.resize = resize
        if not fake:
            raise NotImplementedError(
                "real image decoding requires an imaging library not present "
                "in this environment; construct with fake=True for the "
                "deterministic plumbing-test decoder"
            )

    def _fake_features(self, payload: bytes) -> np.ndarray:
        d = hashlib.sha256(payload or b"").digest()
        return np.frombuffer(d[: self.FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32) / 65535.0

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = [self._fake_features(p) for p in t["payload"].to_pylist()]
        return pa.table(
            {
                "media_id": t["media_id"],
                "features": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
            }
        )


class FrameSampler:
    """Video frame sampling stub: emits frame indices (deterministic
    stride) per video row; payload decode is stubbed like ImageDecoder."""

    def __init__(self, fps: float = 1.0, fake: bool = False):
        self.fps = fps
        if not fake:
            raise NotImplementedError("video decoding unavailable; use fake=True")

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, frames = [], []
        for mid, dur in zip(t["media_id"].to_pylist(), t["duration_ms"].to_pylist()):
            n_frames = max(int((dur or 0) / 1000.0 * self.fps), 1)
            for k in range(n_frames):
                ids.append(mid)
                frames.append(k)
        return pa.table(
            {"media_id": pa.array(ids, pa.int64()), "frame_idx": pa.array(frames, pa.int32())}
        )


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

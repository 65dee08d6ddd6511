"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
actor-pool ``map_batches`` stages with *small, byte-bounded batches*
(a batch of B rows × payload_bytes must fit the worker heap — callers
size ``batch_size`` accordingly; see ``target_max_block_size`` note in
the Ray guide).

The decode libraries (PIL/ffmpeg/soundfile) are NOT in this container,
so the codec boundary is STUBBED: ``DecodeStub`` either raises
``NotImplementedError`` (real mode) or produces a deterministic fake
decode derived from sha256 of the payload (test mode). Everything
around the stub — schema, actor signature, batch-size discipline,
output layout — is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # image | audio | video
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)


def synthesize_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows (payload = seeded bytes) for tests."""
    rng = np.random.default_rng(seed)
    kinds = np.asarray(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads = [rng.integers(0, 256, size=int(rng.integers(256, 2048)), dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(kinds.tolist()),
            "payload": pa.array(payloads, type=pa.binary()),
            "width": pa.array(rng.integers(16, 512, n).astype(np.int32)),
            "height": pa.array(rng.integers(16, 512, n).astype(np.int32)),
            "sample_rate": pa.array(np.full(n, 16_000, dtype=np.int32)),
            "n_frames": pa.array(rng.integers(1, 300, n).astype(np.int32)),
        }
    )


class DecodeStub:
    """Actor-pool decode stage. ``fake=True`` → deterministic pseudo
    "decode": a feature vector derived from sha256(payload) — exercises
    the full Ray plumbing without the codec libraries. ``fake=False``
    raises NotImplementedError at the exact point a real codec plugs in."""

    def __init__(self, fake: bool = True, feature_dim: int = 8):
        self.fake = fake
        self.feature_dim = feature_dim
        if not fake:
            # real mode would do: import PIL / soundfile / av here (once
            # per actor) — not available in this environment.
            raise NotImplementedError("media codecs not available in this environment; use fake=True")

    def _decode(self, payload: bytes) -> np.ndarray:
        digest = hashlib.sha256(payload).digest()
        raw = np.frombuffer((digest * ((self.feature_dim * 8) // 32 + 1))[: self.feature_dim * 8], dtype=np.uint64)
        return (raw % 10_000).astype(np.float64) / 10_000.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode(p) for p in batch["payload"].to_pylist()]
        mat = np.vstack(feats)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "features": pa.array(list(mat), type=pa.list_(pa.float64())),
                "payload_bytes": pa.array([len(p) for p in batch["payload"].to_pylist()], type=pa.int64()),
            }
        )


def decode_features(ds, fake: bool = True, batch_size: int = 64, concurrency: int | None = None):
    """media table → per-item feature vectors. Small batch_size on
    purpose: payload bytes, not row count, bound the batch."""
    from ..util import pool

    concurrency = pool(concurrency)
    return ds.map_batches(
        DecodeStub,
        fn_constructor_kwargs=dict(fake=fake),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )

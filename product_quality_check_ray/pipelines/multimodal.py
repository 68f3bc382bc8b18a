"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the DECODE step is a clearly
marked stub (``decode_payload`` raises ``NotImplementedError`` unless the
deterministic fake is enabled) — but the Ray-side plumbing is real and
tested: binary-column schema, actor-pool stage signature, bytes-aware batch
sizing, and the typed feature output layout a real decoder would produce.

Scale notes: binary payloads make rows wide — the stage is meant to run with
small ``batch_size`` (caller-tunable) so batch × concurrency fits worker
heaps; payloads never pass through a shuffle (features only).
Reference analog: PDF→PIL page ingestion + bbox geometry
(``prompts/artwork_processing_common.py:139-156,280-301``) — the binary-
payload modality, re-expressed as a Dataset stage instead of a driver loop.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),
        ("declared_bytes", pa.int64()),
    ]
)

FEATURE_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),
        ("n_bytes", pa.int64()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
        ("payload_sha1", pa.string()),
    ]
)


def decode_payload(payload: bytes, media_type: str, *, allow_fake: bool = False) -> dict:
    """Decode a binary media payload into (width, height, n_frames).

    REAL decode requires PIL/ffmpeg which this container lacks — calling with
    ``allow_fake=False`` raises ``NotImplementedError`` (the stub contract).
    The deterministic fake derives dimensions from the payload digest so the
    plumbing (schema, batching, actor signature) is fully testable.
    """
    if not allow_fake:
        raise NotImplementedError(
            "media codecs are not available in this environment; "
            "run with allow_fake=True for the deterministic stand-in"
        )
    digest = hashlib.sha1(payload).digest()
    w = 64 + digest[0] % 192
    h = 64 + digest[1] % 192
    frames = 1 if media_type == "image" else 1 + digest[2] % 32
    return {"width": w, "height": h, "n_frames": frames}


class MediaFeatureStage:
    """Actor-pool decode/feature stage: one instance per actor; per-batch
    work is pure ``__call__`` (setup-once contract, reference analog A5)."""

    def __init__(self, allow_fake: bool = True, target_width: int = 64):
        self.allow_fake = allow_fake
        self.target_width = target_width

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("media_id").to_pylist()
        types = t.column("media_type").to_pylist()
        payloads = t.column("payload").to_pylist()
        rows = []
        for mid, mtype, payload in zip(ids, types, payloads):
            payload = payload or b""
            meta = decode_payload(payload, mtype, allow_fake=self.allow_fake)
            w, h = int(meta["width"]), int(meta["height"])
            if self.target_width and w > self.target_width:
                # deterministic aspect-preserving "resize" (the real stage
                # would hand decoded frames to a resampler here)
                h = max(1, round(h * self.target_width / w))
                w = self.target_width
            rows.append(
                {
                    "media_id": mid,
                    "media_type": mtype,
                    "n_bytes": len(payload),
                    "width": w,
                    "height": h,
                    "n_frames": int(meta["n_frames"]),
                    "payload_sha1": hashlib.sha1(payload).hexdigest(),
                }
            )
        return pa.Table.from_pylist(rows, schema=FEATURE_SCHEMA)


def media_dataset_from_documents(sf_dir: str) -> rd.Dataset:
    """Synthesize a media table from documents: text bytes as the opaque
    payload (deterministic; stands in for real image/audio blobs)."""
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])

    def to_media(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        rows = []
        for i, s in zip(ids, texts):
            payload = (s or "").encode("utf-8")
            rows.append(
                {
                    "media_id": int(i),
                    "payload": payload,
                    "media_type": "image" if i % 2 == 0 else "audio",
                    "declared_bytes": len(payload),
                }
            )
        return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)

    return ds.map_batches(to_media, batch_format="pyarrow")


def multimodal_features(sf_dir: str) -> rd.Dataset:
    """End-to-end multimodal plumbing: binary column → actor-pool decode
    (stubbed deterministic) → typed feature table. Small batch_size because
    payload bytes dominate row width."""
    media = media_dataset_from_documents(sf_dir)
    return media.map_batches(
        MediaFeatureStage,
        fn_constructor_kwargs={"allow_fake": True},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 4),
    )

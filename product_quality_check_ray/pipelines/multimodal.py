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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# SOF markers that carry frame dimensions (C4=DHT, C8=JPG, CC=DAC excluded)
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def png_header_bytes(width: int, height: int) -> bytes:
    """A minimal, valid PNG prefix (signature + IHDR chunk with correct CRC)
    for synthesizing image fixtures without codecs."""
    import struct
    import zlib

    chunk = b"IHDR" + struct.pack(">II", width, height) + b"\x08\x06\x00\x00\x00"
    return _PNG_SIG + struct.pack(">I", 13) + chunk + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)


def parse_image_header(payload: bytes) -> dict | None:
    """Width/height from container header bytes in pure Python — no codecs
    needed for dimensions (PNG IHDR, GIF logical screen, BMP DIB, JPEG
    SOF0/2 scan). Returns None for unrecognized containers.

    Reference analog: artwork dimension extraction
    (``prompts/artwork_processing_common.py:139-156``) which uses PIL; header
    parsing reproduces the width/height part with zero dependencies.
    """
    import struct

    if payload[:8] == _PNG_SIG and len(payload) >= 24 and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        return {"width": int(w), "height": int(h), "n_frames": 1}
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return {"width": int(w), "height": int(h), "n_frames": 1}
    if payload[:2] == b"BM" and len(payload) >= 26:
        w, h = struct.unpack("<ii", payload[18:26])
        # negative height = top-down DIB
        return {"width": abs(int(w)), "height": abs(int(h)), "n_frames": 1}
    if payload[:2] == b"\xff\xd8":
        i, n = 2, len(payload)
        while i + 4 <= n:
            if payload[i] != 0xFF:
                return None
            marker = payload[i + 1]
            if marker in _JPEG_SOF:
                if i + 9 > n:
                    return None
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return {"width": int(w), "height": int(h), "n_frames": 1}
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:
                i += 2  # standalone marker, no length field
                continue
            if i + 4 > n:
                return None
            i += 2 + struct.unpack(">H", payload[i + 2 : i + 4])[0]
        return None
    return None


def decode_payload(payload: bytes, media_type: str, *, allow_fake: bool = False) -> dict:
    """Decode a binary media payload into (width, height, n_frames).

    Image dimensions are parsed from real container headers
    (``parse_image_header``) — no codec needed. Full pixel decode and
    audio/video require PIL/ffmpeg which this container lacks: for payloads
    that aren't a recognized image container, ``allow_fake=False`` raises
    ``NotImplementedError`` (the stub contract) and ``allow_fake=True``
    derives deterministic dimensions from the payload digest so the plumbing
    (schema, batching, actor signature) stays fully testable.
    """
    if media_type == "image":
        meta = parse_image_header(payload or b"")
        if meta is not None:
            return meta
    if not allow_fake:
        raise NotImplementedError(
            "full media codecs are not available in this environment "
            "(image headers ARE parsed natively; this payload is either "
            "audio/video or an unrecognized image container); "
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
    """Synthesize a media table from documents (deterministic, no external
    data): image rows carry a VALID minimal PNG header (doc_id-derived
    dimensions) followed by the text bytes, so the real header parser is
    exercised end-to-end; audio rows stay opaque text bytes (decode stubbed).
    """
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])

    def to_media(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        text_bin = pc.cast(
            pc.fill_null(t.column("text").combine_chunks(), ""), pa.binary()
        )
        is_image = (ids % 2) == 0
        # header construction is a small C-speed bytes loop (image rows only);
        # dims are deterministic in doc_id so tests can predict them
        payloads = [
            (png_header_bytes(100 + int(i) % 900, 100 + (int(i) * 7) % 900) + tb.as_py())
            if img
            else tb.as_py()
            for i, img, tb in zip(ids, is_image, text_bin)
        ]
        pay_arr = pa.array(payloads, type=pa.binary())
        return pa.table(
            {
                "media_id": pa.array(ids),
                "payload": pay_arr,
                "media_type": pa.array(
                    np.where(is_image, "image", "audio"), type=pa.string()
                ),
                "declared_bytes": pa.array(
                    [len(p) for p in payloads], type=pa.int64()
                ),
            }
        )

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


# ---------------------------------------------------------------------------
# REAL pixel decode (PNG / BMP, pure stdlib — core/imagecodec.py)
# ---------------------------------------------------------------------------

# gradient-image fixture parameters — every value below is reproduced
# verbatim in the SQL oracle (__ray_entry__), so the decoded-pixel means are
# independently checkable: the engine must actually inflate+unfilter the PNG
# (or unpad+flip the BMP) to recover them
PX_W_MOD = 25
PX_H_MOD = 25
PX_BASE = 8


def _gradient_pixels(doc_id: int) -> "np.ndarray":
    """Deterministic RGB gradient: R varies along x, G along y, B along
    x+y — catches column-order, row-order and both-axis decode bugs."""
    w = PX_BASE + doc_id % PX_W_MOD
    h = PX_BASE + (doc_id * 7) % PX_H_MOD
    x = np.arange(w, dtype=np.int64)
    y = np.arange(h, dtype=np.int64)
    r = np.broadcast_to((doc_id + x) % 256, (h, w))
    g = np.broadcast_to(((doc_id * 3 + y) % 256)[:, None], (h, w))
    b = (doc_id * 5 + x[None, :] + y[:, None]) % 256
    return np.stack([r, g, b], axis=2).astype(np.uint8)


def media_pixel_dataset(sf_dir: str) -> rd.Dataset:
    """Synthesize REAL image payloads from the documents table (no external
    data): even doc_ids → PNG (per-row filter type cycles 0-4, exercising
    every unfilter path), odd → 24-bit BMP (padded, bottom-up). Payloads are
    a pure function of doc_id, so expected features are SQL-computable."""
    from ..core.imagecodec import encode_bmp, encode_png

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])

    def to_media(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        payloads = []
        for i in ids:
            px = _gradient_pixels(int(i))
            if i % 2 == 0:
                filters = (int(i) + np.arange(px.shape[0])) % 5
                payloads.append(encode_png(px, filters))
            else:
                payloads.append(encode_bmp(px))
        return pa.table(
            {
                "media_id": pa.array(ids),
                "payload": pa.array(payloads, type=pa.binary()),
                "container": pa.array(
                    np.where(ids % 2 == 0, "png", "bmp"), type=pa.string()
                ),
            }
        )

    return ds.map_batches(to_media, batch_format="pyarrow")


DECODE_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("container", pa.string()),
        ("width", pa.int64()),
        ("height", pa.int64()),
        ("mean_r", pa.float64()),
        ("mean_g", pa.float64()),
        ("mean_b", pa.float64()),
    ]
)


class MediaDecodeStage:
    """Actor-pool REAL decode stage: payload bytes → pixels → per-channel
    means. Decoding state (none today; a real model/codec handle would live
    here) is constructed once per actor; ``__call__`` is per batch. Payloads
    never pass a shuffle — only the tiny feature rows leave the stage."""

    def __init__(self):
        from ..core.imagecodec import decode_image

        self._decode = decode_image

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..core.rounding import round_half_away as _rha

        ids = t.column("media_id").to_pylist()
        containers = t.column("container").to_pylist()
        payloads = t.column("payload").to_pylist()
        rows = []
        for mid, cont, payload in zip(ids, containers, payloads):
            px = self._decode(payload)
            means = px.reshape(-1, 3).mean(axis=0)
            rows.append(
                {
                    "media_id": mid,
                    "container": cont,
                    "width": px.shape[1],
                    "height": px.shape[0],
                    "mean_r": float(_rha(means[0], 6)),
                    "mean_g": float(_rha(means[1], 6)),
                    "mean_b": float(_rha(means[2], 6)),
                }
            )
        return pa.Table.from_pylist(rows, schema=DECODE_SCHEMA)


def multimodal_decode(sf_dir: str) -> rd.Dataset:
    """Decode real PNG/BMP payloads and emit per-channel pixel means —
    SQL-oracle-checked against the closed-form gradient expectations
    (any inflate/unfilter/padding/row-order bug shifts a mean)."""
    media = media_pixel_dataset(sf_dir)
    return media.map_batches(
        MediaDecodeStage,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 4),
    )


# resize targets — reproduced verbatim in the SQL oracle: nearest-neighbor
# source index is floor(dst * src_dim / target), pure integer arithmetic,
# so the resized-pixel means are closed-form per doc_id
RZ_W = 16
RZ_H = 12

RESIZE_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("container", pa.string()),
        ("src_width", pa.int64()),
        ("src_height", pa.int64()),
        ("rz_width", pa.int64()),
        ("rz_height", pa.int64()),
        ("rz_mean_r", pa.float64()),
        ("rz_mean_g", pa.float64()),
        ("rz_mean_b", pa.float64()),
    ]
)


class MediaResizeStage:
    """Actor-pool decode → REAL pixel resample stage (reference analog S6,
    `artwork_processing_common.py:280-301` bbox crops/resamples). Decodes
    the payload, nearest-neighbor-resizes to a fixed RZ_W×RZ_H thumbnail
    (one vectorized fancy-index gather — src row/col index vectors are
    computed once per image, no per-pixel Python), and emits per-channel
    means of the RESIZED image. Only feature rows leave the stage; pixels
    and payloads never shuffle."""

    def __init__(self, width: int = RZ_W, height: int = RZ_H):
        from ..core.imagecodec import decode_image

        self._decode = decode_image
        self.tw = int(width)
        self.th = int(height)

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..core.rounding import round_half_away as _rha

        ids = t.column("media_id").to_pylist()
        containers = t.column("container").to_pylist()
        payloads = t.column("payload").to_pylist()
        rows = []
        for mid, cont, payload in zip(ids, containers, payloads):
            px = self._decode(payload)
            h, w = px.shape[0], px.shape[1]
            src_y = (np.arange(self.th, dtype=np.int64) * h) // self.th
            src_x = (np.arange(self.tw, dtype=np.int64) * w) // self.tw
            rz = px[src_y[:, None], src_x[None, :]]
            means = rz.reshape(-1, 3).astype(np.float64).mean(axis=0)
            rows.append(
                {
                    "media_id": mid,
                    "container": cont,
                    "src_width": w,
                    "src_height": h,
                    "rz_width": self.tw,
                    "rz_height": self.th,
                    "rz_mean_r": float(_rha(means[0], 6)),
                    "rz_mean_g": float(_rha(means[1], 6)),
                    "rz_mean_b": float(_rha(means[2], 6)),
                }
            )
        return pa.Table.from_pylist(rows, schema=RESIZE_SCHEMA)


def multimodal_resize(sf_dir: str) -> rd.Dataset:
    """Decode + nearest-neighbor thumbnail resize over the real PNG/BMP
    payloads — resized-pixel means are SQL-oracle-checked (the NN source
    index floor(dst·src/target) is integer arithmetic the oracle replays,
    so a resampler off-by-one or axis swap shifts a mean)."""
    media = media_pixel_dataset(sf_dir)
    return media.map_batches(
        MediaResizeStage,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 4),
    )


# ---------------------------------------------------------------------------
# REAL audio decode (WAV PCM16, pure stdlib — core/audiocodec.py)
# ---------------------------------------------------------------------------

# sawtooth fixture parameters — reproduced verbatim in the SQL oracle
# (__ray_entry__), so the decoded-sample statistics are independently
# checkable: the engine's values come from decoded WAV frames, the oracle's
# from the closed-form formula — any RIFF-walk/endianness/dtype bug shifts
# a mean or the RMS
AU_RATE_BASE = 8000
AU_RATE_STEP = 2000
AU_RATE_MOD = 5
AU_N_BASE = 200
AU_N_MOD = 301
AU_A_MULT = 131
AU_STEP_MOD = 7


def _sawtooth_samples(doc_id: int) -> tuple["np.ndarray", int]:
    """Deterministic int16 sawtooth: s[i] = ((a + i*step) % 65536) - 32768.
    Phase, slope, length and sample rate all vary with doc_id so a decoder
    bug on any field is caught."""
    a = (doc_id * AU_A_MULT) % 65536
    step = 1 + doc_id % AU_STEP_MOD
    n = AU_N_BASE + (doc_id * 3) % AU_N_MOD
    rate = AU_RATE_BASE + (doc_id % AU_RATE_MOD) * AU_RATE_STEP
    i = np.arange(n, dtype=np.int64)
    return ((a + i * step) % 65536 - 32768).astype(np.int16), rate


def media_audio_dataset(sf_dir: str) -> rd.Dataset:
    """Synthesize REAL WAV payloads from the documents table (no external
    data): every row is a PCM16 mono WAV whose samples are a pure function
    of doc_id, so expected features are SQL-computable."""
    from ..core.audiocodec import encode_wav

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])

    def to_media(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        payloads = []
        for i in ids:
            samples, rate = _sawtooth_samples(int(i))
            payloads.append(encode_wav(samples, rate))
        return pa.table(
            {
                "media_id": pa.array(ids),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )

    return ds.map_batches(to_media, batch_format="pyarrow")


AUDIO_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("sample_rate", pa.int64()),
        ("n_samples", pa.int64()),
        ("duration_ms", pa.float64()),
        ("mean_amp", pa.float64()),
        ("rms", pa.float64()),
        ("peak", pa.int64()),
    ]
)


class AudioFeatureStage:
    """Actor-pool REAL audio decode stage: WAV bytes → int16 frames →
    per-clip statistics. Same contract as MediaDecodeStage: construct-once
    per actor, per-batch __call__, payloads never pass a shuffle."""

    def __init__(self):
        from ..core.audiocodec import decode_wav

        self._decode = decode_wav

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..core.rounding import round_half_away as _rha

        ids = t.column("media_id").to_pylist()
        payloads = t.column("payload").to_pylist()
        rows = []
        for mid, payload in zip(ids, payloads):
            frames, rate = self._decode(payload)
            s = frames[:, 0].astype(np.int64)
            n = s.shape[0]
            rows.append(
                {
                    "media_id": mid,
                    "sample_rate": rate,
                    "n_samples": n,
                    "duration_ms": float(_rha(n * 1000.0 / rate, 6)),
                    "mean_amp": float(_rha(s.mean(), 6)),
                    "rms": float(_rha(float(np.sqrt((s * s).mean())), 6)),
                    "peak": int(np.abs(s).max()),
                }
            )
        return pa.Table.from_pylist(rows, schema=AUDIO_SCHEMA)


def multimodal_audio(sf_dir: str) -> rd.Dataset:
    """Decode real WAV payloads and emit per-clip sample statistics —
    SQL-oracle-checked against the closed-form sawtooth expectations."""
    media = media_audio_dataset(sf_dir)
    return media.map_batches(
        AudioFeatureStage,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 4),
    )


# ---------------------------------------------------------------------------
# Video frame sampling (multi-frame container of real BMP frames)
# ---------------------------------------------------------------------------

# container fixture parameters — mirrored in the SQL oracle: a "video" is
# F concatenated BMP frames; the stage must walk the container by each
# frame's declared file size, sample every k-th frame, and REALLY decode it
VF_COUNT_BASE = 2
VF_COUNT_MOD = 4
VF_SAMPLE_EVERY = 2
VF_SEED_MULT = 997


def split_bmp_frames(payload: bytes) -> list[bytes]:
    """Walk a concatenated-BMP container using each frame's declared file
    size (BMP header bytes 2:6)."""
    import struct as _struct

    frames, i, n = [], 0, len(payload)
    while i + 6 <= n:
        if payload[i : i + 2] != b"BM":
            raise ValueError("container desync: frame does not start with BM")
        (size,) = _struct.unpack("<I", payload[i + 2 : i + 6])
        frames.append(payload[i : i + size])
        i += size
    if i != n:
        raise ValueError("trailing bytes after last frame")
    return frames


def media_video_dataset(sf_dir: str) -> rd.Dataset:
    """Synthesize multi-frame video containers from the documents table:
    frame f's pixels are the gradient fixture seeded with
    doc_id + VF_SEED_MULT*(f+1), so sampled-frame means are SQL-computable."""
    from ..core.imagecodec import encode_bmp

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])

    def to_media(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        payloads, counts = [], []
        for i in ids:
            f_count = VF_COUNT_BASE + int(i) % VF_COUNT_MOD
            frames = [
                encode_bmp(_gradient_pixels(int(i) + VF_SEED_MULT * (f + 1)))
                for f in range(f_count)
            ]
            payloads.append(b"".join(frames))
            counts.append(f_count)
        return pa.table(
            {
                "media_id": pa.array(ids),
                "payload": pa.array(payloads, type=pa.binary()),
                "n_frames": pa.array(counts, type=pa.int64()),
            }
        )

    return ds.map_batches(to_media, batch_format="pyarrow")


FRAME_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("frame_idx", pa.int64()),
        ("n_frames", pa.int64()),
        ("width", pa.int64()),
        ("height", pa.int64()),
        ("mean_r", pa.float64()),
        ("mean_g", pa.float64()),
        ("mean_b", pa.float64()),
    ]
)


class VideoFrameStage:
    """Actor-pool frame-sampling stage: container bytes → frame list →
    every k-th frame decoded (real BMP decode) → per-frame channel means.
    One output row per SAMPLED frame (row-backref via media_id/frame_idx)."""

    def __init__(self, sample_every: int = VF_SAMPLE_EVERY):
        from ..core.imagecodec import decode_bmp

        self._decode = decode_bmp
        self.sample_every = sample_every

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..core.rounding import round_half_away as _rha

        ids = t.column("media_id").to_pylist()
        payloads = t.column("payload").to_pylist()
        declared = t.column("n_frames").to_pylist()
        rows = []
        for mid, payload, n_frames in zip(ids, payloads, declared):
            frames = split_bmp_frames(payload)
            if len(frames) != n_frames:
                raise ValueError(f"media {mid}: declared {n_frames} frames, found {len(frames)}")
            for f in range(0, len(frames), self.sample_every):
                px = self._decode(frames[f])
                means = px.reshape(-1, 3).mean(axis=0)
                rows.append(
                    {
                        "media_id": mid,
                        "frame_idx": f,
                        "n_frames": n_frames,
                        "width": px.shape[1],
                        "height": px.shape[0],
                        "mean_r": float(_rha(means[0], 6)),
                        "mean_g": float(_rha(means[1], 6)),
                        "mean_b": float(_rha(means[2], 6)),
                    }
                )
        return pa.Table.from_pylist(rows, schema=FRAME_SCHEMA)


def multimodal_video_frames(sf_dir: str) -> rd.Dataset:
    """Sample + decode every k-th frame of multi-frame containers —
    SQL-oracle-checked per sampled frame against the gradient closed form."""
    media = media_video_dataset(sf_dir)
    return media.map_batches(
        VideoFrameStage,
        batch_format="pyarrow",
        batch_size=128,
        concurrency=(1, 4),
    )


# ---------------------------------------------------------------------------
# URL fetch → base64 (reference S7: app.py:353-361 fetch_image_as_base64)
# ---------------------------------------------------------------------------

FETCH_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("payload_b64", pa.string()),
        ("n_bytes", pa.int64()),
        ("ok", pa.bool_()),
        ("error", pa.string()),
    ]
)


class UrlFetchStage:
    """Actor-pool fetch stage: a ``url`` column → base64 payload + status
    columns. Reference analog S7 (``app.py:353-361`` —
    ``requests.get`` → ``base64.b64encode``, None on failure), re-expressed
    as a per-batch stage with the client held once per actor and per-ROW
    error isolation (one bad URL never fails a batch; the reference's
    None-on-failure contract, with the reason kept in ``error``).

    The sandbox has no network, so the DEFAULT opener performs REAL I/O for
    ``file://`` paths and ``data:`` URIs (base64 and percent-plain forms)
    and records a per-row error for ``http(s)`` — exactly like the
    reference it treats a bare scheme-less URL as https. Inject
    ``opener=`` (``url -> bytes``) in production for an HTTP client; the
    Ray-side plumbing — actor state, batching, output schema, size cap —
    is identical either way.
    """

    def __init__(
        self,
        url_col: str = "url",
        opener=None,
        max_bytes: int = 16 << 20,
    ):
        self.url_col = url_col
        self.opener = opener
        self.max_bytes = int(max_bytes)

    def _fetch(self, url: str) -> bytes:
        import base64 as _b64
        import urllib.parse as _up

        if url.startswith("data:"):
            head, _, body = url.partition(",")
            if not _ or len(url) > 4 * self.max_bytes:
                raise ValueError("malformed or oversized data: URI")
            raw = (
                _b64.b64decode(body, validate=True)
                if head.endswith(";base64")
                else _up.unquote_to_bytes(body)
            )
        elif url.startswith("file://") or url.startswith("/"):
            path = url[len("file://"):] if url.startswith("file://") else url
            import os as _os

            if _os.path.getsize(path) > self.max_bytes:
                raise ValueError(f"payload exceeds max_bytes={self.max_bytes}")
            with open(path, "rb") as f:
                raw = f.read(self.max_bytes + 1)
        else:
            # reference behavior: a scheme-less URL is https
            if not url.startswith("http"):
                url = "https://" + url.strip().lstrip("/")
            if self.opener is None:
                raise ValueError(
                    "http(s) fetch requires an injected opener "
                    "(no network in this environment)"
                )
            raw = self.opener(url)
        if len(raw) > self.max_bytes:
            raise ValueError(f"payload exceeds max_bytes={self.max_bytes}")
        return raw

    def __call__(self, t: pa.Table) -> pa.Table:
        import base64 as _b64

        rows = []
        for url in t.column(self.url_col).to_pylist():
            if url is None:
                rows.append(
                    {"url": None, "payload_b64": None, "n_bytes": 0,
                     "ok": False, "error": "null url"}
                )
                continue
            try:
                raw = self._fetch(url)
                rows.append(
                    {
                        "url": url,
                        "payload_b64": _b64.b64encode(raw).decode("ascii"),
                        "n_bytes": len(raw),
                        "ok": True,
                        "error": None,
                    }
                )
            except Exception as exc:  # per-row isolation (reference contract)
                rows.append(
                    {"url": url, "payload_b64": None, "n_bytes": 0,
                     "ok": False, "error": f"{type(exc).__name__}: {exc}"[:200]}
                )
        return pa.Table.from_pylist(rows, schema=FETCH_SCHEMA)


def fetch_urls(
    ds: rd.Dataset,
    url_col: str = "url",
    *,
    opener=None,
    concurrency=(1, 4),
    batch_size: int = 64,
) -> rd.Dataset:
    """Fetch every row's URL into a base64 payload column (actor pool —
    I/O-bound stage, small batches so stragglers re-balance)."""
    return ds.map_batches(
        UrlFetchStage,
        fn_constructor_kwargs={"url_col": url_col, "opener": opener},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# JPEG probe — the lossy leg of the decode family (VERDICT r4 item 8).
# ---------------------------------------------------------------------------

JPEG_QUALITY = 92
JPEG_MEAN_TOL = 4.0  # per-channel |decoded mean − true mean| bound; measured
# worst 1.22 across the fixture gradient set at quality 92 (both samplings)

JPEG_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("sampling", pa.string()),
        ("width", pa.int64()),
        ("height", pa.int64()),
        ("ok", pa.int64()),
    ]
)


def media_jpeg_dataset(sf_dir: str) -> rd.Dataset:
    """REAL baseline-JPEG payloads from the documents table: the same
    deterministic gradient pixels as ``media_pixel_dataset``, compressed
    with the pure-stdlib encoder — even doc_ids 4:4:4, odd 4:2:0 (so both
    decoder sampling paths are driver-exercised)."""
    from ..core.imagecodec import encode_jpeg

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])

    def to_media(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        payloads = [
            encode_jpeg(
                _gradient_pixels(int(i)),
                quality=JPEG_QUALITY,
                subsample=1 if i % 2 == 0 else 2,
            )
            for i in ids
        ]
        return pa.table(
            {
                "media_id": pa.array(ids),
                "payload": pa.array(payloads, type=pa.binary()),
                "sampling": pa.array(
                    np.where(ids % 2 == 0, "p444", "p420"), type=pa.string()
                ),
            }
        )

    return ds.map_batches(to_media, batch_format="pyarrow")


class JpegProbeStage:
    """Actor-pool lossy-decode probe: decode each baseline-JPEG payload,
    compare per-channel pixel means against the closed-form gradient truth,
    emit exact dimensions + a bounded-error verdict. The oracle asserts the
    verdict STRUCTURALLY (ok = 1 for every row — the seq_sketch_accuracy
    grading pattern: lossy pixel values are not SQL-replayable, the bound
    and the exact dims are)."""

    def __init__(self):
        from ..core.imagecodec import decode_jpeg

        self._decode = decode_jpeg

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("media_id").to_pylist()
        samplings = t.column("sampling").to_pylist()
        payloads = t.column("payload").to_pylist()
        rows = []
        for mid, samp, payload in zip(ids, samplings, payloads):
            px = self._decode(payload)
            truth = _gradient_pixels(int(mid))
            err = float(
                np.abs(
                    px.reshape(-1, 3).mean(axis=0)
                    - truth.reshape(-1, 3).mean(axis=0)
                ).max()
            )
            rows.append(
                {
                    "media_id": mid,
                    "sampling": samp,
                    "width": px.shape[1],
                    "height": px.shape[0],
                    "ok": int(
                        px.shape[:2] == truth.shape[:2] and err <= JPEG_MEAN_TOL
                    ),
                }
            )
        return pa.Table.from_pylist(rows, schema=JPEG_SCHEMA)


def multimodal_jpeg(sf_dir: str) -> rd.Dataset:
    """Encode→decode the lossy container end-to-end and grade exact
    dimensions + the documented mean-error bound per image.

    Task functions, not an actor pool: the probe holds no state and the
    codec is pure numpy (measured 0.16 s per 100 images), so the
    multi-second actor-pool startup would dominate the wall (the
    `_row_check_task` pattern — verify-skill gotcha #4)."""
    media = media_jpeg_dataset(sf_dir)

    def probe(t: pa.Table, _cache={}) -> pa.Table:
        st = _cache.get("st")
        if st is None:
            st = _cache["st"] = JpegProbeStage()
        return st(t)

    return media.map_batches(probe, batch_format="pyarrow", batch_size=256)

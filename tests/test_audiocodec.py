"""Pure-stdlib WAV codec + multi-frame BMP container: round-trips, chunk
walking, frame sampling, fixture-formula parity."""

import struct

import numpy as np
import pytest

from product_quality_check_ray.core.audiocodec import decode_wav, encode_wav
from product_quality_check_ray.core.imagecodec import encode_bmp
from product_quality_check_ray.pipelines import multimodal as mm


def test_wav_round_trip_mono():
    rng = np.random.default_rng(3)
    s = rng.integers(-32768, 32768, 501, dtype=np.int16)
    frames, rate = decode_wav(encode_wav(s, 16000))
    assert rate == 16000
    assert frames.shape == (501, 1)
    assert (frames[:, 0] == s).all()


def test_wav_round_trip_stereo():
    rng = np.random.default_rng(4)
    s = rng.integers(-32768, 32768, (64, 2), dtype=np.int16)
    frames, rate = decode_wav(encode_wav(s, 44100, n_channels=2))
    assert rate == 44100
    assert (frames == s).all()


def test_wav_chunk_walk_skips_unknown_and_word_aligns():
    # insert an odd-length LIST chunk before data: the walker must skip it
    # with word alignment (length & 1 pad byte)
    s = np.arange(-5, 5, dtype=np.int16)
    payload = bytearray(encode_wav(s, 8000))
    fmt_end = 12 + 8 + 16
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded to even
    patched = bytes(payload[:fmt_end]) + junk + bytes(payload[fmt_end:])
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    frames, rate = decode_wav(patched)
    assert rate == 8000
    assert (frames[:, 0] == s).all()


def test_wav_rejects_non_pcm_and_truncation():
    s = np.zeros(4, dtype=np.int16)
    buf = bytearray(encode_wav(s, 8000))
    buf[20] = 3  # audio_format = IEEE float
    with pytest.raises(ValueError):
        decode_wav(bytes(buf))
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x00\x00\x00\x00WAVE")  # no fmt/data
    with pytest.raises(ValueError):
        decode_wav(b"OggS" + b"\x00" * 40)


def test_sawtooth_fixture_stats_match_formula():
    # engine-side stats over decoded frames == closed form mirrored in SQL
    for doc_id in (0, 1, 17, 499, 12345):
        s, rate = mm._sawtooth_samples(doc_id)
        frames, r2 = decode_wav(encode_wav(s, rate))
        a = (doc_id * mm.AU_A_MULT) % 65536
        step = 1 + doc_id % mm.AU_STEP_MOD
        n = mm.AU_N_BASE + (doc_id * 3) % mm.AU_N_MOD
        i = np.arange(n, dtype=np.int64)
        expect = (a + i * step) % 65536 - 32768
        assert r2 == rate and (frames[:, 0].astype(np.int64) == expect).all()


def test_split_bmp_frames_walk_and_errors():
    rng = np.random.default_rng(8)
    frames = [
        encode_bmp(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
        for w, h in [(3, 2), (5, 5), (1, 7)]
    ]
    out = mm.split_bmp_frames(b"".join(frames))
    assert out == frames
    with pytest.raises(ValueError):
        mm.split_bmp_frames(b"".join(frames) + b"XX")  # desync / trailing
    with pytest.raises(ValueError):
        mm.split_bmp_frames(b"PK" + b"\x00" * 20)


def test_video_stage_samples_every_kth_frame(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import pyarrow as pa

    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1, 2, 3], type=pa.int64())}),
        tmp_path / "documents.parquet",
    )
    rows = mm.multimodal_video_frames(str(tmp_path)).take_all()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    for d in range(4):
        f_count = mm.VF_COUNT_BASE + d % mm.VF_COUNT_MOD
        assert sorted(by_id[d]) == list(range(0, f_count, mm.VF_SAMPLE_EVERY))
    # frame means obey the gradient closed form for a spot-checked frame
    r = next(
        r for r in rows if r["media_id"] == 2 and r["frame_idx"] == 2
    )
    d = 2 + mm.VF_SEED_MULT * 3
    w = mm.PX_BASE + d % mm.PX_W_MOD
    assert r["width"] == w
    assert r["mean_r"] == pytest.approx(
        np.mean((d + np.arange(w)) % 256), abs=1e-6
    )

"""Multi-format corpus reader: parquet/CSV/JSONL produce the same Dataset
contract and flow through a real pipeline stage."""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.parquet as pq
import pytest

from product_quality_check_ray.sources.corpus import detect_format, read_corpus

ROWS = [
    {"doc_id": 1, "text": "the quick brown fox", "lang": "en"},
    {"doc_id": 2, "text": "el zorro marron", "lang": "es"},
    {"doc_id": 3, "text": "hello world again", "lang": "en"},
]


@pytest.fixture(scope="module")
def format_dir(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("formats")
    t = pa.Table.from_pylist(ROWS)
    pq.write_table(t, str(d / "docs.parquet"))
    pacsv.write_csv(t, str(d / "docs.csv"))
    with open(d / "docs.jsonl", "w") as f:
        for r in ROWS:
            f.write(json.dumps(r) + "\n")
    return d


def test_detect_format(format_dir):
    assert detect_format(str(format_dir / "docs.parquet")) == "parquet"
    assert detect_format(str(format_dir / "docs.csv")) == "csv"
    assert detect_format(str(format_dir / "docs.jsonl")) == "json"
    with pytest.raises(ValueError):
        detect_format(str(format_dir))  # mixed-format dir must fail loudly


def test_all_formats_read_identically(format_dir):
    frames = {}
    for name in ("docs.parquet", "docs.csv", "docs.jsonl"):
        ds = read_corpus(str(format_dir / name), required=["doc_id", "text"])
        frames[name] = (
            ds.to_pandas().sort_values("doc_id").reset_index(drop=True)[["doc_id", "text", "lang"]]
        )
    assert frames["docs.parquet"].equals(frames["docs.csv"])
    assert frames["docs.parquet"].equals(frames["docs.jsonl"])


def test_projection_and_required_validation(format_dir):
    ds = read_corpus(str(format_dir / "docs.csv"), columns=["doc_id", "text"])
    assert set(ds.schema().names) == {"doc_id", "text"}
    with pytest.raises(ValueError, match="missing required columns"):
        read_corpus(str(format_dir / "docs.csv"), required=["nope"])
    with pytest.raises(ValueError, match="missing projected columns"):
        read_corpus(str(format_dir / "docs.jsonl"), columns=["nope"])


def test_csv_corpus_through_pipeline_stage(format_dir):
    """A CSV corpus flows through a real engine stage (token stats kernel)."""
    import pyarrow.compute as pc

    from product_quality_check_ray.pipelines.text import WS_TOKEN_RE, _count_re

    ds = read_corpus(str(format_dir / "docs.csv"), required=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t.column("doc_id"), "n_words": _count_re(t.column("text"), WS_TOKEN_RE)}
        )

    out = ds.map_batches(f, batch_format="pyarrow").to_pandas().sort_values("doc_id")
    assert list(out["n_words"]) == [4, 3, 3]


# ---------------------------------------------------------------------------
# URL fetch → base64 (reference S7 analog)
# ---------------------------------------------------------------------------


def test_url_fetch_stage_offline_sources(ray_session, tmp_path):
    """file:// and data: URIs fetch with REAL I/O; http(s) and bad rows
    record per-row errors (never failing the batch); a custom opener makes
    http work — the production injection point."""
    import base64

    import pyarrow as pa
    import ray.data as rd

    from product_quality_check_ray.pipelines.multimodal import (
        UrlFetchStage,
        fetch_urls,
    )

    payload = b"\x89PNG-ish bytes \x00\x01\x02"
    p = tmp_path / "img.bin"
    p.write_bytes(payload)
    urls = [
        f"file://{p}",
        "data:application/octet-stream;base64," + base64.b64encode(b"hi!").decode(),
        "data:text/plain,hello%20world",
        "example.com/x.png",          # scheme-less → https → no network
        f"file://{tmp_path}/missing.bin",
        None,
    ]
    ds = rd.from_arrow(pa.table({"url": pa.array(urls, type=pa.string())}))
    out = fetch_urls(ds, concurrency=(1, 2), batch_size=3).to_pandas()
    out = out.set_index("url", drop=False)

    row = out.loc[f"file://{p}"]
    assert row.ok and base64.b64decode(row.payload_b64) == payload
    assert row.n_bytes == len(payload)
    assert base64.b64decode(out.iloc[1].payload_b64) == b"hi!"
    assert base64.b64decode(out.iloc[2].payload_b64) == b"hello world"
    assert not out.loc["example.com/x.png"].ok
    assert "opener" in out.loc["example.com/x.png"].error
    assert not out.iloc[4].ok and "FileNotFoundError" in out.iloc[4].error
    assert not out.iloc[5].ok and out.iloc[5].error == "null url"

    # injected opener: the stage fetches over "http" via the client it holds
    fake_store = {"https://example.com/x.png": b"NETBYTES"}
    st = UrlFetchStage(opener=lambda u: fake_store[u])
    got = st(pa.table({"url": pa.array(["example.com/x.png"])})).to_pylist()[0]
    assert got["ok"] and base64.b64decode(got["payload_b64"]) == b"NETBYTES"

    # size cap: an oversized file is an error row, not a batch failure
    big = tmp_path / "big.bin"
    big.write_bytes(b"x" * 1024)
    st2 = UrlFetchStage(max_bytes=100)
    got2 = st2(pa.table({"url": pa.array([f"file://{big}"])})).to_pylist()[0]
    assert not got2["ok"] and "max_bytes" in got2["error"]

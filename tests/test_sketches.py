"""Sketch accuracy + mergeability bounds (SURVEY.md §5 plan #5)."""

import numpy as np

from product_quality_check_ray.state.sketches import HyperLogLog, TDigest


def test_tdigest_quantiles_merged_partials():
    rng = np.random.default_rng(1)
    vals = rng.gamma(4.0, 60.0, size=100_000)
    parts = [TDigest().add(vals[i::16]) for i in range(16)]
    td = TDigest()
    for p in parts:
        td.merge(p)
    assert td.count == len(vals)
    for q in (0.1, 0.5, 0.9, 0.99):
        true = np.quantile(vals, q)
        assert abs(td.quantile(q) - true) / true < 0.02, q


def test_tdigest_merge_order_insensitive_within_tolerance():
    rng = np.random.default_rng(2)
    vals = rng.normal(100, 15, size=50_000)
    parts = [TDigest().add(vals[i::8]) for i in range(8)]
    a = TDigest()
    for p in parts:
        a.merge(TDigest.from_bytes(p.to_bytes()))
    b = TDigest()
    for p in reversed(parts):
        b.merge(TDigest.from_bytes(p.to_bytes()))
    for q in (0.5, 0.9):
        assert abs(a.quantile(q) - b.quantile(q)) / abs(a.quantile(q)) < 0.01


def test_tdigest_serialization_roundtrip():
    td = TDigest().add(np.arange(1000.0))
    td2 = TDigest.from_bytes(td.to_bytes())
    assert td2.count == td.count
    assert abs(td2.quantile(0.5) - td.quantile(0.5)) < 1e-9


def test_tdigest_extremes():
    td = TDigest().add(np.arange(10_000.0))
    assert td.quantile(1.0) == 9999.0
    assert abs(td.quantile(0.0)) <= 1.0


def test_hll_error_bound_and_merge():
    ids = [f"doc-{i}" for i in range(200_000)]
    parts = [HyperLogLog() for _ in range(10)]
    for i, p in enumerate(parts):
        p.add_strings(ids[i::10])
    h = HyperLogLog()
    for p in parts:
        h.merge(HyperLogLog.from_bytes(p.to_bytes()))
    est = h.estimate()
    # p=12 → ~1.04/sqrt(4096) ≈ 1.6% std error; allow 5%
    assert abs(est - 200_000) / 200_000 < 0.05


def test_hll_merge_is_union_not_sum():
    a = HyperLogLog().add_strings([f"x-{i}" for i in range(10_000)])
    b = HyperLogLog().add_strings([f"x-{i}" for i in range(10_000)])  # same set
    a.merge(b)
    assert abs(a.estimate() - 10_000) / 10_000 < 0.05


def test_hll_small_range_linear_counting():
    h = HyperLogLog().add_strings([f"y-{i}" for i in range(50)])
    assert abs(h.estimate() - 50) < 5


def test_distinct_by_source_exact_across_batches(ray_session, tmp_path):
    """The hash-range distinct reduce counts exactly across fragment and
    batch boundaries (same id repeated in many fragments counts once)."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from product_quality_check_ray.core.hashing import hash_strings
    from product_quality_check_ray.pipelines.seq_queries import _distinct_by_source

    ids_a = [f"a-{i % 37}" for i in range(500)]      # 37 distinct, heavy dup
    ids_b = [f"b-{i}" for i in range(211)]           # 211 distinct, unique
    srcs = ["web"] * 500 + ["code"] * 211
    t = pa.table(
        {
            "k": pa.array(
                hash_strings(pa.array(ids_a + ids_b)).view(np.int64)
            ),
            "s": pa.array(
                hash_strings(pa.array(srcs)).view(np.int64)
            ),
        }
    )
    d = str(tmp_path / "p")
    os.makedirs(d)
    pq.write_table(t.slice(0, 300), os.path.join(d, "x0.parquet"))
    pq.write_table(t.slice(300), os.path.join(d, "x1.parquet"))
    ds = rd.read_parquet(d).materialize()
    got = _distinct_by_source(ds)
    web_h = int(hash_strings(["web"]).view(np.int64)[0])
    code_h = int(hash_strings(["code"]).view(np.int64)[0])
    assert got[web_h] == 37 and got[code_h] == 211


def test_seq_sketch_accuracy_flags_all_true(ray_session):
    from product_quality_check_ray.pipelines.seq_queries import seq_sketch_accuracy

    t = seq_sketch_accuracy("/root/testdata/sf0.001").to_pandas()
    assert len(t) > 0 and t["rows"].sum() == 8000
    for c in ("hll_ok", "p50_ok", "p90_ok", "p99_ok"):
        assert t[c].all(), c


def test_seq_sketch_accuracy_bound_is_live(ray_session, monkeypatch):
    """The bound check is a real comparison, not a constant: shrinking the
    HLL bound to ~0 makes estimate-vs-exact deviations fail (unless the
    estimate is exactly equal everywhere, in which case tighten further on
    the rank window to prove the same for t-digest)."""
    from product_quality_check_ray.pipelines import seq_queries as sq

    monkeypatch.setattr(sq, "SKETCH_HLL_BOUND", 0.0)
    monkeypatch.setattr(sq, "SKETCH_TD_RANK_EPS", 0.0)
    t = sq.seq_sketch_accuracy("/root/testdata/sf0.001").to_pandas()
    # with zero slack at least one source must deviate somewhere (HLL is
    # approximate by construction at 12k+ distinct ids)
    flags = t[["hll_ok", "p50_ok", "p90_ok", "p99_ok"]].to_numpy()
    assert not flags.all()

"""seq_length_outliers: quantile-disc parity and edge-case coverage.

The operator's exactness claim is that ``_disc_quantiles`` (thresholds from
the per-(source, n_tok) count merge) reproduces DuckDB ``quantile_disc``
bit-for-bit — Hypothesis drives random count tables through both. The
end-to-end flag pass is covered at the sf gates; here a planted direct-path
corpus pins NULL handling and the tie/rank boundaries.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from product_quality_check_ray.pipelines.seq_queries import (
    OUTLIER_Q_HI,
    OUTLIER_Q_LO,
    _disc_quantiles,
    seq_length_outliers,
)


@given(
    vals=st.lists(
        st.tuples(st.integers(min_value=0, max_value=50), st.integers(1, 5)),
        min_size=1,
        max_size=30,
    ),
    qs=st.lists(st.floats(0.001, 0.999), min_size=1, max_size=4),
)
@settings(max_examples=60, deadline=None)
def test_disc_quantiles_match_duckdb(vals, qs):
    counts = (
        pd.DataFrame({"n_tok": [v for v, _ in vals], "n": [c for _, c in vals]})
        .groupby("n_tok", as_index=False)["n"]
        .sum()
    )
    counts["source"] = "s"
    th = _disc_quantiles(counts, tuple(qs))["s"]
    expanded = np.repeat(
        counts["n_tok"].to_numpy(np.int64), counts["n"].to_numpy(np.int64)
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"x": expanded}))
    for q, mine in zip(qs, th):
        want = con.sql(f"SELECT quantile_disc(x, {q!r}) FROM t").fetchone()[0]
        assert mine == want, (q, mine, want, expanded.tolist())


def test_null_groups_and_ties(tmp_path, ray_session):
    # source 'a': 200 rows of n_tok=7 plus single 1 and 999 tails — ties put
    # both quantiles on 7, so exactly the two tails flag. source NULL is its
    # own group; NULL n_tok rows never flag even at extreme ids.
    n_a = 200
    rows = (
        [("a%04d" % i, "a", 7) for i in range(n_a)]
        + [("alow", "a", 1), ("ahigh", "a", 999)]
        + [("n%02d" % i, None, 50) for i in range(40)]
        + [("nlow", None, 2), ("nnull", None, None), ("anull", "a", None)]
    )
    t = pa.table(
        {
            "doc_id": [r[0] for r in rows],
            "tokens": pa.array([[1, 2]] * len(rows), type=pa.list_(pa.int32())),
            "n_tok": pa.array([r[2] for r in rows], type=pa.int32()),
            "source": [r[1] for r in rows],
        }
    )
    d = tmp_path / "corpus"
    d.mkdir()
    pq.write_table(t, d / "frag-000.parquet")
    out = seq_length_outliers(str(d)).to_pandas()
    got = {(r.doc_id, r.side, r.lo, r.hi) for r in out.itertuples()}
    # 'a' group: 202 values sorted [1, 7×200, 999]; rank_lo=ceil(.005*202)=2 → 7,
    # rank_hi=ceil(.995*202)=201 → 7 — so band is [7,7] and both tails flag.
    # NULL group: 41 values [2, 50×40]; rank_lo=1 → 2 → nothing below, and
    # rank_hi=41 → 50 → nothing above: no NULL-source rows flag.
    assert got == {("alow", "low", 7, 7), ("ahigh", "high", 7, 7)}


def test_all_null_ntok_source_never_flags(tmp_path, ray_session):
    t = pa.table(
        {
            "doc_id": ["x1", "x2", "y1", "y2"],
            "tokens": pa.array([[1]] * 4, type=pa.list_(pa.int32())),
            "n_tok": pa.array([None, None, 5, 6], type=pa.int32()),
            "source": ["deadsrc", "deadsrc", "live", "live"],
        }
    )
    d = tmp_path / "corpus"
    d.mkdir()
    pq.write_table(t, d / "frag-000.parquet")
    out = seq_length_outliers(str(d)).to_pandas()
    assert len(out) == 0


def test_default_band_is_the_documented_tails():
    assert (OUTLIER_Q_LO, OUTLIER_Q_HI) == (0.005, 0.995)

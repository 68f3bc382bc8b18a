"""Hypothesis differential tests: the three table validators vs their DuckDB
oracles on ARBITRARY generated tables (unicode text, null/empty payloads,
out-of-range timestamps, non-finite embedding elements, empty tables).

The planted tests pin each flag once; these pin engine↔oracle parity under
adversarial composition — the same differential-oracle strategy as the row
kernels (test_property_checks) lifted to the per-table verdict queries."""

import datetime as dt

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

pytestmark = pytest.mark.usefixtures("ray_session")


def _cmp(mine: pa.Table, con, sql: str):
    oracle = con.sql(sql).df()
    got = mine.to_pandas()
    assert list(got.columns) == list(oracle.columns)
    assert got.astype(str).values.tolist() == oracle.astype(str).values.tolist()


# --- documents ---------------------------------------------------------------

_doc_row = st.tuples(
    st.one_of(st.none(), st.integers(min_value=0, max_value=9)),
    st.one_of(st.none(), st.text(max_size=6)),
    st.one_of(st.none(), st.sampled_from(["en", "de", "zh", "xx", "EN", ""])),
    st.one_of(st.none(), st.integers(min_value=-2, max_value=7)),
)


@settings(max_examples=25, deadline=None)
@given(st.lists(_doc_row, min_size=0, max_size=12))
def test_documents_validate_matches_oracle(tmp_path_factory, rows):
    from product_quality_check_ray.pipelines.text import documents_validate

    import __ray_entry__ as e

    d = tmp_path_factory.mktemp("docval")
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows], type=pa.string()),
            "lang": pa.array([r[2] for r in rows], type=pa.string()),
            "n_chars": pa.array([r[3] for r in rows], type=pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    _cmp(documents_validate(str(d)), con, e.oracle_sql()["documents_validate"])


# --- events ------------------------------------------------------------------

_ts = st.one_of(
    st.none(),
    st.datetimes(min_value=dt.datetime(1970, 1, 2), max_value=dt.datetime(2149, 12, 31)),
)
_event_row = st.tuples(
    st.one_of(st.none(), st.integers(min_value=0, max_value=9)),
    _ts,
    st.one_of(st.none(), st.integers(min_value=0, max_value=9)),
    st.one_of(st.none(), st.sampled_from(["click", "view", ""])),
    st.one_of(
        st.none(),
        st.floats(allow_nan=False, allow_infinity=True, width=64),
    ),
    st.one_of(st.none(), st.sampled_from(['{"k":1}', "{}", "x", "{", "{\n}", ""])),
)


@settings(max_examples=25, deadline=None)
@given(st.lists(_event_row, min_size=0, max_size=12))
def test_events_validate_matches_oracle(tmp_path_factory, rows):
    from product_quality_check_ray.pipelines.relational import events_validate

    import __ray_entry__ as e

    d = tmp_path_factory.mktemp("evval")
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[3] for r in rows], type=pa.string()),
            "value": pa.array([r[4] for r in rows], type=pa.float64()),
            "props": pa.array([r[5] for r in rows], type=pa.string()),
        }
    )
    pq.write_table(t, str(d / "events.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    _cmp(events_validate(str(d)), con, e.oracle_sql()["events_validate"])


# --- embeddings ----------------------------------------------------------------

_vec = st.one_of(
    st.none(),
    st.lists(
        st.one_of(
            st.none(),
            st.floats(
                allow_nan=True, allow_infinity=True, width=32, min_value=None
            ),
        ),
        min_size=0,
        max_size=3,
    ),
    # correct-dimension vectors (64) with a controllable all-zero case
    st.builds(lambda z: [0.0] * 64 if z else [0.5] * 64, st.booleans()),
)
_emb_row = st.tuples(
    st.one_of(st.none(), st.integers(min_value=0, max_value=9)),
    _vec,
    st.one_of(st.none(), st.integers(min_value=-1, max_value=3)),
)


@settings(max_examples=25, deadline=None)
@given(st.lists(_emb_row, min_size=0, max_size=10))
def test_embedding_validate_matches_oracle(tmp_path_factory, rows):
    from product_quality_check_ray.pipelines.similarity import embedding_validate

    import __ray_entry__ as e

    d = tmp_path_factory.mktemp("embval")
    t = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "embedding": pa.array([r[1] for r in rows], type=pa.list_(pa.float32())),
            "label": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )
    pq.write_table(t, str(d / "embeddings.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{d}/embeddings.parquet')"
    )
    _cmp(embedding_validate(str(d)), con, e.oracle_sql()["embedding_validate"])


# --- documents lang drift ------------------------------------------------------

_drift_row = st.tuples(
    st.one_of(st.none(), st.sampled_from(["en", "de", "zh", "", "EN"])),
    st.one_of(st.none(), st.integers(min_value=-5, max_value=300)),
)


@settings(max_examples=25, deadline=None)
@given(st.lists(_drift_row, min_size=0, max_size=16))
def test_documents_lang_drift_matches_oracle(tmp_path_factory, rows):
    """Engine↔oracle parity of the per-lang complement-KS on arbitrary
    tables: null langs, null/negative n_chars (bin -1), single-lang corpora
    (maximal drift), multi-bin spreads, empty tables."""
    from product_quality_check_ray.pipelines.text import documents_lang_drift

    import __ray_entry__ as e

    d = tmp_path_factory.mktemp("docdrift")
    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(rows))), type=pa.int64()),
            "text": pa.array(["x"] * len(rows), type=pa.string()),
            "lang": pa.array([r[0] for r in rows], type=pa.string()),
            "source": pa.array(["web"] * len(rows), type=pa.string()),
            "n_chars": pa.array([r[1] for r in rows], type=pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    _cmp(documents_lang_drift(str(d)), con, e.oracle_sql()["documents_lang_drift"])


# --- events type drift ---------------------------------------------------------

_ev_drift_row = st.tuples(
    st.one_of(st.none(), st.sampled_from(["click", "view", "error", ""])),
    st.one_of(
        st.none(),
        st.datetimes(
            min_value=dt.datetime(2024, 1, 1), max_value=dt.datetime(2024, 3, 1)
        ),
        # pre-1970: negative epoch_us folds to bin -1 on both engines
        st.datetimes(
            min_value=dt.datetime(1960, 1, 1), max_value=dt.datetime(1969, 12, 31)
        ),
    ),
)


@settings(max_examples=25, deadline=None)
@given(st.lists(_ev_drift_row, min_size=0, max_size=16))
def test_events_type_drift_matches_oracle(tmp_path_factory, rows):
    """Engine↔oracle parity of the per-type temporal complement-KS on
    arbitrary tables: null types ('~null~'), null timestamps (bin -1),
    single-type streams (maximal drift), multi-bucket spreads, empties."""
    from product_quality_check_ray.pipelines.relational import events_type_drift

    import __ray_entry__ as e

    d = tmp_path_factory.mktemp("evdrift")
    t = pa.table(
        {
            "event_id": pa.array(list(range(len(rows))), type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "user_id": pa.array([1] * len(rows), type=pa.int64()),
            "event_type": pa.array([r[0] for r in rows], type=pa.string()),
            "value": pa.array([1.0] * len(rows), type=pa.float64()),
            "props": pa.array(["{}"] * len(rows), type=pa.string()),
        }
    )
    pq.write_table(t, str(d / "events.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    _cmp(events_type_drift(str(d)), con, e.oracle_sql()["events_type_drift"])

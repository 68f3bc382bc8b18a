"""Unit tests for the fused vectorized row checks (SURVEY.md §5 plan #1)."""

import numpy as np
import pyarrow as pa
import pytest

from product_quality_check_ray.checks.row_checks import (
    ROW_CHECK_NAMES,
    annotate_batch,
    checks_failed_list_array,
    conform_schema,
    row_check_matrix,
)
from product_quality_check_ray.core.schema import SEQUENCE_SCHEMA, VOCAB
from product_quality_check_ray.sources.dimensions import build_check_ctx

CTX = build_check_ctx()


def tbl(rows):
    return pa.Table.from_pylist(rows, schema=SEQUENCE_SCHEMA)


def checks_for(rows):
    mat = row_check_matrix(tbl(rows), CTX)
    return [
        {ROW_CHECK_NAMES[j] for j in range(mat.shape[1]) if mat[i, j]}
        for i in range(mat.shape[0])
    ]


def test_clean_row_passes():
    [c] = checks_for(
        [{"doc_id": "web-1", "tokens": [1, 2, 3], "n_tok": 3, "source": "web"}]
    )
    assert c == set()


def test_null_doc_id():
    [c] = checks_for([{"doc_id": None, "tokens": [1], "n_tok": 1, "source": "web"}])
    assert c == {"null_doc_id"}


def test_null_tokens():
    [c] = checks_for([{"doc_id": "a", "tokens": None, "n_tok": 1, "source": "web"}])
    assert c == {"null_tokens"}


def test_ntok_mismatch_and_empty():
    cs = checks_for(
        [
            {"doc_id": "a", "tokens": [1, 2], "n_tok": 3, "source": "web"},
            {"doc_id": "b", "tokens": [], "n_tok": 4, "source": "web"},
            {"doc_id": "c", "tokens": [1, 2], "n_tok": None, "source": "web"},
        ]
    )
    assert cs[0] == {"ntok_mismatch"}
    assert cs[1] == {"ntok_mismatch"}
    assert cs[2] == {"ntok_mismatch", "ntok_range"}


def test_token_domain():
    cs = checks_for(
        [
            {"doc_id": "a", "tokens": [0, VOCAB - 1, 5], "n_tok": 3, "source": "web"},
            {"doc_id": "b", "tokens": [1, VOCAB, 2], "n_tok": 3, "source": "web"},
            {"doc_id": "c", "tokens": [-1, 2, 3], "n_tok": 3, "source": "web"},
        ]
    )
    assert cs[0] == set()
    assert cs[1] == {"token_oov"}
    assert cs[2] == {"token_neg"}


def test_bad_source_and_range():
    cs = checks_for(
        [
            {"doc_id": "a", "tokens": [1], "n_tok": 1, "source": "spam-1"},
            {"doc_id": "b", "tokens": [1], "n_tok": 0, "source": "web"},
            {"doc_id": "c", "tokens": list(range(3000)), "n_tok": 3000, "source": "web"},
            {"doc_id": "d", "tokens": [1], "n_tok": 1, "source": None},
        ]
    )
    assert cs[0] == {"bad_source"}
    assert cs[1] == {"ntok_range", "ntok_mismatch"}
    assert cs[2] == {"ntok_range"}
    assert cs[3] == {"bad_source"}


def test_conform_schema_missing_column():
    t = pa.table({"doc_id": ["a"]})
    with pytest.raises(ValueError, match="missing required columns"):
        conform_schema(t)


def test_conform_schema_casts_types():
    t = pa.table(
        {
            "doc_id": pa.array(["a"], type=pa.large_string()),
            "tokens": pa.array([[1, 2]], type=pa.list_(pa.int64())),
            "n_tok": pa.array([2], type=pa.int64()),
            "source": pa.array(["web"]),
        }
    )
    out = conform_schema(t)
    assert out.schema == SEQUENCE_SCHEMA


def test_checks_failed_list_array_layout():
    mat = np.array([[True, False, True], [False, False, False]])
    # build with a 3-check view: uses global names for first 3
    arr = checks_failed_list_array(
        np.pad(mat, ((0, 0), (0, len(ROW_CHECK_NAMES) - 3)), constant_values=False)
    )
    assert arr.to_pylist() == [[ROW_CHECK_NAMES[0], ROW_CHECK_NAMES[2]], []]


def test_annotate_preserves_input_columns(small_corpus_table):
    t = small_corpus_table.slice(0, 500)
    annotated, _ = annotate_batch(t, CTX)
    for col in SEQUENCE_SCHEMA.names:
        assert annotated.column(col).to_pylist() == t.column(col).to_pylist()


def test_sliced_list_min_max():
    # regression: reduceat over a sliced ListArray must not read past the
    # logical end of the slice
    t = tbl(
        [
            {"doc_id": "a", "tokens": [5, 6], "n_tok": 2, "source": "web"},
            {"doc_id": "b", "tokens": [VOCAB + 7], "n_tok": 1, "source": "web"},
            {"doc_id": "c", "tokens": [1], "n_tok": 1, "source": "web"},
        ]
    )
    sl = t.slice(0, 2)
    mat = row_check_matrix(sl, CTX)
    assert not mat[0, ROW_CHECK_NAMES.index("token_oov")]
    assert mat[1, ROW_CHECK_NAMES.index("token_oov")]


def test_conform_schema_repair_mode_dedupes_duplicate_columns():
    import numpy as np
    import pyarrow as pa
    import pytest

    from product_quality_check_ray.checks.row_checks import (
        conform_schema,
        dedupe_column_names,
    )

    # duplicate 'source' column + an extra junk column (reference D2 analog)
    t = pa.table(
        {
            "doc_id": pa.array(["a"]),
            "tokens": pa.array([[1, 2]], type=pa.list_(pa.int32())),
            "n_tok": pa.array([2], type=pa.int32()),
        }
    )
    t = t.append_column("source", pa.array(["web"]))
    t = t.append_column("source", pa.array(["IGNORED"]))
    deduped = dedupe_column_names(t)
    assert deduped.column_names == ["doc_id", "tokens", "n_tok", "source", "source.1"]

    # suffix collision with a pre-existing column: ['a','a','a.1'] must stay
    # unique (second-review regression)
    tri = pa.table({"x": pa.array([1])})
    tri = tri.append_column("a", pa.array([1]))
    tri = tri.append_column("a", pa.array([2]))
    tri = tri.append_column("a.1", pa.array([3]))
    names = dedupe_column_names(tri).column_names
    assert len(set(names)) == len(names) == 4

    # strict mode fails on the ambiguous select; repair mode takes the first
    with pytest.raises(Exception):
        conform_schema(t)
    out = conform_schema(t, repair=True)
    assert out.column_names == ["doc_id", "tokens", "n_tok", "source"]
    assert out.column("source").to_pylist() == ["web"]


def test_annotate_batch_schema_repair(ray_session):
    """Repair mode through the check context: a batch with duplicate column
    names (e.g. from a CSV/custom source — Ray's parquet reader rejects them
    upstream) validates instead of raising."""
    import pyarrow as pa
    import pytest

    from product_quality_check_ray.checks.row_checks import annotate_batch
    from product_quality_check_ray.sources.dimensions import build_check_ctx

    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(50)]),
            "tokens": pa.array([[1, 2, 3]] * 50, type=pa.list_(pa.int32())),
            "n_tok": pa.array([3] * 50, type=pa.int32()),
        }
    )
    t = t.append_column("source", pa.array(["web"] * 50))
    t = t.append_column("source", pa.array(["junk"] * 50))  # duplicate name

    with pytest.raises(Exception):
        annotate_batch(t, build_check_ctx())
    out, mat = annotate_batch(t, build_check_ctx(schema_repair=True))
    assert out.num_rows == 50
    assert not mat.any()  # the FIRST 'source' column (valid) is kept


def test_lazy_matrix_equals_masked_full_matrix():
    """enabled_checks now SKIPS kernels instead of masking their output —
    the matrix must still equal the full matrix with disabled columns
    zeroed, for every single-check set and a few mixed subsets."""
    import itertools

    rows = [
        {"doc_id": "web-1", "tokens": [1, 2, 3], "n_tok": 3, "source": "web"},
        {"doc_id": None, "tokens": [1], "n_tok": 1, "source": "web"},
        {"doc_id": "x-2", "tokens": None, "n_tok": 0, "source": "web"},
        {"doc_id": "x-3", "tokens": [1, 2], "n_tok": 5, "source": "web"},
        {"doc_id": "x-4", "tokens": [VOCAB + 1], "n_tok": 1, "source": "web"},
        {"doc_id": "x-5", "tokens": [-3], "n_tok": 1, "source": "web"},
        {"doc_id": "x-6", "tokens": [1], "n_tok": 1, "source": "spam"},
        {"doc_id": "x-7", "tokens": [1] * 10, "n_tok": 10, "source": "web"},
        {"doc_id": "x-8", "tokens": [1], "n_tok": 9999, "source": "web"},
        {"doc_id": "x-9", "tokens": [], "n_tok": 0, "source": "books"},
        {"doc_id": "x-10", "tokens": [1, None, 2], "n_tok": 3, "source": "wiki"},
    ]
    t = tbl(rows)
    full = row_check_matrix(t, CTX)
    subsets = [frozenset([n]) for n in ROW_CHECK_NAMES]
    subsets += [frozenset(), frozenset(ROW_CHECK_NAMES)]
    subsets += [frozenset(c) for c in itertools.combinations(ROW_CHECK_NAMES, 3)]
    for en in subsets:
        ctx = dict(CTX)
        ctx["enabled_checks"] = en
        got = row_check_matrix(t, ctx)
        mask = np.array([n in en for n in ROW_CHECK_NAMES])
        assert (got == (full & mask[None, :])).all(), sorted(en)

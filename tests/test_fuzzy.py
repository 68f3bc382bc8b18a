"""Differential tests for core.fuzzy (RapidFuzz token_set_ratio semantics)
against a ~30-line pure-Python reference implementation (VERDICT r1 item 7)."""

from __future__ import annotations

import random

import numpy as np
import pytest

from product_quality_check_ray.core.fuzzy import (
    _lcs_dp,
    ratio_batch,
    token_set_ratio_batch,
    token_set_ratio_matrix,
)


def _ref_ratio(a: str, b: str) -> float:
    if not a and not b:
        return 100.0
    return 200.0 * _lcs_dp(a, b) / max(len(a) + len(b), 1)


def _ref_token_set_ratio(a: str, b: str) -> float:
    ta, tb = set(a.split()), set(b.split())
    if (not ta) != (not tb):
        return 0.0
    inter = sorted(ta & tb)
    d1 = sorted(ta - tb)
    d2 = sorted(tb - ta)
    t0 = " ".join(inter)
    t1 = " ".join(inter + d1)
    t2 = " ".join(inter + d2)
    return max(_ref_ratio(t0, t1), _ref_ratio(t0, t2), _ref_ratio(t1, t2))


def test_ratio_matches_dp_on_random_pairs():
    rng = random.Random(1234)
    a = ["".join(rng.choices("abcdef ", k=rng.randint(0, 40))) for _ in range(300)]
    b = ["".join(rng.choices("abcdef ", k=rng.randint(0, 40))) for _ in range(300)]
    got = ratio_batch(a, b)
    for x, y, g in zip(a, b, got):
        assert abs(g - _ref_ratio(x, y)) < 1e-9


def test_ratio_long_string_fallback():
    a = ["x" * 200 + "abc"]
    b = ["y" * 100 + "abc" + "z" * 80]
    got = ratio_batch(a, b)
    assert abs(got[0] - _ref_ratio(a[0], b[0])) < 1e-9


def test_token_set_ratio_known_values():
    assert token_set_ratio_batch(["fuzzy wuzzy was a bear"], ["wuzzy fuzzy bear a was"])[0] == 100.0
    # subset rule: one side contained in the other scores 100
    assert token_set_ratio_batch(["the quick brown fox"], ["quick fox"])[0] == 100.0
    assert token_set_ratio_batch([""], ["something"])[0] == 0.0
    assert token_set_ratio_batch([""], [""])[0] == 100.0


def test_token_set_ratio_matches_reference_on_corpus(ray_session):
    """Differential over real corpus words × the term dictionary."""
    import pyarrow.parquet as pq

    from product_quality_check_ray.pipelines.textnorm import TERM_DICT

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet", columns=["text"])
    words = sorted(
        {w for t in docs.column("text").to_pylist()[:100] for w in (t or "").lower().split()}
    )[:150]
    variants = [v for d in TERM_DICT for v in d["variants"]]
    mat = token_set_ratio_matrix(words, variants)
    rng = random.Random(7)
    checks = [(rng.randrange(len(words)), rng.randrange(len(variants))) for _ in range(400)]
    for i, j in checks:
        assert abs(mat[i, j] - _ref_token_set_ratio(words[i], variants[j])) < 1e-9


def test_dict_match_tsr_stage(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from product_quality_check_ray.pipelines.textnorm import doc_dict_matches_tsr

    d = tmp_path / "tsrfix"
    d.mkdir()
    docs = pa.table(
        {
            "doc_id": pa.array([1], type=pa.int64()),
            "text": pa.array(["sort sorter nonsense"]),
            "lang": pa.array(["en"]),
            "source": pa.array(["s"]),
            "n_chars": pa.array([20], type=pa.int64()),
        }
    )
    pq.write_table(docs, str(d / "documents.parquet"))
    out = doc_dict_matches_tsr(str(d)).to_pandas()
    exact = out[(out["word"] == "sort") & (out["match_kind"] == "exact")]
    assert len(exact) > 0  # "sort" is a TERM_DICT variant of "sorting"
    # token_set degenerates to InDel ratio on single tokens:
    # sorter↔sort = 2·4/(6+4) = 0.8 ≥ threshold → fuzzy hit
    fuzz = out[(out["word"] == "sorter") & (out["match_kind"] == "fuzzy")]
    assert len(fuzz) == 1 and abs(fuzz["score"].iloc[0] - 0.8) < 1e-9
    assert "nonsense" not in set(out["word"])
    assert (out["score"] <= 1.0).all() and (out["score"] > 0).all()

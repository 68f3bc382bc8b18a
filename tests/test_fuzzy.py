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


def test_dict_match_lang_selects_language_column(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from product_quality_check_ray.pipelines.textnorm import doc_dict_matches_lang

    d = tmp_path / "langfix"
    d.mkdir()
    # "orden" is an es-only variant of "sorting"; "tri" fr-only; "strom"
    # de-only. Unknown language ("pt") and null lang must fall back to en.
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
            "text": pa.array(
                ["orden scan", "tri orden", "strom", "orden sort", "orden sort"]
            ),
            "lang": pa.array(["es", "fr", "de", "pt", None]),
            "source": pa.array(["s"] * 5),
            "n_chars": pa.array([10] * 5, type=pa.int64()),
        }
    )
    pq.write_table(docs, str(d / "documents.parquet"))
    out = doc_dict_matches_lang(str(d)).to_pandas()
    hits = {(r.doc_id, r.word, r.canonical) for r in out.itertuples()}
    assert (1, "orden", "sorting") in hits  # es row uses the es column
    assert (1, "scan", "scanning") in hits
    assert (2, "tri", "sorting") in hits  # fr row uses the fr column
    # "orden" is NOT an fr variant, and no fr variant is within fuzzy
    # threshold 0.8 of it → the fr row must not match it
    assert not any(t[0] == 2 and t[1] == "orden" for t in hits)
    assert (3, "strom", "streaming") in hits  # de row uses the de column
    # unknown + null languages fall back to en: "sort" is an exact en hit;
    # "orden" only reaches "sorting" fuzzily via the en variant "order"
    # (char-jaccard 4/5 = 0.8) — never exactly via the es variant
    kinds = {
        (r.doc_id, r.word, r.matched_variant): r.match_kind for r in out.itertuples()
    }
    for doc in (4, 5):
        assert (doc, "sort", "sorting") in hits
        assert kinds.get((doc, "orden", "order")) == "fuzzy"
        assert (doc, "orden", "orden") not in kinds
    assert set(out["lang"]) == {"es", "fr", "de", "en"}


def _ref_partial_ratio(a: str, b: str) -> float:
    """Naive DP reference: best full-window InDel ratio of the shorter
    string inside the longer (independent of core.fuzzy internals)."""
    s, l = (a, b) if len(a) <= len(b) else (b, a)
    m = len(s)
    if m == 0:
        return 100.0 if len(l) == 0 else 0.0

    def lcs(x, y):
        prev = [0] * (len(y) + 1)
        for cx in x:
            cur = [0]
            for j, cy in enumerate(y, 1):
                cur.append(prev[j - 1] + 1 if cx == cy else max(prev[j], cur[-1]))
            prev = cur
        return prev[-1]

    best = max(lcs(s, l[i : i + m]) for i in range(len(l) - m + 1))
    return 200.0 * best / (2 * m)


def test_partial_ratio_batch_matches_naive_dp():
    import numpy as np

    from product_quality_check_ray.core.fuzzy import partial_ratio_batch

    rng = np.random.default_rng(17)
    alpha = "abcdef"
    pairs = []
    for _ in range(400):
        a = "".join(rng.choice(list(alpha), size=int(rng.integers(0, 14))))
        b = "".join(rng.choice(list(alpha), size=int(rng.integers(0, 14))))
        pairs.append((a, b))
    # edge cases: empties, identical, substring containment, long (DP path)
    pairs += [
        ("", ""),
        ("", "abc"),
        ("abc", ""),
        ("abc", "abc"),
        ("abc", "xxabcxx"),
        ("a" * 80, "a" * 100),
        ("ab" * 40, "ba" * 50),
    ]
    got = partial_ratio_batch([p[0] for p in pairs], [p[1] for p in pairs])
    exp = np.array([_ref_partial_ratio(a, b) for a, b in pairs])
    assert np.allclose(got, exp), (got - exp)


def test_dict_match_partial_stage(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from product_quality_check_ray.pipelines.textnorm import doc_dict_matches_partial

    d = tmp_path / "partialfix"
    d.mkdir()
    docs = pa.table(
        {
            "doc_id": pa.array([1], type=pa.int64()),
            "text": pa.array(["sort sortedness nonsense"]),
            "lang": pa.array(["en"]),
            "source": pa.array(["s"]),
            "n_chars": pa.array([25], type=pa.int64()),
        }
    )
    pq.write_table(docs, str(d / "documents.parquet"))
    out = doc_dict_matches_partial(str(d)).to_pandas()
    exact = out[(out["word"] == "sort") & (out["match_kind"] == "exact")]
    assert len(exact) > 0
    # "sort" is a full window of "sortedness" → partial_ratio 1.0, kind fuzzy
    fuzz = out[(out["word"] == "sortedness") & (out["matched_variant"] == "sort")]
    assert len(fuzz) == 1 and fuzz["score"].iloc[0] == 1.0
    assert fuzz["match_kind"].iloc[0] == "fuzzy"

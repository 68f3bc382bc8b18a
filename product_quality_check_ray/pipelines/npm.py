"""Multi-pass orchestrated scoring pipeline (reference HFSS 4-pass flow).

The reference's flagship composed flow is the HFSS checker
(``app.py:1122-1169``): four DEPENDENT passes per row — parse nutrients →
NPM scoring → HFSS classification (which re-reads pass-1's ``is_drink``) →
audit over all passes — run sequentially through an LLM per row. Here the
same orchestration shape is a single lazy Dataset plan of four chained
``map_batches`` stages, each vectorized, with the published UK FSA/Ofcom
Nutrient Profiling Model (2004/05, public) as the deterministic scoring
core:

- A-points: energy, saturated fat, total sugars, sodium — count of
  thresholds strictly exceeded (0–10 each).
- C-points: fruit/veg/nuts % (1/2/5), fibre (0–5), protein (0–5).
- Protein-cap rule: if A ≥ 11 and fruit points < 5, protein points do not
  count. Score = A − C; HFSS "fail" at score ≥ 4 for food, ≥ 1 for drink.

Nutrient analogs are derived deterministically from the sequences corpus
(no external data): element k of the token list modulo a per-nutrient
range, ``is_drink`` ⇔ source == 'web'. Missing/short/null token lists are
zero-imputed and flagged by the audit pass (``audit_flag='imputed'``), so
the audit output is non-vacuous on the corrupted corpus.

Every stage is exactly SQL-expressible; the oracle is generated from the
SAME threshold tables (``npm_oracle_sql``) so engine and oracle cannot
drift.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

# UK FSA NPM point thresholds (public model; points = count of thresholds
# strictly exceeded)
ENERGY_KJ = (335, 670, 1005, 1340, 1675, 2010, 2345, 2680, 3015, 3350)
SATFAT_G = (1, 2, 3, 4, 5, 6, 7, 8, 9, 10)
SUGARS_G = (4.5, 9, 13.5, 18, 22.5, 27, 31, 36, 40, 45)
SODIUM_MG = (90, 180, 270, 360, 450, 540, 630, 720, 810, 900)
FRUIT_PCT = (40, 60, 80)  # 1 / 2 / 5 points
FIBRE_G = (0.9, 1.9, 2.8, 3.7, 4.7)
PROTEIN_G = (1.6, 3.2, 4.8, 6.4, 8.0)

# (analog nutrient, token element index, modulo range)
_NUTRIENT_DERIVATION = (
    ("sat_fat_g", 0, 20),
    ("sugars_g", 1, 50),
    ("sodium_mg", 2, 1000),
    ("fruit_pct", 3, 101),
    ("fibre_g", 4, 10),
    ("protein_g", 5, 15),
)


def _points(x: np.ndarray, thresholds) -> np.ndarray:
    """Count of thresholds strictly exceeded, vectorized."""
    return np.searchsorted(np.asarray(thresholds, dtype=np.float64), x, side="left").astype(
        np.int64
    )


def _fruit_points(x: np.ndarray) -> np.ndarray:
    return np.where(x > 80, 5, np.where(x > 60, 2, np.where(x > 40, 1, 0))).astype(np.int64)


def _parse_stage(t: pa.Table) -> pa.Table:
    """Pass 1: nutrient analogs + is_drink + imputation flag."""
    tokens = t.column("tokens").combine_chunks()
    n = t.num_rows
    lens = pc.fill_null(pc.list_value_length(tokens), 0).to_numpy(zero_copy_only=False)
    cols: dict[str, pa.Array] = {"doc_id": t.column("doc_id")}
    n_tok = pc.fill_null(t.column("n_tok"), 0).to_numpy(zero_copy_only=False).astype(np.int64)
    cols["energy_kj"] = pa.array(n_tok * 10)
    imputed = np.zeros(n, dtype=bool)
    imputed |= lens < len(_NUTRIENT_DERIVATION)
    # flat values / offsets / element-null mask computed ONCE per batch and
    # indexed per nutrient (the per-nutrient fallback re-derivation was the
    # stage's dominant cost on corrupted batches)
    if n and len(tokens.values):
        flat = np.asarray(tokens.values.to_numpy(zero_copy_only=False))
        null_mask = (
            ~np.asarray(pc.is_valid(tokens.values).to_numpy(zero_copy_only=False))
            if tokens.values.null_count
            else None
        )
        offs = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        flat = np.zeros(0, dtype=np.int64)
        null_mask = None
        offs = np.zeros(n + 1, dtype=np.int64)
    for name, idx, mod in _NUTRIENT_DERIVATION:
        vals = np.zeros(n, dtype=np.int64)
        ok = lens > idx
        if ok.any():
            pos = offs[:-1][ok] + idx
            el = flat[pos]
            if null_mask is not None:
                el_null = null_mask[pos]
                vals[ok] = np.where(el_null, 0, el)
                imputed[np.flatnonzero(ok)[el_null]] = True
            else:
                vals[ok] = el
        cols[name] = pa.array(np.abs(vals) % mod)
    cols["is_drink"] = pa.array(
        pc.equal(pc.fill_null(t.column("source"), ""), "web").to_numpy(zero_copy_only=False)
    )
    cols["imputed"] = pa.array(imputed)
    return pa.table(cols)


def _score_stage(t: pa.Table) -> pa.Table:
    """Pass 2: NPM points per nutrient."""
    g = lambda c: t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)  # noqa: E731
    out = dict(zip(t.column_names, t.columns))
    out["p_energy"] = pa.array(_points(g("energy_kj"), ENERGY_KJ))
    out["p_satfat"] = pa.array(_points(g("sat_fat_g"), SATFAT_G))
    out["p_sugars"] = pa.array(_points(g("sugars_g"), SUGARS_G))
    out["p_sodium"] = pa.array(_points(g("sodium_mg"), SODIUM_MG))
    out["p_fruit"] = pa.array(_fruit_points(g("fruit_pct")))
    out["p_fibre"] = pa.array(_points(g("fibre_g"), FIBRE_G))
    out["p_protein"] = pa.array(_points(g("protein_g"), PROTEIN_G))
    return pa.table(out)


def _classify_stage(t: pa.Table) -> pa.Table:
    """Pass 3: A/C totals, protein-cap rule, HFSS verdict (uses pass-1
    ``is_drink`` exactly as the reference feeds pass-1 output into pass 3)."""
    g = lambda c: t.column(c).to_numpy(zero_copy_only=False)  # noqa: E731
    a = (g("p_energy") + g("p_satfat") + g("p_sugars") + g("p_sodium")).astype(np.int64)
    fruit = g("p_fruit")
    protein_eff = np.where((a >= 11) & (fruit < 5), 0, g("p_protein")).astype(np.int64)
    c = (fruit + g("p_fibre") + protein_eff).astype(np.int64)
    score = a - c
    is_drink = g("is_drink")
    fail = np.where(is_drink, score >= 1, score >= 4)
    out = dict(zip(t.column_names, t.columns))
    out["a_points"] = pa.array(a)
    out["c_points"] = pa.array(c)
    out["npm_score"] = pa.array(score)
    out["hfss_class"] = pa.array(np.where(fail, "fail", "pass"), type=pa.string())
    return pa.table(out)


def _audit_stage(t: pa.Table) -> pa.Table:
    """Pass 4: audit over all prior passes — range checks + total recompute
    (the reference's pass-4 'review all passes' analog) + imputation flag."""
    g = lambda c: t.column(c).to_numpy(zero_copy_only=False)  # noqa: E731
    in_range = (
        (g("p_energy") <= 10)
        & (g("p_satfat") <= 10)
        & (g("p_sugars") <= 10)
        & (g("p_sodium") <= 10)
        & (g("p_fruit") <= 5)
        & (g("p_fibre") <= 5)
        & (g("p_protein") <= 5)
    )
    recomputed = g("a_points") - g("c_points") == g("npm_score")
    flag = np.where(
        ~(in_range & recomputed), "mismatch", np.where(g("imputed"), "imputed", "ok")
    )
    out = dict(zip(t.column_names, t.columns))
    out["audit_flag"] = pa.array(flag, type=pa.string())
    return pa.table(out)


_FINAL_COLS = [
    "doc_id", "is_drink", "energy_kj", "sat_fat_g", "sugars_g", "sodium_mg",
    "fruit_pct", "fibre_g", "protein_g", "a_points", "c_points", "npm_score",
    "hfss_class", "audit_flag",
]


def seq_npm_scores(seq_dir_or_ds) -> rd.Dataset:
    """The composed 4-pass plan: parse → score → classify → audit, one lazy
    Dataset pipeline (stages fuse; no shuffle — this is a pure map chain)."""
    if isinstance(seq_dir_or_ds, rd.Dataset):
        ds = seq_dir_or_ds
    else:
        # an sf testdata dir — read the engine's deterministic sequences
        # corpus (generated idempotently), projected to the needed columns
        from .seq_queries import _seq_ds

        ds = _seq_ds(seq_dir_or_ds, columns=["doc_id", "tokens", "n_tok", "source"])
    return (
        ds.map_batches(_parse_stage, batch_format="pyarrow")
        .map_batches(_score_stage, batch_format="pyarrow")
        .map_batches(_classify_stage, batch_format="pyarrow")
        .map_batches(_audit_stage, batch_format="pyarrow")
        .select_columns(_FINAL_COLS)
    )


def _sum_indicators(col: str, thresholds) -> str:
    return " + ".join(f"(CASE WHEN {col} > {t} THEN 1 ELSE 0 END)" for t in thresholds)


def npm_oracle_sql(seq_glob: str) -> str:
    """DuckDB oracle generated from the SAME threshold tables (no drift)."""
    nutr_exprs = []
    null_checks = []
    for name, idx, mod in _NUTRIENT_DERIVATION:
        nutr_exprs.append(
            f"abs(coalesce(list_extract(tokens, {idx + 1}), 0)) % {mod} AS {name}"
        )
        null_checks.append(f"list_extract(tokens, {idx + 1}) IS NULL")
    imputed = (
        f"(tokens IS NULL OR len(tokens) < {len(_NUTRIENT_DERIVATION)} OR "
        + " OR ".join(null_checks)
        + ")"
    )
    return f"""
        WITH parsed AS (
            SELECT doc_id,
                   (coalesce(source, '') = 'web') AS is_drink,
                   CAST(coalesce(n_tok, 0) AS BIGINT) * 10 AS energy_kj,
                   {", ".join(nutr_exprs)},
                   {imputed} AS imputed
            FROM read_parquet('{seq_glob}')
        ), scored AS (
            SELECT *,
                   CAST({_sum_indicators("energy_kj", ENERGY_KJ)} AS BIGINT) AS p_energy,
                   CAST({_sum_indicators("sat_fat_g", SATFAT_G)} AS BIGINT) AS p_satfat,
                   CAST({_sum_indicators("sugars_g", SUGARS_G)} AS BIGINT) AS p_sugars,
                   CAST({_sum_indicators("sodium_mg", SODIUM_MG)} AS BIGINT) AS p_sodium,
                   CAST(CASE WHEN fruit_pct > 80 THEN 5 WHEN fruit_pct > 60 THEN 2
                             WHEN fruit_pct > 40 THEN 1 ELSE 0 END AS BIGINT) AS p_fruit,
                   CAST({_sum_indicators("fibre_g", FIBRE_G)} AS BIGINT) AS p_fibre,
                   CAST({_sum_indicators("protein_g", PROTEIN_G)} AS BIGINT) AS p_protein
            FROM parsed
        ), classified AS (
            SELECT *,
                   p_energy + p_satfat + p_sugars + p_sodium AS a_points,
                   p_fruit + p_fibre + (CASE WHEN p_energy + p_satfat + p_sugars + p_sodium >= 11
                                              AND p_fruit < 5 THEN 0 ELSE p_protein END) AS c_points
            FROM scored
        )
        SELECT doc_id, is_drink, energy_kj,
               CAST(sat_fat_g AS BIGINT) AS sat_fat_g,
               CAST(sugars_g AS BIGINT) AS sugars_g,
               CAST(sodium_mg AS BIGINT) AS sodium_mg,
               CAST(fruit_pct AS BIGINT) AS fruit_pct,
               CAST(fibre_g AS BIGINT) AS fibre_g,
               CAST(protein_g AS BIGINT) AS protein_g,
               a_points, c_points,
               a_points - c_points AS npm_score,
               (CASE WHEN (CASE WHEN is_drink THEN a_points - c_points >= 1
                                ELSE a_points - c_points >= 4 END)
                     THEN 'fail' ELSE 'pass' END) AS hfss_class,
               (CASE WHEN imputed THEN 'imputed' ELSE 'ok' END) AS audit_flag
        FROM classified
    """

"""Verification suites: fold many small, individually-oracled query results
into ONE long-format table so a bounded external grading window still covers
every operator family.

Why this exists: the external correctness gate grades a bounded number of
``queries()`` entries. Each micro-query (a 6-row TPC-H-style aggregate, a
200-row lookup) is already distributed end-to-end and keeps its own
individual ``queries()``/``oracle_sql()`` entry; a *suite* re-runs a declared
set of them and melts every output cell into

    (query, metric, key, value DOUBLE, value_s VARCHAR)

rows, with a generated SQL oracle that wraps each member's existing oracle in
identical UNION ALL arms. A suite row hash-matches iff every member's cells
hash-match, so one suite entry carries the verification weight of its whole
member list.

This is a VERIFICATION HARNESS, not a production operator: members run their
normal distributed pipelines; only their (small) results are melted on the
driver. Member results are bounded (aggregates / per-key lookups — the
largest member is ~100k rows at sf0.1), so the melt itself is driver-safe.

Key/metric contract (must hold on BOTH sides, see ``_key_expr``):
- key = '|'-joined string of the declared key columns, NULL parts → '∅'.
- numeric metrics (ints, floats, bools) land in ``value`` as DOUBLE
  (ints/bools are exact in a double; floats are bit-identical because both
  sides reuse the member's already-hash-matching computation).
- string metrics land in ``value_s``; dates/timestamps are already VARCHAR
  in every member's output (engine formats, oracle strftime's).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

__all__ = ["MemberSpec", "run_suite", "suite_oracle_sql"]

_NULL_KEY = "∅"


@dataclass(frozen=True)
class MemberSpec:
    """One folded query: its name, key columns, and (column, kind) metrics.

    ``kind``: 'num' (int/float/bool → value DOUBLE) or 'str' (→ value_s).
    An empty metrics list emits one '__row__' marker row per input row so
    pure-projection members still contribute their row multiset.
    """

    name: str
    keys: tuple[str, ...]
    metrics: tuple[tuple[str, str], ...]


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data as rd

    if isinstance(res, rd.Dataset):
        res = res.to_pandas()
    if isinstance(res, pa.Table):
        res = res.to_pandas()
    return res


def _key_series(df: pd.DataFrame, keys: tuple[str, ...]) -> pd.Series:
    if not keys:
        return pd.Series([_NULL_KEY] * len(df), index=df.index, dtype=object)
    parts = []
    for k in keys:
        col = df[k]
        # bools stringify as 'true'/'false' to match SQL ::VARCHAR
        if col.dtype == bool:
            part = col.map({True: "true", False: "false"})
        else:
            part = col.map(lambda v: _NULL_KEY if pd.isna(v) else str(v))
        parts.append(part.astype(object))
    out = parts[0]
    for p in parts[1:]:
        out = out + "|" + p
    return out


def run_suite(
    sf_dir: str, specs: tuple[MemberSpec, ...], query_map: dict
) -> pd.DataFrame:
    """Run every member's normal pipeline and melt the results."""
    frames: list[pd.DataFrame] = []
    for spec in specs:
        df = _to_pandas(query_map[spec.name](sf_dir))
        key = _key_series(df, spec.keys)
        metrics = spec.metrics or ((None, "marker"),)
        for col, kind in metrics:
            part = pd.DataFrame(
                {
                    "query": spec.name,
                    "metric": col if col is not None else "__row__",
                    "key": key,
                }
            )
            if kind == "num":
                part["value"] = df[col].astype(np.float64)
                part["value_s"] = pd.Series([None] * len(df), dtype=object)
            elif kind == "str":
                part["value"] = np.float64(np.nan)
                part["value_s"] = df[col].map(
                    lambda v: None if pd.isna(v) else str(v)
                ).astype(object)
            else:  # marker
                part["value"] = np.float64(np.nan)
                part["value_s"] = pd.Series([None] * len(df), dtype=object)
            frames.append(part)
    if not frames:
        return pd.DataFrame(
            {
                "query": pd.Series(dtype=object),
                "metric": pd.Series(dtype=object),
                "key": pd.Series(dtype=object),
                "value": pd.Series(dtype=np.float64),
                "value_s": pd.Series(dtype=object),
            }
        )
    out = pd.concat(frames, ignore_index=True)
    out["value"] = out["value"].astype(np.float64)
    out["value_s"] = out["value_s"].astype(object)
    return out


def _key_expr(keys: tuple[str, ...]) -> str:
    if not keys:
        return f"'{_NULL_KEY}'"
    parts = [f"coalesce((\"{k}\")::VARCHAR, '{_NULL_KEY}')" for k in keys]
    if len(parts) == 1:
        return parts[0]
    return " || '|' || ".join(parts)


def suite_oracle_sql(specs: tuple[MemberSpec, ...], oracle_map: dict[str, str]) -> str:
    """The suite's oracle: each member's existing oracle wrapped in one
    UNION ALL arm per metric (identical melt on the SQL side)."""
    arms: list[str] = []
    for spec in specs:
        base = oracle_map[spec.name]
        key = _key_expr(spec.keys)
        metrics = spec.metrics or ((None, "marker"),)
        for col, kind in metrics:
            mname = col if col is not None else "__row__"
            if kind == "num":
                val = f'("{col}")::DOUBLE'
                vs = "NULL::VARCHAR"
            elif kind == "str":
                val = "NULL::DOUBLE"
                vs = f'("{col}")::VARCHAR'
            else:
                val = "NULL::DOUBLE"
                vs = "NULL::VARCHAR"
            arms.append(
                f"SELECT '{spec.name}' AS query, '{mname}' AS metric, "
                f"{key} AS key, {val} AS value, {vs} AS value_s "
                f"FROM ({base})"
            )
    return "\nUNION ALL\n".join(arms)

"""User-extension surface: run registry / ad-hoc checks as a pipeline.

Reference analog (SURVEY.md §2.10): the ``PROMPT_OPTIONS`` registry of named
checks plus the free-text "custom check" (``prompts/prompts.py:4``,
``app.py:1421-1448``). Here a custom check is any ``RowCheck`` — a named,
vectorized ``fn(batch, ctx) -> bool mask`` — registered via
``checks.base.register`` or passed directly; this module compiles a list of
them into one fused ``map_batches`` pass producing per-row verdicts and
violation rows, composable with the core suite.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Sum

from ..checks.base import ROW_CHECK_REGISTRY, RowCheck
from ..core.collect import collect_table
from ..sources.dimensions import build_check_ctx


class CustomCheckStage:
    """Fused evaluation of an arbitrary check list (one pass per batch)."""

    def __init__(self, checks: list[RowCheck], ctx: dict | None = None):
        self.checks = checks
        self.ctx = ctx if ctx is not None else build_check_ctx()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..checks.row_checks import (
            BUILTIN_ROW_CHECKS,
            ROW_CHECK_NAMES,
            row_check_matrix,
        )

        n = batch.num_rows
        mat = np.zeros((n, len(self.checks)), dtype=bool)
        # the built-in fused checks share ONE matrix computation per batch
        # (each registry fn alone would recompute the full 7-check kernel);
        # identity check, not name check — a user re-registering a builtin
        # NAME gets their own fn
        fused: "np.ndarray | None" = None
        for j, chk in enumerate(self.checks):
            missing = [c for c in chk.required_columns if c not in batch.column_names]
            if missing:
                raise ValueError(f"check {chk.name!r} requires columns {missing}")
            if BUILTIN_ROW_CHECKS.get(chk.name) is chk:
                if fused is None:
                    fused = row_check_matrix(batch, self.ctx)
                mat[:, j] = fused[:, ROW_CHECK_NAMES.index(chk.name)]
            else:
                mat[:, j] = np.asarray(chk.fn(batch, self.ctx), dtype=bool)
        ok = ~mat.any(axis=1)
        out = batch.append_column("ok", pa.array(ok))
        names = np.asarray([c.name for c in self.checks], dtype=object)
        counts = mat.sum(axis=1).astype(np.int64)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        flat = mat.reshape(-1)
        idx = np.tile(np.arange(len(self.checks), dtype=np.int64), n)[flat]
        failed = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), pa.array(names[idx], type=pa.string())
        )
        return out.append_column("checks_failed", failed)


def run_checks(
    ds: rd.Dataset,
    checks: "list[RowCheck | str]",
    *,
    ctx: dict | None = None,
) -> rd.Dataset:
    """Annotate a dataset with ok/checks_failed for the given checks.

    ``checks`` may mix RowCheck objects and registry names (the reference's
    dropdown-by-name selection).
    """
    resolved: list[RowCheck] = []
    for c in checks:
        if isinstance(c, str):
            if c not in ROW_CHECK_REGISTRY:
                raise KeyError(f"no registered check named {c!r}")
            resolved.append(ROW_CHECK_REGISTRY[c])
        else:
            resolved.append(c)
    return ds.map_batches(
        CustomCheckStage,
        fn_constructor_kwargs={"checks": resolved, "ctx": ctx},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


def check_summary(annotated: rd.Dataset) -> pa.Table:
    """(check, n_violations) rollup from an annotated dataset (combiner +
    tiny groupby — the reference's run-level ok-flags, app.py:652-659)."""

    def partial(t: pa.Table) -> pd.DataFrame:
        failed = t.column("checks_failed").combine_chunks()
        flat = failed.flatten().to_pylist()
        if not flat:
            return pd.DataFrame({"check": pd.Series([], dtype=str), "n": pd.Series([], dtype=np.int64)})
        s = pd.Series(flat).value_counts()
        return pd.DataFrame({"check": s.index, "n": s.to_numpy(dtype=np.int64)})

    agg = (
        annotated.map_batches(partial, batch_format="pyarrow")
        .groupby("check")
        .aggregate(Sum("n", alias_name="n"))
    )

    def to_int(df: pd.DataFrame) -> pd.DataFrame:
        df["n"] = df["n"].astype(np.int64)
        return df

    return collect_table(
        agg.map_batches(to_int, batch_format="pandas").sort("check"),
        schema=pa.schema([("check", pa.string()), ("n", pa.int64())]),
    )

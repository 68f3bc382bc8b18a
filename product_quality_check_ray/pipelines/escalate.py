"""Two-phase candidate → adjudicate routing (SURVEY.md §7.2 step 7).

The reference's core cost-control move: a cheap prescreen flags candidate
rows, and ONLY those rows pay for the expensive adjudication stage (GPT in
the reference — ``app.py:947-952,1332-1353``). Here:

  phase 1 (cheap, stateless): the fused vectorized row checks annotate every
      row with ``ok`` / ``checks_failed``; clean batches fast-path through.
  phase 2 (expensive, stateful): flagged rows are routed to an actor-pool
      adjudicator that computes a per-row evidence verdict. The sandbox has
      no model runtime, so the adjudicator is a deterministic stand-in with
      REAL cost shape (per-row token-array statistics: entropy, bigram
      repetition) — swap ``Adjudicator.score`` for a model call; the
      routing, batching and actor plumbing stay identical.

The filter between phases means adjudication cost scales with the violation
rate (~2%), not the corpus — the escalation-ladder pattern from SURVEY §3.2.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..checks.row_checks import annotate_batch
from ..core.rounding import round_half_away as _rha
from ..sources.dimensions import build_check_ctx

VERDICT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("source", pa.string()),
        ("checks_failed", pa.list_(pa.string())),
        ("token_entropy", pa.float64()),
        ("repeat_ratio", pa.float64()),
        ("severity", pa.string()),
    ]
)


class Adjudicator:
    """Actor-pool stage: expensive per-row scoring of FLAGGED rows only.

    State (here: nothing heavy; in production: a model handle) is built once
    per actor. ``__call__`` receives only candidate rows — the routing
    filter upstream guarantees clean batches never reach this stage.
    """

    def __init__(self, severe_checks: tuple[str, ...] = ("null_doc_id", "null_tokens", "token_oov", "token_neg")):
        self.severe = frozenset(severe_checks)

    @staticmethod
    def _row_stats(tokens: "list[int] | None") -> tuple[float, float]:
        if not tokens:
            return 0.0, 0.0
        # null ELEMENTS reach this stage by design (they are why the row was
        # flagged); map them to -1, matching the check kernel's convention
        arr = np.asarray(
            [(-1 if t is None else t) for t in tokens], dtype=np.int64
        )
        _, counts = np.unique(arr, return_counts=True)
        p = counts / counts.sum()
        entropy = float(-(p * np.log2(p)).sum())
        if arr.size < 2:
            return entropy, 0.0
        rep = float((arr[1:] == arr[:-1]).mean())
        return entropy, rep

    def __call__(self, t: pa.Table) -> pa.Table:
        ent_out = np.empty(t.num_rows)
        rep_out = np.empty(t.num_rows)
        sev_out: list[str] = []
        toks = t.column("tokens").to_pylist()
        failed = t.column("checks_failed").to_pylist()
        for i, (tk, fl) in enumerate(zip(toks, failed)):
            ent_out[i], rep_out[i] = self._row_stats(tk)
            sev_out.append("severe" if self.severe & set(fl or ()) else "minor")
        return pa.Table.from_arrays(
            [
                t.column("doc_id"),
                t.column("source"),
                t.column("checks_failed"),
                pa.array(_rha(ent_out, 6)),
                pa.array(_rha(rep_out, 6)),
                pa.array(sev_out, type=pa.string()),
            ],
            schema=VERDICT_SCHEMA,
        )


def route_and_adjudicate(
    ds: rd.Dataset,
    *,
    allowlist_rows: list[dict] | None = None,
    concurrency: tuple[int, int] = (1, 4),
    batch_size: int | None = 1024,
) -> rd.Dataset:
    """Cheap fused checks → filter candidates → expensive adjudicator pool.

    Returns the adjudicated-verdict Dataset (one row per flagged input row).
    """
    ctx = build_check_ctx(allowlist_rows)

    def annotate_and_filter(batch: pa.Table) -> pa.Table:
        annotated, mat = annotate_batch(batch, ctx)
        bad = mat.any(axis=1)
        if not bad.any():
            # fast path: clean batch contributes zero rows downstream
            return annotated.slice(0, 0)
        return annotated.filter(pa.array(bad))

    candidates = ds.map_batches(annotate_and_filter, batch_format="pyarrow")
    return candidates.map_batches(
        Adjudicator,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def seq_adjudicated(sf_dir: str) -> rd.Dataset:
    """Driver query: adjudicated verdicts for the synthetic corpus."""
    import glob

    from ..datagen import ensure_sequences, sequences_glob

    ensure_sequences(sf_dir)
    files = sorted(glob.glob(sequences_glob(sf_dir)))
    return route_and_adjudicate(rd.read_parquet(files))

"""Stateless, fused, vectorized row-level checks.

One zero-copy Arrow pass computes every per-row predicate (SURVEY.md §7.1
"minimum slice"): schema/type conformance, null predicates, ``n_tok ==
len(tokens)`` consistency, token-domain bounds, per-source ``n_tok`` range,
and the referential source-allowlist semi-join (reference analog J2: exact
dictionary semi-join, ``banningredients.py:131-139``; anti-join misses become
violations).

All kernels are pyarrow.compute / numpy over the batch's flattened buffers —
no Python row loop. Per-list min/max uses ``np.minimum.reduceat`` over the
ListArray offsets, which is how you get vectorized list aggregation without a
dedicated Arrow kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.schema import SEQUENCE_SCHEMA, VOCAB, MAX_N_TOK_DEFAULT
from .base import RowCheck, register

# Ordered names of the fused row checks; the order defines the layout of the
# boolean matrix and the `checks_failed` list entries (deterministic across
# parallelism levels — SURVEY.md §7.4).
ROW_CHECK_NAMES: tuple[str, ...] = (
    "null_doc_id",
    "null_tokens",
    "ntok_mismatch",
    "token_oov",
    "token_neg",
    "bad_source",
    "ntok_range",
)


def dedupe_column_names(t: pa.Table) -> pa.Table:
    """D2 repair: duplicate column names suffixed ``name.1``, ``name.2``, …
    (first occurrence keeps the bare name) — the reference's
    ``_dedupe_columns`` semantics (``app.py:132-142``)."""
    seen: dict[str, int] = {}
    out = []
    for c in map(str, t.column_names):
        if c not in seen:
            seen[c] = 1
            out.append(c)
        else:
            # probe past suffixes that collide with PRE-EXISTING columns
            # (e.g. ['a','a','a.1'] must not emit 'a.1' twice) and register
            # the generated name so later duplicates can't reuse it
            k = seen[c]
            cand = f"{c}.{k}"
            while cand in seen:
                k += 1
                cand = f"{c}.{k}"
            seen[c] = k + 1
            seen[cand] = 1
            out.append(cand)
    if out != list(t.column_names):
        t = t.rename_columns(out)
    return t


def conform_schema(batch: pa.Table, *, repair: bool = False) -> pa.Table:
    """Schema-conformance gate (check #0): select + cast to the declared
    schema; raises on structural mismatch (reference analog: required-column
    validation ``banningredients.py:43-46``, wrong-file detection
    ``app.py:478-481``). With ``repair=True`` duplicate column names are
    first deduped with ``.N`` suffixes instead of failing the select
    (reference repair-mode analog, ``app.py:132-142``)."""
    if repair:
        batch = dedupe_column_names(batch)
    missing = [n for n in SEQUENCE_SCHEMA.names if n not in batch.column_names]
    if missing:
        raise ValueError(f"input missing required columns {missing}")
    cols = [batch.column(n) for n in SEQUENCE_SCHEMA.names]
    t = pa.Table.from_arrays(cols, names=list(SEQUENCE_SCHEMA.names))
    if t.schema != SEQUENCE_SCHEMA:
        t = t.cast(SEQUENCE_SCHEMA)
    return t


def _list_min_max(col: "pa.ChunkedArray | pa.ListArray") -> tuple[np.ndarray, np.ndarray]:
    """Per-row (min, max) of a list<int32> column; empty/null rows → (0, -1).

    Vectorized via ufunc.reduceat over the flattened values buffer.
    """
    if isinstance(col, pa.ChunkedArray):
        arr = col.combine_chunks()
    else:
        arr = col
    n = len(arr)
    mins = np.zeros(n, dtype=np.int64)
    maxs = np.full(n, -1, dtype=np.int64)
    if n == 0:
        return mins, maxs
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    inner = arr.values
    if inner.null_count:
        # a null ELEMENT inside a token list is an invalid token value —
        # map it to -1 so the token_neg domain check flags the row (without
        # this, to_numpy silently yields float64 NaN and the min/max casts
        # corrupt both domain checks)
        inner = pc.fill_null(inner, -1)
    # keep the native int32 values buffer — an int64 astype would copy the
    # whole token payload (the hot-path's single biggest cost when profiled)
    values = inner.to_numpy(zero_copy_only=False)
    # clip values to the logical range of this (possibly sliced) array so the
    # final reduceat segment ends at the last row's end, not the buffer's end
    values = values[: offsets[-1]]
    lens = offsets[1:] - offsets[:-1]
    nonempty = lens > 0
    if values.size and nonempty.any():
        starts = offsets[:-1][nonempty]
        mins_ne = np.minimum.reduceat(values, starts)
        maxs_ne = np.maximum.reduceat(values, starts)
        mins[nonempty] = mins_ne
        maxs[nonempty] = maxs_ne
    if arr.null_count:
        nulls = ~np.asarray(arr.is_valid())
        mins[nulls] = 0
        maxs[nulls] = -1
    return mins, maxs


def _np_bool(arr) -> np.ndarray:
    return np.asarray(arr.to_numpy(zero_copy_only=False), dtype=bool)


def row_check_matrix(batch: pa.Table, ctx: dict) -> np.ndarray:
    """Compute the fused row checks → bool matrix of shape (n_rows, n_checks).

    ``ctx``: {"allowed_sources": frozenset[str], "max_n_tok": {source: cap},
    "vocab": int} — broadcast dimension state (built once per actor/worker,
    reference analog A1-A3 module-global dictionary indexes).

    Disabled checks (``ctx["enabled_checks"]``) are NOT computed, not just
    masked: their matrix columns stay False and their kernels never run.
    That is what makes the footer-statistics prescreen a real win — a
    fragment whose token domain is proven clean from stats skips the
    ``_list_min_max`` pass (the kernel's single biggest cost) entirely.
    """
    n = batch.num_rows
    vocab = ctx.get("vocab", VOCAB)
    tokens = batch.column("tokens")
    n_tok = batch.column("n_tok")
    doc_id = batch.column("doc_id")
    source = batch.column("source")

    enabled = ctx.get("enabled_checks")
    en = set(ROW_CHECK_NAMES) if enabled is None else set(enabled)

    mat = np.zeros((n, len(ROW_CHECK_NAMES)), dtype=bool)

    if "null_doc_id" in en:
        mat[:, 0] = _np_bool(pc.is_null(doc_id))

    null_tok = None
    if en & {"null_tokens", "ntok_mismatch"}:
        null_tok = _np_bool(pc.is_null(tokens))
    if "null_tokens" in en:
        mat[:, 1] = null_tok

    if "ntok_mismatch" in en:
        list_len = pc.list_value_length(tokens)  # null where tokens null
        mismatch = _np_bool(
            pc.fill_null(pc.not_equal(pc.cast(list_len, pa.int32()), n_tok), True)
        )
        # a null n_tok is a mismatch; null tokens handled by null_tokens check
        mismatch = mismatch | _np_bool(pc.is_null(n_tok))
        mismatch &= ~null_tok
        mat[:, 2] = mismatch

    if en & {"token_oov", "token_neg"}:
        mins, maxs = _list_min_max(tokens)
        if "token_oov" in en:
            mat[:, 3] = maxs >= vocab
        if "token_neg" in en:
            mat[:, 4] = mins < 0

    if "bad_source" in en:
        value_set = ctx.get("allowed_sources_arr")
        if value_set is None:
            value_set = pa.array(sorted(ctx["allowed_sources"]), type=pa.string())
        src_ok = pc.is_in(source, value_set=value_set)
        mat[:, 5] = ~_np_bool(pc.fill_null(src_ok, False))

    if "ntok_range" in en:
        caps = ctx.get("max_n_tok") or {}
        nt = np.asarray(
            pc.fill_null(n_tok, -1).to_numpy(zero_copy_only=False), dtype=np.int64
        )
        if caps:
            # vectorized per-source cap lookup via index_in against the dim table
            dim_sources = pa.array(list(caps.keys()), type=pa.string())
            cap_arr = np.asarray(
                list(caps.values()) + [MAX_N_TOK_DEFAULT], dtype=np.int64
            )
            idx = pc.fill_null(pc.index_in(source, value_set=dim_sources), len(caps))
            row_caps = cap_arr[
                np.asarray(idx.to_numpy(zero_copy_only=False), dtype=np.int64)
            ]
        else:
            row_caps = np.full(n, MAX_N_TOK_DEFAULT, dtype=np.int64)
        mat[:, 6] = (nt < 1) | (nt > row_caps)

    return mat


def checks_failed_list_array(mat: np.ndarray) -> pa.ListArray:
    """bool matrix (n, k) → Arrow list<string> of failed check names per row.

    Fully vectorized: row-major flatten + boolean take of a tiled name index.
    """
    n, k = mat.shape
    counts = mat.sum(axis=1).astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    flat = mat.reshape(-1)
    name_idx = np.tile(np.arange(k, dtype=np.int64), n)[flat]
    names = np.asarray(ROW_CHECK_NAMES, dtype=object)
    values = pa.array(names[name_idx], type=pa.string())
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), values)


def annotate_batch(batch: pa.Table, ctx: dict) -> tuple[pa.Table, np.ndarray]:
    """Conform + run fused checks; returns (annotated batch, bool matrix).

    Appends ``ok: bool`` and ``checks_failed: list<string>`` columns
    (reference analog: per-row verdict dict + evidence list,
    ``app.py:991-1448``), leaving input columns byte-identical (violation
    rows must equal input rows — the driver's token-array invariant).
    """
    t = conform_schema(batch, repair=bool(ctx.get("schema_repair")))
    mat = row_check_matrix(t, ctx)
    warn = ctx.get("warn_checks")
    if warn:
        # warn-class checks annotate (checks_failed) and count (the matrix
        # is returned untouched) but never fail a row
        fail_cols = [j for j, n in enumerate(ROW_CHECK_NAMES) if n not in warn]
        ok = (
            ~mat[:, fail_cols].any(axis=1)
            if fail_cols
            else np.ones(t.num_rows, dtype=bool)
        )
    else:
        ok = ~mat.any(axis=1)
    t = t.append_column("ok", pa.array(ok))
    t = t.append_column("checks_failed", checks_failed_list_array(mat))
    return t, mat


# registry entries (one per fused predicate) so the engine's check inventory
# is introspectable like the reference's PROMPT_OPTIONS. BUILTIN_ROW_CHECKS
# keeps the original objects: stages use it to decide whether a
# registry-resolved check may take the shared fused-matrix fast path (a user
# re-registering a builtin NAME must get their own fn, not the builtin's).
BUILTIN_ROW_CHECKS: dict[str, RowCheck] = {}
for _name in ROW_CHECK_NAMES:
    BUILTIN_ROW_CHECKS[_name] = register(
        RowCheck(
            name=_name,
            required_columns=("doc_id", "tokens", "n_tok", "source"),
            fn=lambda b, c, _n=_name: row_check_matrix(b, c)[
                :, ROW_CHECK_NAMES.index(_n)
            ],
        )
    )

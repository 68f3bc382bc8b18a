"""Broadcast-or-shuffle join helpers (semi / anti / lookup).

Several pipelines semi-join a fact table against a key set that is USUALLY
small (a filtered customer segment, the distinct order custkeys) but is
fact-scale in the worst case — it grows with the input, so a driver-side
``take_all()`` into a Python set is a 100 TB scale-killer (multi-GB driver
dict serialized into every task closure).

The policy here (VERDICT r1 item 4):

- probe the key side with an early-stopped ``limit(cap+1)`` — ONE pass, no
  separate ``count()`` execution;
- if it fits under ``BROADCAST_KEY_CAP`` (default 2M keys ≈ 16 MB of int64),
  ``ray.put`` the distinct key array ONCE and filter with a vectorized
  ``pc.is_in`` inside ``map_batches`` (the array is fetched zero-copy per
  worker, never re-shipped per task);
- otherwise fall back to the native hash ``Dataset.join`` (distinct keys via
  groupby, inner for semi, left_outer + null-filter for anti).

Both paths are exactly equivalent; ``tests/test_operators.py`` forces the
join path with a tiny cap and compares.

Reference analog: exact dictionary semi-join (J2, banningredients.py:131-139)
generalized with a scale guard.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count

from .collect import collect_table as _collect

BROADCAST_KEY_CAP = int(os.environ.get("PQCRAY_BROADCAST_KEY_CAP", str(2_000_000)))


def probe_keys(keys_ds: rd.Dataset, col: str, cap: int) -> pa.Array | None:
    """Distinct key array if the key side holds ≤ ``cap`` DISTINCT keys
    (per-batch-deduped probe), else None.

    A per-batch ``pc.unique`` combiner runs before the early-stopped
    ``limit(cap+1)``, so a key side with few distinct keys but many
    duplicate rows (e.g. raw orders.o_custkey) still takes the broadcast
    path; the cap then bounds the sum of per-batch distincts — conservative
    but never more than batch-count× the true distinct count. If the
    limited read returns ≤ cap rows it IS the complete (batch-deduped) key
    side — one pass, early-stoppable.
    """

    def batch_unique(t: pa.Table) -> pa.Table:
        return pa.table({col: pc.unique(t.column(col).combine_chunks())})

    head = _collect(
        keys_ds.select_columns([col])
        .map_batches(batch_unique, batch_format="pyarrow")
        .limit(cap + 1)
    )
    if col not in head.column_names:
        # an all-empty key side can lose its schema through the limit
        # (collect falls back to a zero-column table) — it IS the complete
        # (empty) key side; recover the column type from the dataset schema
        s = keys_ds.schema()
        head = pa.table({col: pa.array([], type=dict(zip(s.names, s.types))[col])})
    if head.num_rows > cap:
        return None
    return pc.unique(head.column(col).combine_chunks())


def semi_join(
    ds: rd.Dataset,
    key_col: str,
    keys_ds: rd.Dataset,
    keys_col: str,
    *,
    anti: bool = False,
    cap: int | None = None,
    num_partitions: int = 8,
) -> rd.Dataset:
    """``ds ⋉ keys_ds`` (or ``ds ∖ keys_ds`` when ``anti``) on one key column.

    Output columns are exactly ``ds``'s columns. Null keys in ``ds`` never
    match (semi drops them, anti keeps them) — is_in/fill_null semantics on
    the broadcast path, mirrored by the null-filter on the join path.
    """
    cap = BROADCAST_KEY_CAP if cap is None else cap
    keys = probe_keys(keys_ds, keys_col, cap)
    if keys is not None:
        keys = keys.drop_null()
        ref = ray.put(keys)

        def filt(t: pa.Table) -> pa.Table:
            vals = ray.get(ref)
            mask = pc.fill_null(pc.is_in(t.column(key_col), value_set=vals), False)
            if anti:
                mask = pc.invert(mask)
            # metadata strip: downstream joins/shuffles hash block schemas
            # for dedup and a pandas-metadata dict defeats that (batches.py)
            return t.filter(mask).replace_schema_metadata(None)

        return ds.map_batches(filt, batch_format="pyarrow")

    out_cols = list(ds.schema().names)
    from .batches import strip_schema_metadata

    # BOTH join inputs need the pandas-metadata strip: the keys side feeds
    # the groupby's hash-shuffle aggregators directly
    ds = strip_schema_metadata(ds)
    distinct = (
        strip_schema_metadata(keys_ds.select_columns([keys_col]))
        .groupby(keys_col)
        .aggregate(Count(alias_name="__k_n"))
    )
    if not anti:
        joined = ds.join(
            distinct,
            join_type="inner",
            num_partitions=num_partitions,
            on=(key_col,),
            right_on=(keys_col,),
        )
        return joined.select_columns(out_cols)
    joined = ds.join(
        distinct,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=(key_col,),
        right_on=(keys_col,),
    )

    def unmatched(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t.column("__k_n"))).select(out_cols)

    return joined.map_batches(unmatched, batch_format="pyarrow")


def lookup_join(
    ds: rd.Dataset,
    key_col: str,
    dim_ds: rd.Dataset,
    dim_key: str,
    value_cols: list[str],
    *,
    cap: int | None = None,
    num_partitions: int = 8,
) -> rd.Dataset:
    """Enrich ``ds`` with ``value_cols`` from a dimension table (inner,
    key → values; dim keys are assumed unique, the dimension-loader
    contract).

    Same policy as ``semi_join``: if the dim side holds ≤ ``cap`` rows it is
    ``ray.put`` ONCE and each batch does a local Arrow hash join against the
    per-worker-cached table (zero-copy plasma read, never re-shipped per
    task); above the cap it falls back to the native hash ``Dataset.join``.
    Output columns: ``ds``'s columns ⊕ ``value_cols``.
    """
    cap = BROADCAST_KEY_CAP if cap is None else cap
    dim_head = _collect(dim_ds.select_columns([dim_key, *value_cols]).limit(cap + 1))
    out_cols = list(ds.schema().names) + list(value_cols)
    if dim_head.num_rows <= cap:
        ref = ray.put(dim_head.combine_chunks())

        def enrich(t: pa.Table, _cache={}) -> pa.Table:
            dim = _cache.get("dim")
            if dim is None:
                dim = _cache["dim"] = ray.get(ref)
            j = t.join(
                dim, keys=[key_col], right_keys=[dim_key], join_type="inner"
            )
            return j.select(out_cols).replace_schema_metadata(None)

        return ds.map_batches(enrich, batch_format="pyarrow")

    from .batches import strip_schema_metadata

    joined = strip_schema_metadata(ds).join(
        strip_schema_metadata(dim_ds.select_columns([dim_key, *value_cols])),
        join_type="inner",
        num_partitions=num_partitions,
        on=(key_col,),
        right_on=(dim_key,),
    )
    return joined.map_batches(
        lambda t: t.select(out_cols).replace_schema_metadata(None),
        batch_format="pyarrow",
    )

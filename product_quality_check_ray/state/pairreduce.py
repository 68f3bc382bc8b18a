"""Co-occurrence pair extraction via hash-range reduce over Dataset blocks.

The LSH family of dedup operators (MinHash bands, SimHash pieces, shingle
inverted index) all end with "group rows by a key, emit doc-id pairs that
share a key". ``Dataset.groupby(key).map_groups`` expresses that but pays
per-group task overhead — pathological for millions of tiny buckets
(measured 8–20 s on inputs whose pair output is a handful of rows). This
module reduces the SAME semantics with raw Ray tasks (the dupfinder pattern,
``state/dupfinder.py``):

- **map** (one task per block bundle): hash the key column, split rows into
  R contiguous hash ranges, return per-range (key, id) arrays. Keys travel
  as their exact strings/values, so reduce-side grouping is collision-free.
- **reduce** (one task per range): one vectorized sort-and-segment pass
  groups by exact key; each bucket (capped at ``max_bucket``) emits its
  id pairs; per-range pair counts come from one np.unique.

Partitioning assumption: ranges are uniform under the key hash (always true
— it's a hash); per-bucket pair output is bounded by ``max_bucket``
(hot keys emit capped, deterministic pairs — callers must treat results as
candidates and verify, or stop-list boilerplate keys upstream).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..core.hashing import hash_ints, hash_strings, range_edges as _edges

RANGE_SEED = 11


@ray.remote
def _map_blocks(block_refs: list, key_col: str, id_col: str, ranges: int, size_col=None):
    """Emits one (keys, ids, sizes|None) object per hash range
    (``num_returns=ranges``) so partials route worker→worker — the driver
    holds only ObjectRefs. ``size_col`` optionally rides a per-row int64
    attribute (e.g. the doc's total shingle count) through the exchange so
    reduces can emit per-pair sizes without any driver-side doc→size dict."""
    # refs nested inside a list are not auto-dereferenced by Ray
    blocks = ray.get(list(block_refs))
    tables = [b if isinstance(b, pa.Table) else pa.Table.from_batches([b]) for b in blocks]
    # empty splits surface as ZERO-COLUMN blocks (Ray skips the UDF for
    # them), which poison concat_tables — drop them
    tables = [t for t in tables if t.num_rows > 0]
    if not tables:
        # the sizes slot must be an ARRAY (not None) when size_col rides the
        # exchange — a reduce range mixing this sentinel with non-empty
        # parts np.concatenate()s the slot
        e = (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64) if size_col is not None else None,
        )
        return e if ranges == 1 else tuple(e for _ in range(ranges))
    t = pa.concat_tables(tables) if len(tables) > 1 else tables[0]
    keys = t.column(key_col).combine_chunks()
    ids = np.asarray(t.column(id_col).to_numpy(zero_copy_only=False), dtype=np.int64)
    sizes = (
        np.asarray(t.column(size_col).to_numpy(zero_copy_only=False), dtype=np.int64)
        if size_col is not None
        else None
    )
    if pa.types.is_integer(keys.type):
        # integer keys (e.g. 64-bit band/piece keys): hash numerically and
        # keep them as a numeric ndarray — no to_pylist object conversion
        keys_np = keys.to_numpy(zero_copy_only=False)
        h = hash_ints(keys_np.astype(np.uint64, copy=False), seed=RANGE_SEED)
        order = np.argsort(h, kind="stable")
        h, ids = h[order], ids[order]
        keys_np = keys_np[order]
    else:
        h = hash_strings(keys, seed=RANGE_SEED)
        order = np.argsort(h, kind="stable")
        h, ids = h[order], ids[order]
        keys_np = np.asarray(keys.to_pylist(), dtype=object)[order]
    if sizes is not None:
        sizes = sizes[order]
    idx = np.searchsorted(h, _edges(ranges))
    return tuple(
        (keys_np[lo:hi], ids[lo:hi], None if sizes is None else sizes[lo:hi])
        for lo, hi in zip(np.r_[0, idx], np.r_[idx, len(h)])
    )


_EMPTY_I64 = np.empty(0, dtype=np.int64)


@ray.remote
def _reduce_range(max_bucket: int, drop_hot: bool, distinct_ids: bool, with_sizes: bool, *parts):
    empty = (
        (_EMPTY_I64,) * 5 if with_sizes else (_EMPTY_I64, _EMPTY_I64, _EMPTY_I64)
    )
    keys = np.concatenate([p[0] for p in parts])
    if keys.size == 0:
        return empty
    ids = np.concatenate([p[1] for p in parts])
    sizes = np.concatenate([p[2] for p in parts]) if with_sizes else None
    df = pd.DataFrame({"k": keys, "i": ids})
    if with_sizes:
        df["s"] = sizes
    df = df.sort_values(["k", "i"], kind="mergesort")
    k = df["k"].to_numpy()
    i = df["i"].to_numpy()
    s = df["s"].to_numpy() if with_sizes else None
    if distinct_ids and k.size:
        # semantic guard for callers whose upstream dedupe is per-batch
        # (e.g. overlap pairs): the same (key, id) row arriving twice must
        # not inflate bucket sizes or pair counts
        first = np.empty(k.size, dtype=bool)
        first[0] = True
        first[1:] = (k[1:] != k[:-1]) | (i[1:] != i[:-1])
        k, i = k[first], i[first]
        if with_sizes:
            s = s[first]
    change = np.empty(k.size, dtype=bool)
    change[0] = True
    change[1:] = k[1:] != k[:-1]
    starts = np.flatnonzero(change)
    ends = np.r_[starts[1:], k.size]
    out_a, out_b, out_sa, out_sb = [], [], [], []
    for lo, hi in zip(starts, ends):
        if drop_hot and hi - lo > max_bucket:
            # stop-list semantics: a key hotter than the cap is boilerplate
            # (shared by "everyone") — drop it entirely rather than emitting
            # a truncated, oracle-divergent pair sample
            continue
        n = min(hi - lo, max_bucket)
        if n < 2:
            continue
        bucket = i[lo : lo + n]
        ia, ib = np.triu_indices(n, k=1)
        out_a.append(bucket[ia])
        out_b.append(bucket[ib])
        if with_sizes:
            sb = s[lo : lo + n]
            out_sa.append(sb[ia])
            out_sb.append(sb[ib])
    if not out_a:
        return empty
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    pairs = np.stack([a, b], axis=1)
    uniq, first_idx, counts = np.unique(
        pairs, axis=0, return_index=True, return_counts=True
    )
    if not with_sizes:
        return uniq[:, 0], uniq[:, 1], counts.astype(np.int64)
    sa = np.concatenate(out_sa)[first_idx]
    sb = np.concatenate(out_sb)[first_idx]
    return uniq[:, 0], uniq[:, 1], counts.astype(np.int64), sa, sb


def cooccurrence_pairs(
    ds: rd.Dataset,
    key_col: str,
    id_col: str,
    *,
    ranges: int | None = None,
    max_bucket: int = 1024,
    blocks_per_task: int = 8,
    drop_hot: bool = False,
    distinct_ids: bool = False,
    size_col: str | None = None,
) -> pd.DataFrame:
    """All (id_a < id_b, n_shared_keys) pairs that co-occur under a key.

    Consumes the dataset's blocks directly (no driver pull of rows); the
    result is assumed small (candidate pairs) and returned as a DataFrame.
    ``drop_hot=True`` switches hot-key handling from truncate-at-cap to
    stop-list (keys with more than ``max_bucket`` ids emit no pairs) — the
    deterministic, oracle-expressible boilerplate filter. ``distinct_ids=True``
    dedupes repeated (key, id) rows inside the reduce (exact — same-key rows
    co-locate by construction), for callers whose upstream dedupe is only
    per-batch. ``size_col`` names an int64 per-row attribute (constant per
    id) that rides the exchange and comes back as ``size_a``/``size_b`` —
    the reduce co-locates both ids of every pair, so callers needing sizes
    (e.g. Jaccard denominators) never build a driver-side id→size dict
    (VERDICT r2 finding #1).
    """
    if ranges is None:
        try:
            ranges = max(8, int(ray.cluster_resources().get("CPU", 8)))
        except Exception:
            ranges = 8
    ranges = max(2, ranges)
    with_sizes = size_col is not None
    cols = {
        "id_a": pd.Series([], dtype=np.int64),
        "id_b": pd.Series([], dtype=np.int64),
        "n_shared": pd.Series([], dtype=np.int64),
    }
    if with_sizes:
        cols["size_a"] = pd.Series([], dtype=np.int64)
        cols["size_b"] = pd.Series([], dtype=np.int64)
    bundles = list(ds.iter_internal_ref_bundles())
    block_refs = [ref for b in bundles for ref in b.block_refs]
    if not block_refs:
        return pd.DataFrame(cols)
    mapped_refs = [
        _map_blocks.options(num_returns=ranges).remote(
            block_refs[i : i + blocks_per_task], key_col, id_col, ranges, size_col
        )
        for i in range(0, len(block_refs), blocks_per_task)
    ]
    reduced = ray.get(
        [
            _reduce_range.remote(
                max_bucket, drop_hot, distinct_ids, with_sizes, *[m[r] for m in mapped_refs]
            )
            for r in range(ranges)
        ]
    )
    nonempty = [r for r in reduced if len(r[0])]
    if not nonempty:
        return pd.DataFrame(cols)
    a = np.concatenate([r[0] for r in nonempty])
    b = np.concatenate([r[1] for r in nonempty])
    c = np.concatenate([r[2] for r in nonempty])
    # a pair may share keys in several ranges (different keys) — final sum.
    # lexsort + reduceat, not pandas groupby: the pandas path was 15 s of a
    # 21.6 s wall on 8.5M candidate pairs (500k-doc stress); this is ~2 s
    order = np.lexsort((b, a))
    a, b, c = a[order], b[order], c[order]
    change = np.empty(a.size, dtype=bool)
    change[0] = True
    change[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    starts = np.flatnonzero(change)
    out = {
        "id_a": a[starts],
        "id_b": b[starts],
        "n_shared": np.add.reduceat(c, starts),
    }
    if with_sizes:
        out["size_a"] = np.concatenate([r[3] for r in nonempty])[order][starts]
        out["size_b"] = np.concatenate([r[4] for r in nonempty])[order][starts]
    return pd.DataFrame(out)

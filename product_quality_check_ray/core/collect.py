"""Small-result materialization helper.

``collect_table`` is for results that are ALREADY tiny (post-aggregation,
top-k, violation summaries): it streams the dataset's Arrow batches and
concatenates them into one table, preserving the schema even when the result
is empty. Never call it on an unaggregated corpus-scale dataset — the
streaming consumption path for those is ``write_parquet`` / ``iter_batches``.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd


def collect_table(ds: rd.Dataset, schema: "pa.Schema | None" = None) -> pa.Table:
    tables = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tables:
        if schema is None:
            try:
                s = ds.schema()
                schema = pa.schema(list(zip(s.names, s.types))) if s is not None else None
            except Exception:
                schema = None
        if schema is None:
            return pa.table({})
        return pa.table({f.name: pa.array([], type=f.type) for f in schema})
    return pa.concat_tables(tables, promote_options="default").combine_chunks()


def reset_incomplete_sink(out_dir: str, marker: str) -> bool:
    """Marker-sink crash safety (shared by every resumable parquet sink
    with a `_*_SUCCESS` marker): returns True when the marker exists (sink
    complete — read it back); otherwise REMOVES any partial output first,
    because Ray's ``write_parquet`` appends UUID-named files and a rerun
    over a killed run's partial directory would silently duplicate rows
    under a fresh success marker."""
    import os
    import shutil

    if os.path.exists(marker):
        return True
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir, ignore_errors=True)
    return False

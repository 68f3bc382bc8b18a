"""Multi-format corpus reader: parquet / CSV / JSONL → one Dataset contract.

The reference ingests user-uploaded CSVs (``app.py:478-481`` upload +
wrong-file detection) and the engine's pipelines consume parquet; real
training-data corpora also arrive as JSONL dumps. ``read_corpus`` gives every
pipeline one entry point:

- format detection by extension (``.parquet``, ``.csv``, ``.json``/
  ``.jsonl``), recursive for partitioned directory layouts, overridable via
  ``fmt=``;
- ``columns=`` projection is pushed into the parquet reader and applied as a
  post-read ``select_columns`` for row-oriented formats (CSV/JSONL cannot
  column-prune at the byte level — documented trade-off, convert to parquet
  for the 100 TB path);
- ``required=`` and ``columns=`` are both validated against the FULL file
  schema (before projection), for every format, and fail loudly with the
  file's actual columns (the reference's wrong-file detection pattern).

Scale note: Ray's CSV/JSON readers split by file, parquet by row group —
many-file layouts parallelize in every format; single giant CSVs do not.
"""

from __future__ import annotations

import os

import ray.data as rd

_EXT_FMT = {
    ".parquet": "parquet",
    ".pq": "parquet",
    ".csv": "csv",
    ".json": "json",
    ".jsonl": "json",
}


def detect_format(path: str) -> str:
    """Format of a file or of a (single-format) directory tree of files.

    Walks nested layouts (hive-partitioned parquet writes files under
    ``key=value/`` subdirectories) and only counts regular FILES — a
    subdirectory named ``backup.csv`` is not data.
    """
    if os.path.isdir(path):
        fmts = set()
        for root, _dirs, files in os.walk(path):
            for f in files:
                ext = os.path.splitext(f)[1].lower()
                if ext in _EXT_FMT:
                    fmts.add(_EXT_FMT[ext])
        if len(fmts) != 1:
            raise ValueError(
                f"cannot auto-detect corpus format for {path!r}: "
                f"found {sorted(fmts) or 'no recognized files'}; pass fmt="
            )
        return next(iter(fmts))
    ext = os.path.splitext(path)[1].lower()
    if ext not in _EXT_FMT:
        raise ValueError(f"unrecognized corpus extension {ext!r} for {path!r}; pass fmt=")
    return _EXT_FMT[ext]


def _validate(path: str, names: list[str], columns, required) -> None:
    for what, want in (("required", required), ("projected", columns)):
        if want:
            missing = [c for c in want if c not in names]
            if missing:
                raise ValueError(
                    f"corpus {path!r} missing {what} columns {missing}; found {names}"
                )


def read_corpus(
    path: str,
    *,
    fmt: str | None = None,
    columns: list[str] | None = None,
    required: list[str] | None = None,
) -> rd.Dataset:
    """Read a corpus in parquet / CSV / JSONL as a Dataset.

    Parquet gets true projection pushdown; CSV/JSONL are row-oriented, so
    ``columns`` becomes a post-read projection (still prunes the object
    store and every downstream stage). ``required``/``columns`` are
    validated against the FULL source schema for every format (parquet's is
    read from file metadata only — the projected Dataset schema would
    report a false wrong-file error for required-but-unprojected columns).
    """
    fmt = fmt or detect_format(path)
    if fmt == "parquet":
        import pyarrow.dataset as pds

        names = list(pds.dataset(path, format="parquet", partitioning="hive").schema.names)
        _validate(path, names, columns, required)
        return rd.read_parquet(path, columns=columns)
    if fmt not in ("csv", "json"):
        raise ValueError(f"unsupported corpus format {fmt!r}")
    ds = rd.read_csv(path) if fmt == "csv" else rd.read_json(path)
    _validate(path, list(ds.schema().names), columns, required)
    if columns:
        ds = ds.select_columns(columns)
    return ds

"""Multi-format corpus reader: parquet / CSV / JSONL → one Dataset contract.

The reference ingests user-uploaded CSVs (``app.py:478-481`` upload +
wrong-file detection) and the engine's pipelines consume parquet; real
training-data corpora also arrive as JSONL dumps. ``read_corpus`` gives every
pipeline one entry point:

- format detection by extension (``.parquet``, ``.csv``, ``.json``/
  ``.jsonl``), overridable via ``fmt=``;
- directory inputs fan out over their files (mixed formats rejected loudly);
- ``columns=`` projection is pushed into the parquet reader and applied as a
  post-read ``select_columns`` for row-oriented formats (CSV/JSONL cannot
  column-prune at the byte level — documented trade-off, convert to parquet
  for the 100 TB path);
- ``required=`` column validation fails loudly with the file's actual
  schema (the reference's wrong-file detection pattern).

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
    """Format of a file or of a (single-format) directory of files."""
    if os.path.isdir(path):
        fmts = {
            _EXT_FMT[ext]
            for f in os.listdir(path)
            if (ext := os.path.splitext(f)[1].lower()) in _EXT_FMT
        }
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
    store and every downstream stage).
    """
    fmt = fmt or detect_format(path)
    if fmt == "parquet":
        ds = rd.read_parquet(path, columns=columns)
    elif fmt == "csv":
        ds = rd.read_csv(path)
    elif fmt == "json":
        ds = rd.read_json(path)
    else:
        raise ValueError(f"unsupported corpus format {fmt!r}")
    names = ds.schema().names
    if required:
        missing = [c for c in required if c not in names]
        if missing:
            raise ValueError(
                f"corpus {path!r} missing required columns {missing}; found {list(names)}"
            )
    if columns and fmt != "parquet":
        missing = [c for c in columns if c not in names]
        if missing:
            raise ValueError(
                f"corpus {path!r} missing projected columns {missing}; found {list(names)}"
            )
        ds = ds.select_columns(columns)
    return ds

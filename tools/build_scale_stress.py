"""Build the deterministic 100× scale-stress corpus (BASELINE.md §"100× scale
stress") under /tmp/scale100: sf0.1 documents replicated with a per-(replica,
doc) word permutation (so every replica has a DISTINCT shingle set — exact
dedup finds nothing, near-dup ops see bag-of-words duplicates) and sf0.1
embeddings replicated with per-replica gaussian perturbation (so no exact
vector twins).

Usage: python tools/build_scale_stress.py [out_dir] [replicas]
Deterministic (seed 42): rebuilding yields byte-identical corpora, so stress
numbers across rounds are comparable.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SEED = 42


def build_documents(out_dir: str, replicas: int) -> int:
    src = pq.read_table(os.path.join(SRC, "documents.parquet"))
    n = src.num_rows
    texts = src.column("text").to_pylist()
    split = [t.split() if t else [] for t in texts]
    rng = np.random.default_rng(SEED)
    cols = {c: src.column(c).to_pylist() for c in src.column_names if c not in ("doc_id", "text")}
    writer = None
    path = os.path.join(out_dir, "documents.parquet")
    for r in range(replicas):
        # per-replica permutation of each doc's words: same bag of words
        # (simhash/minhash near-dups fire) but distinct shingle sequences
        out_texts = [" ".join(rng.permutation(w)) if len(w) > 1 else (texts[i] or "") for i, w in enumerate(split)]
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64) + r * n),
                "text": pa.array(out_texts, type=pa.string()),
                **{c: pa.array(v, type=src.schema.field(c).type) for c, v in cols.items()},
            }
        )
        if writer is None:
            writer = pq.ParquetWriter(path, t.schema)
        writer.write_table(t)
    if writer is not None:
        writer.close()
    return n * replicas


def build_embeddings(out_dir: str, replicas: int) -> int:
    src = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    n = src.num_rows
    emb = np.array(src.column("embedding").to_pylist(), dtype=np.float32)
    labels = src.column("label").to_numpy(zero_copy_only=False)
    rng = np.random.default_rng(SEED + 1)
    writer = None
    path = os.path.join(out_dir, "embeddings.parquet")
    for r in range(replicas):
        # small gaussian perturbation: replicas are near but not exact
        # duplicates of their source vector (ANN recall stays meaningful)
        pert = emb + rng.normal(0.0, 0.05, size=emb.shape).astype(np.float32)
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64) + r * n),
                "embedding": pa.array(list(pert), type=pa.list_(pa.float32())),
                "label": pa.array(labels, type=pa.int32()),
            }
        )
        if writer is None:
            writer = pq.ParquetWriter(path, t.schema)
        writer.write_table(t)
    if writer is not None:
        writer.close()
    return n * replicas


def build_dupheavy_documents(out_dir: str, replicas: int) -> int:
    """Majority-duplicate corpus (the VERDICT r3 scale seam): sf0.1
    documents replicated VERBATIM with distinct doc_ids, so the exact-dup
    loser fraction is 1 - 1/replicas (75% at the default 4). The drop set
    is O(corpus) — the regime where clean_documents must route losers
    through the shuffle anti-join, never a driver broadcast."""
    src = pq.read_table(os.path.join(SRC, "documents.parquet"))
    n = src.num_rows
    cols = {c: src.column(c) for c in src.column_names if c != "doc_id"}
    path = os.path.join(out_dir, "documents.parquet")
    writer = None
    for r in range(replicas):
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64) + r * n),
                **cols,
            }
        )
        if writer is None:
            writer = pq.ParquetWriter(path, t.schema)
        writer.write_table(t)
    if writer is not None:
        writer.close()
    return n * replicas


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--dupheavy"]
    if "--dupheavy" in sys.argv[1:]:
        out_dir = args[0] if args else "/tmp/dupheavy"
        replicas = int(args[1]) if len(args) > 1 else 4
        os.makedirs(out_dir, exist_ok=True)
        nd = build_dupheavy_documents(out_dir, replicas)
        print(f"wrote {nd} documents ({replicas}x verbatim replicas) to {out_dir}")
        return 0
    out_dir = args[0] if args else "/tmp/scale100"
    replicas = int(args[1]) if len(args) > 1 else 100
    os.makedirs(out_dir, exist_ok=True)
    nd = build_documents(out_dir, replicas)
    ne = build_embeddings(out_dir, replicas)
    print(f"wrote {nd} documents, {ne} embeddings to {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Training-data preparation operators: chunk packing, PII redaction,
deterministic corpus sharding, and TF-IDF term extraction.

These extend the LLM-pipeline surface (SURVEY.md round brief) beyond
dedup/quality/decontamination: the ops a corpus needs AFTER cleaning to
become training input — fixed-size example packing, PII scrubbing, a
deterministic global shuffle into shards, and salient-term extraction.

Reference analog: the reference preprocesses per-row strings in pandas
(`novel_check_utils.py` normalization, `app.py` CSV chunking); none of it is
distributed. Everything here is a vectorized Arrow batch transform; the only
all-to-all exchanges are the word-DF combiner groupby (TF-IDF) and the
shard sort, both documented below.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..core.schema import MAX_N_TOK_DEFAULT
from .text import _docs, _split_words

# --------------------------------------------------------------------------
# Chunk packing: documents → fixed-size word windows (training examples)
# --------------------------------------------------------------------------

CHUNK_WORDS = 20
CHUNK_STRIDE = 15  # < CHUNK_WORDS → overlapping windows (context carryover)


def _chunk_batch(t: pa.Table, chunk: int, stride: int) -> pa.Table:
    """Pack one batch of documents into word windows, fully vectorized.

    One whitespace split per batch; window extraction is a single gather
    (`flat.take`) driven by numpy range arithmetic — overlapping windows
    (stride < chunk) duplicate flat indices in the gather, so no Python
    loop and no per-row slicing. Per-doc only: embarrassingly parallel,
    no shuffle at any scale.
    """
    texts = pc.fill_null(t.column("text").combine_chunks(), "")
    _, off, flat, lens = _split_words(texts)
    doc_ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    # lens >= 1 always (_split_words maps empty text to the single token "")
    # window count 1 + ceil(max(len - chunk, 0)/stride): windows are emitted
    # until one REACHES the end, so no trailing window is a strict subset of
    # its predecessor (the seq_chunk_windows convention; the old
    # (len-1)//stride + 1 emitted duplicate tail text as extra examples)
    nc = ((np.maximum(lens - chunk, 0) + stride - 1) // stride + 1).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(lens)), nc)
    cum = np.concatenate(([0], np.cumsum(nc)))
    chunk_id = np.arange(cum[-1], dtype=np.int64) - cum[doc_idx]
    starts = off[doc_idx] + chunk_id * stride
    ends = np.minimum(starts + chunk, off[doc_idx] + lens[doc_idx])
    clen = ends - starts
    ccum = np.concatenate(([0], np.cumsum(clen)))
    # vectorized multi-range arange: index j of window w → starts[w] + j
    intra = np.arange(ccum[-1], dtype=np.int64) - np.repeat(ccum[:-1], clen)
    gather = np.repeat(starts, clen) + intra
    vals = flat.take(pa.array(gather))
    windows = pa.ListArray.from_arrays(pa.array(ccum, type=pa.int32()), vals)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[doc_idx]),
            "chunk_id": pa.array(chunk_id),
            "n_words": pa.array(clen.astype(np.int64)),
            "chunk_text": pc.binary_join(windows, " "),
        }
    )


def doc_chunks(
    sf_dir: str, chunk: int = CHUNK_WORDS, stride: int = CHUNK_STRIDE
) -> rd.Dataset:
    """Sliding-window packing of normalized (lowercased) document words into
    fixed-size training examples: one row per (doc, window)."""
    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        lambda t: _chunk_batch(t, chunk, stride), batch_format="pyarrow"
    )


# --------------------------------------------------------------------------
# PII extraction + redaction
# --------------------------------------------------------------------------

# RE2-compatible (pyarrow and DuckDB both run RE2, so engine and oracle see
# identical match semantics)
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b555-\d{3}-\d{4}\b"


def pii_scrub_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Count and redact PII-shaped spans (emails, IPv4, NANP 555 phones) in
    one vectorized pass. Replacement order is email → ip → phone and is part
    of the operator contract (mirrored in the SQL oracle)."""
    texts = pc.fill_null(t.column(text_col).combine_chunks(), "")
    n_email = pc.count_substring_regex(texts, PII_EMAIL)
    n_ip = pc.count_substring_regex(texts, PII_IP)
    n_phone = pc.count_substring_regex(texts, PII_PHONE)
    red = pc.replace_substring_regex(texts, PII_EMAIL, "<EMAIL>")
    red = pc.replace_substring_regex(red, PII_IP, "<IP>")
    red = pc.replace_substring_regex(red, PII_PHONE, "<PHONE>")
    cols = {c: t.column(c) for c in t.column_names if c != text_col}
    cols.update(
        {
            "n_email": pc.cast(n_email, pa.int64()),
            "n_ip": pc.cast(n_ip, pa.int64()),
            "n_phone": pc.cast(n_phone, pa.int64()),
            "redacted_text": red,
        }
    )
    return pa.table(cols)


def _augment_pii(t: pa.Table) -> pa.Table:
    """Deterministically inject PII-shaped spans keyed on doc_id (the fixture
    corpus contains none, which would make the redaction check vacuous —
    ADVICE r1 'vacuously green' lesson). The same expression is reproduced
    in the SQL oracle, so both engines scrub identical inputs."""
    ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    texts = pc.fill_null(t.column("text").combine_chunks(), "")

    def s(x: np.ndarray) -> pa.Array:
        return pc.cast(pa.array(x), pa.string())

    email = pc.binary_join_element_wise(
        pa.array(np.where(ids % 3 == 0, " contact user", "")),
        pc.if_else(pa.array(ids % 3 == 0), s(ids), pa.scalar("")),
        pa.array(np.where(ids % 3 == 0, "@example.com", "")),
        "",
    )
    ip = pc.binary_join_element_wise(
        pa.array(np.where(ids % 5 == 0, " from 10.", "")),
        pc.if_else(pa.array(ids % 5 == 0), s(ids % 256), pa.scalar("")),
        pa.array(np.where(ids % 5 == 0, ".0.", "")),
        pc.if_else(pa.array(ids % 5 == 0), s(ids % 100), pa.scalar("")),
        "",
    )
    phone = pc.binary_join_element_wise(
        pa.array(np.where(ids % 7 == 0, " call 555-", "")),
        pc.if_else(pa.array(ids % 7 == 0), s(100 + ids % 900), pa.scalar("")),
        pa.array(np.where(ids % 7 == 0, "-", "")),
        pc.if_else(pa.array(ids % 7 == 0), s(1000 + ids % 9000), pa.scalar("")),
        "",
    )
    aug = pc.binary_join_element_wise(texts, email, ip, phone, "")
    return pa.table({"doc_id": t.column("doc_id"), "text": aug})


def doc_pii_redact(sf_dir: str) -> rd.Dataset:
    """Driver query: PII scrub over the deterministically-augmented corpus
    (augment → count → redact, one fused batch pass)."""
    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        lambda t: pii_scrub_batch(_augment_pii(t)), batch_format="pyarrow"
    )


# --------------------------------------------------------------------------
# Deterministic corpus sharding (the 100 TB global shuffle)
# --------------------------------------------------------------------------

SHARD_MULT1 = 2654435761  # Knuth multiplicative (2^32 / phi)
SHARD_MULT2 = 2246822519
SHARD_ADD2 = 3266489917
_M32 = np.uint64(2**32)
N_SHARDS = 16


def _shard_cols(ids: np.ndarray, n_shards: int) -> tuple[np.ndarray, np.ndarray]:
    """Two rounds of 32-bit multiplicative hashing → (shard, shuffle_key).

    Pure modular arithmetic (no xxhash) so the SQL oracle reproduces it
    exactly with HUGEINT ops; quality is ample for load-balancing shards.
    """
    with np.errstate(over="ignore"):
        k1 = (ids.astype(np.uint64) * np.uint64(SHARD_MULT1)) % _M32
        k2 = (k1 * np.uint64(SHARD_MULT2) + np.uint64(SHARD_ADD2)) % _M32
    return (k1 % np.uint64(n_shards)).astype(np.int64), k2.astype(np.int64)


def _shard_batch(t: pa.Table, n_shards: int) -> pa.Table:
    ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    shard, key = _shard_cols(ids, n_shards)
    return t.append_column("shard", pa.array(shard)).append_column(
        "shuffle_key", pa.array(key)
    )


def doc_shard_assign(sf_dir: str, n_shards: int = N_SHARDS) -> rd.Dataset:
    """Shard + within-shard order assignment (the metadata half of
    `shard_corpus`, exposed as an oracle-checkable query)."""
    return _docs(sf_dir, columns=["doc_id"]).map_batches(
        lambda t: _shard_batch(t, n_shards), batch_format="pyarrow"
    )


def shard_corpus(
    sf_dir: str, out_dir: str, n_shards: int = N_SHARDS
) -> rd.Dataset:
    """Deterministic global shuffle of the corpus into training shards.

    `random_shuffle()` at 100 TB materializes every block AND is seed-stable
    only for a fixed block structure; hashing doc_id instead gives the same
    statistical mixing with (a) one explainable all-to-all (the sort), (b)
    bit-identical output for ANY input partitioning, and (c) resumability —
    a re-run reproduces the exact shard contents, so finished shard
    partitions can be skipped. Output is `shard=k/` parquet, rows within a
    shard ordered by (shuffle_key, doc_id).
    """
    import json
    import os

    from ..core.collect import reset_incomplete_sink

    marker = os.path.join(out_dir, "_SHARDS_SUCCESS.json")
    if reset_incomplete_sink(out_dir, marker):
        return rd.read_parquet(out_dir)
    ds = (
        _docs(sf_dir)
        .map_batches(lambda t: _shard_batch(t, n_shards), batch_format="pyarrow")
        .sort(["shard", "shuffle_key", "doc_id"])
    )
    ds.write_parquet(out_dir, partition_cols=["shard"])
    with open(marker, "w") as f:
        json.dump({"n_shards": n_shards}, f)
    return rd.read_parquet(out_dir)


# --------------------------------------------------------------------------
# Greedy example packing (first-fit docs into fixed token-budget examples)
# --------------------------------------------------------------------------

PACK_BUDGET = 160  # words per packed training example


def _pack_plan(lens: np.ndarray, budget: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Greedy first-fit-in-order packing of ``lens`` into ``budget``-sized
    bins: each pack takes consecutive docs while the running total stays
    ≤ budget, always at least one doc (an oversize doc sits alone).

    Boundaries advance by galloping `searchsorted` over the prefix-sum —
    O(packs) iterations of O(log n), not O(docs) Python steps; with ~B/avg
    docs per pack the loop is ~10× shorter than the row count, and it runs
    once per shard inside a map_groups task, never on the driver.

    Returns (pack_id, pack_pos, tok_offset) per doc, in input order.
    """
    n = len(lens)
    S = np.concatenate(([0], np.cumsum(lens, dtype=np.int64)))
    bounds = [0]
    i = 0
    while i < n:
        j = int(np.searchsorted(S, S[i] + budget, side="right")) - 1
        j = max(j, i + 1)
        bounds.append(j)
        i = j
    b = np.asarray(bounds, dtype=np.int64)
    sizes = np.diff(b)
    pack_id = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
    starts = np.repeat(b[:-1], sizes)
    pack_pos = np.arange(n, dtype=np.int64) - starts
    tok_offset = S[:-1] - S[starts]
    return pack_id, pack_pos, tok_offset


def doc_pack_examples(
    sf_dir: str, budget: int = PACK_BUDGET, n_shards: int = N_SHARDS
) -> rd.Dataset:
    """Greedy sequence packing: docs → fixed token-budget training examples.

    The metadata half of example packing (the design that survives 100 TB):
    pass 1 reduces each doc to a 32-byte row (doc_id, shard, shuffle_key,
    n_words) — payload text never shuffles; the per-shard greedy walk runs
    in a `groupby(shard).map_groups` over n_shards chunky groups (each task
    sorts its shard by (shuffle_key, doc_id) and emits the pack plan). The
    actual token gather happens at read time from the plan. Packing is
    inherently sequential WITHIN a shard, so scale-out is by `n_shards`
    (pick shards so one shard's metadata fits a worker: 16 here, ~64k at
    10^12 docs); cross-shard it is embarrassingly parallel.

    Reference analog: the reference has no packing (per-row LLM calls,
    `app.py:986`); this is the training-data op the round brief adds.
    """

    def meta(t: pa.Table) -> pa.Table:
        texts = pc.fill_null(t.column("text").combine_chunks(), "")
        _, _, _, lens = _split_words(texts)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        shard, key = _shard_cols(ids, n_shards)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "shard": pa.array(shard),
                "shuffle_key": pa.array(key),
                "n_words": pa.array(lens.astype(np.int64)),
            }
        )

    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "shard": pa.array([], type=pa.int64()),
            "pack_id": pa.array([], type=pa.int64()),
            "pack_pos": pa.array([], type=pa.int64()),
            "tok_offset": pa.array([], type=pa.int64()),
            "n_words": pa.array([], type=pa.int64()),
        }
    )

    def pack_group(t: pa.Table) -> pa.Table:
        # Ray can hand map_groups a zero-row (even zero-column) block for
        # empty partitions — return the typed empty table so schemas union
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return empty
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        key = t.column("shuffle_key").to_numpy(zero_copy_only=False)
        lens = t.column("n_words").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, key))  # shuffle_key primary, doc_id tiebreak
        ids, key, lens = ids[order], key[order], lens[order]
        pack_id, pack_pos, tok_offset = _pack_plan(lens, budget)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "shard": t.column("shard").take(pa.array(order)),
                "pack_id": pa.array(pack_id),
                "pack_pos": pa.array(pack_pos),
                "tok_offset": pa.array(tok_offset),
                "n_words": pa.array(lens),
            }
        )

    return (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(meta, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(pack_group, batch_format="pyarrow")
    )


# --------------------------------------------------------------------------
# TF-IDF salient terms
# --------------------------------------------------------------------------

TFIDF_K = 5
TFIDF_MIN_DF = 2


def _df_partial(t: pa.Table) -> pa.Table:
    """Per-batch word document-frequency partial: distinct (doc, word) then
    count per word — two Arrow hash-group_bys, exact on strings (no 64-bit
    collision risk, unlike hashing then counting). Docs never span batches,
    so per-batch distinct composes exactly under the global sum."""
    texts = pc.fill_null(t.column("text").combine_chunks(), "")
    _, off, flat, lens = _split_words(texts)
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    dd = pa.table({"d": doc_idx, "word": flat}).group_by(["d", "word"]).aggregate([])
    out = dd.group_by("word").aggregate([("d", "count")])
    return pa.table(
        {
            "word": out.column("word"),
            "df_partial": pc.cast(out.column("d_count"), pa.int64()),
        }
    )


def build_df_table(
    ds: rd.Dataset, min_df: int = TFIDF_MIN_DF
) -> tuple[np.ndarray, np.ndarray]:
    """Corpus word document frequencies → (sorted vocab, df) arrays.

    Only (word, partial_count) combiner rows leave the map stage — one row
    per distinct word per batch, never corpus-sized. The merge is DRIVER-side
    (one Arrow group_by over blocks×vocab rows): measured 4.9 s cheaper than
    Ray's hash-aggregate operator at this key count (fixed operator overhead
    dominates tiny groupbys — BASELINE.md pathology list). The result is a
    VOCABULARY: bounded by language, further trimmed by min_df; at 100 TB cap
    partials to the top-V words by count and merge via the tree reduce
    instead.
    """
    partials = ds.map_batches(_df_partial, batch_format="pyarrow")
    batches = list(partials.iter_batches(batch_format="pyarrow"))
    if not batches:
        return np.zeros(0, dtype=object), np.zeros(0, dtype=np.int64)
    tbl = pa.concat_tables(batches)
    agg = tbl.group_by("word").aggregate([("df_partial", "sum")])
    vocab = np.asarray(agg.column("word").to_numpy(zero_copy_only=False), dtype=object)
    df = agg.column("df_partial_sum").to_numpy(zero_copy_only=False).astype(np.int64)
    keep = df >= min_df
    vocab, df = vocab[keep], df[keep]
    order = np.argsort(vocab)
    return vocab[order], df[order]


def doc_tfidf_topk(
    sf_dir: str, k: int = TFIDF_K, min_df: int = TFIDF_MIN_DF
) -> rd.Dataset:
    """Top-k TF-IDF terms per document.

    Two passes: (1) DF combiner groupby builds the vocabulary, broadcast
    once via ray.put; (2) per-batch scoring — searchsorted vocab lookup,
    lexsort+reduceat per-doc counts, vectorized per-doc top-k. Score is
    (count/n_words) * ln(N/df), ops mirrored in the SQL oracle op-for-op.
    """
    from ..core.rounding import round_half_away

    ds = _docs(sf_dir, columns=["doc_id", "text"])
    n_docs = ds.count()
    vocab, df = build_df_table(ds, min_df)
    # DuckDB's ln differs from numpy's log by 1 ulp on ~30% of inputs
    # (measured); grid-align idf to 9 decimals (half-away, mirroring DuckDB
    # round) so the engine/oracle product is bit-exact
    idf = round_half_away(np.log(float(n_docs) / df), 9)
    state_ref = ray.put((vocab, idf))

    def score(t: pa.Table, _cache={}) -> pa.Table:
        st = _cache.get("st")
        if st is None:
            st = _cache["st"] = ray.get(state_ref)
        vocab, idf = st
        V = len(vocab)
        texts = pc.fill_null(t.column("text").combine_chunks(), "")
        _, off, flat, lens = _split_words(texts)
        doc_ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        words = np.asarray(flat.to_numpy(zero_copy_only=False), dtype=object)
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        pos = np.searchsorted(vocab, words)
        pos_c = np.minimum(pos, V - 1) if V else pos
        valid = (pos < V) & (vocab[pos_c] == words) if V else np.zeros(len(words), bool)
        key = doc_idx[valid] * V + pos_c[valid]
        uk, cnt = np.unique(key, return_counts=True)
        d, p = uk // V, uk % V
        sc = (cnt / lens[d]) * idf[p]
        # (doc asc, score desc, term asc) — last key in lexsort is primary
        order = np.lexsort((vocab[p], -sc, d))
        d, p, sc = d[order], p[order], sc[order]
        # rank within doc, then keep rank <= k
        starts = np.flatnonzero(np.diff(d, prepend=-1))
        rank = np.arange(len(d)) - np.repeat(starts, np.diff(np.append(starts, len(d)))) + 1
        m = rank <= k
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[d[m]]),
                "term": pa.array(list(vocab[p[m]]), type=pa.string()),
                "rank": pa.array(rank[m].astype(np.int64)),
                "score": pa.array(sc[m]),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Bigram-LM quality scoring (CCNet-style perplexity proxy)
# --------------------------------------------------------------------------

LM_REF_MOD = 11  # reference slice: doc_id % LM_REF_MOD == 0


_LM_DRIVER_MERGE_CAP = 2_000_000  # partial rows above which the LM merge
# happens in-Dataset (distributed groupby Sum) instead of driver-side


def build_bigram_lm(
    sf_dir: str, ref_mod: int = LM_REF_MOD, *, distributed: "bool | None" = None
):
    """Train a word-bigram LM on the reference slice (CCNet trains KenLM on
    Wikipedia; this is the no-model-container analog with exact SQL parity).

    ONE fused pass over the corpus: each batch filters to the reference
    slice, splits once, and emits BOTH bigram-count partials and the
    distinct-word rows needed for the smoothing denominator (tagged by
    `kind`) — Arrow kernels only, no per-row loops.

    Partial-merge policy (VERDICT r4 item 5 — a 100× reference slice must
    not become a driver hotspot): the partial stream is materialized and
    counted; under ``_LM_DRIVER_MERGE_CAP`` total partial rows the merge is
    ONE driver-side Arrow group_by (measured ~5 s cheaper than Ray's
    hash-aggregate operator at tiny key counts — BASELINE.md pathology
    list); above it the partials reduce through a distributed
    ``groupby(kind, key).Sum`` so the driver receives each DISTINCT
    vocab/bigram key exactly once (the merged LM — which must fit driver
    memory regardless, since it is broadcast) instead of O(blocks) per-key
    partial copies.  ``distributed`` forces either path; both are pinned
    identical by test.  The model is a REFERENCE-slice vocabulary (bounded
    by language, not corpus size); at 100 TB trim to the top-M bigrams by
    count before broadcast.

    Returns (vocab_size, w1 sorted, c1, bigram sorted, c2) where c1(w1) is
    the count of reference bigrams starting with w1 (derived from the bigram
    table — no second shuffle).
    """
    empty = pa.table(
        {
            "kind": pa.array([], type=pa.int64()),
            "key": pa.array([], type=pa.string()),
            "cnt": pa.array([], type=pa.int64()),
        }
    )

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        t = t.filter(pa.array(ids % ref_mod == 0))
        if t.num_rows == 0:
            return empty
        texts = pc.fill_null(t.column("text").combine_chunks(), "")
        _, off, flat, lens = _split_words(texts)
        doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
        n = len(doc_idx)
        keep = np.zeros(max(n - 1, 0), dtype=bool)
        if n > 1:
            keep = doc_idx[:-1] == doc_idx[1:]
        bg = pc.binary_join_element_wise(
            flat.slice(0, max(n - 1, 0)), flat.slice(1, max(n - 1, 0)), " "
        ).filter(pa.array(keep))
        bcnt = (
            pa.table({"key": bg, "one": pa.array(np.ones(len(bg), dtype=np.int64))})
            .group_by("key")
            .aggregate([("one", "sum")])
        )
        words = pc.unique(flat)
        return pa.table(
            {
                "kind": pa.array(
                    np.concatenate(
                        [np.ones(bcnt.num_rows, np.int64), np.zeros(len(words), np.int64)]
                    )
                ),
                "key": pa.concat_arrays(
                    [bcnt.column("key").combine_chunks().cast(pa.string()), words.cast(pa.string())]
                ),
                "cnt": pa.concat_arrays(
                    [
                        bcnt.column("one_sum").combine_chunks().cast(pa.int64()),
                        pa.array(np.ones(len(words), dtype=np.int64)),
                    ]
                ),
            }
        )

    partials = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    pm = partials.materialize()
    if distributed is None:
        distributed = pm.count() > _LM_DRIVER_MERGE_CAP
    if distributed:
        from ray.data.aggregate import Sum

        merged = pm.groupby(["kind", "key"]).aggregate(Sum("cnt", alias_name="cnt"))
        tbl = pa.concat_tables(
            [
                b.select(["kind", "key", "cnt"]).replace_schema_metadata(None)
                for b in merged.iter_batches(batch_format="pyarrow")
                if b.num_rows and "key" in b.column_names
            ]
            or [empty]
        )
    else:
        tbl = pa.concat_tables(
            [b for b in pm.iter_batches(batch_format="pyarrow")] or [empty]
        )
    is_bg = pc.equal(tbl.column("kind"), 1)
    bag = tbl.filter(is_bg).group_by("key").aggregate([("cnt", "sum")])
    bigrams = np.asarray(bag.column("key").to_numpy(zero_copy_only=False), dtype=object)
    c2 = bag.column("cnt_sum").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(bigrams)
    bigrams, c2 = bigrams[order], c2[order]
    # context counts derived driver-side (words contain no spaces)
    w1_all = np.array([b.split(" ", 1)[0] for b in bigrams], dtype=object)
    w1, inv = np.unique(w1_all, return_inverse=True)
    c1 = np.zeros(len(w1), dtype=np.int64)
    np.add.at(c1, inv, c2)
    V = len(pc.unique(tbl.filter(pc.invert(is_bg)).column("key")))
    if V == 0:
        raise ValueError(f"empty LM reference slice (doc_id % {ref_mod} == 0)")
    return V, w1, c1, bigrams, c2


def doc_lm_score(sf_dir: str, ref_mod: int = LM_REF_MOD) -> rd.Dataset:
    """Per-doc add-one-smoothed bigram cross-entropy against the reference
    LM: P(w2|w1) = (c2+1)/(c1+V).

    Float-parity design: each bigram's -log2 p is quantized to integer
    MILLIBITS (half-away, mirroring DuckDB round) so the per-doc total is an
    ORDER-INDEPENDENT integer sum — exact under any execution order in both
    engines; bits_per_bigram is then a single mirrored division.
    """
    from ..core.rounding import round_half_away

    V, w1, c1, bigrams, c2 = build_bigram_lm(sf_dir, ref_mod)
    state_ref = ray.put((V, w1, c1, bigrams, c2))

    def score(t: pa.Table, _cache={}) -> pa.Table:
        st = _cache.get("st")
        if st is None:
            st = _cache["st"] = ray.get(state_ref)
        V, w1, c1, bigrams, c2 = st
        texts = pc.fill_null(t.column("text").combine_chunks(), "")
        _, off, flat, lens = _split_words(texts)
        doc_ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n_docs = len(doc_ids)
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        n = len(doc_idx)
        keep = np.zeros(n, dtype=bool)
        if n > 1:
            keep[:-1] = doc_idx[:-1] == doc_idx[1:]
        d = doc_idx[keep]
        # bigram strings built with one Arrow kernel over shifted slices —
        # no per-row concat loop (hot-path rule)
        keep_arr = pa.array(keep[:-1]) if n > 1 else pa.array([], type=pa.bool_())
        bg_all = (
            pc.binary_join_element_wise(flat.slice(0, n - 1), flat.slice(1, n - 1), " ")
            if n > 1
            else pa.array([], type=pa.string())
        )
        bg = np.asarray(bg_all.filter(keep_arr).to_numpy(zero_copy_only=False), dtype=object)
        first = np.asarray(
            flat.slice(0, max(n - 1, 0)).filter(keep_arr).to_numpy(zero_copy_only=False),
            dtype=object,
        )

        def lookup(keys, sorted_keys, vals):
            if len(sorted_keys) == 0 or len(keys) == 0:
                return np.zeros(len(keys), dtype=np.int64)
            pos = np.searchsorted(sorted_keys, keys)
            pos_c = np.minimum(pos, len(sorted_keys) - 1)
            hit = (pos < len(sorted_keys)) & (sorted_keys[pos_c] == keys)
            return np.where(hit, vals[pos_c], 0)

        cc2 = lookup(bg, bigrams, c2)
        cc1 = lookup(first, w1, c1)
        mb = round_half_away(
            -np.log2((cc2 + 1) * 1.0 / (cc1 + V)) * 1000, 0
        ).astype(np.int64)
        tot = np.zeros(n_docs, dtype=np.int64)
        cntb = np.zeros(n_docs, dtype=np.int64)
        np.add.at(tot, d, mb)
        np.add.at(cntb, d, 1)
        bits = np.where(cntb > 0, (tot * 1.0) / (1000.0 * np.maximum(cntb, 1)), np.nan)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids),
                "n_bigrams": pa.array(cntb),
                "total_millibits": pa.array(tot),
                "bits_per_bigram": pa.array(
                    [None if c == 0 else float(b) for c, b in zip(cntb, bits)],
                    type=pa.float64(),
                ),
            }
        )

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


# --------------------------------------------------------------------------
# Deterministic source-mixture sampling
# --------------------------------------------------------------------------

MIXTURE_WEIGHTS = {
    "src0": 1.0,
    "src1": 0.75,
    "src2": 0.5,
    "src3": 0.25,
}
MIXTURE_DEFAULT = 0.1
_MIX_DENOM = 10_000


def corpus_mixture_sample(
    sf_dir: str, weights: dict[str, float] | None = None
) -> rd.Dataset:
    """Deterministic per-source downsampling to a target domain mixture
    (the 'domain reweighting' step of corpus assembly): keep doc iff
    hash32(doc_id) % 10000 < weight[source]*10000. Per-row arithmetic only —
    no shuffle, reproducible under any partitioning, exact SQL mirror.
    """
    w = MIXTURE_WEIGHTS if weights is None else weights
    thresholds = {s: int(round(v * _MIX_DENOM)) for s, v in w.items()}
    default_thr = int(round(MIXTURE_DEFAULT * _MIX_DENOM))

    def pick(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            bucket = (
                (ids.astype(np.uint64) * np.uint64(SHARD_MULT1)) % _M32
            ) % np.uint64(_MIX_DENOM)
        src = t.column("source").to_numpy(zero_copy_only=False)
        thr = np.array([thresholds.get(s, default_thr) for s in src], dtype=np.uint64)
        return t.filter(pa.array(bucket < thr))

    return _docs(sf_dir).map_batches(pick, batch_format="pyarrow")


# --------------------------------------------------------------------------
# End-to-end corpus assembly (the capstone composition)
# --------------------------------------------------------------------------


def prepare_training_corpus(
    sf_dir: str,
    out_dir: str | None = None,
    *,
    n_shards: int = N_SHARDS,
    chunk: int = CHUNK_WORDS,
    stride: int = CHUNK_STRIDE,
    weights: dict[str, float] | None = None,
) -> rd.Dataset:
    """The full corpus-assembly flow, every stage exact and SQL-expressible:

      clean (exact dedup → benchmark holdout → decontamination → Gopher)
      → domain mixture downsampling (deterministic hash threshold)
      → shard assignment (deterministic global shuffle)
      → sliding-window chunk packing (training examples)

    The cleaning drop-state is broadcast once; everything after it is ONE
    fused batch pass over a single corpus read — per-row arithmetic and one
    word split feed cleaning, mixture, shard and chunking, and document
    payloads are never shuffled (the optional output sort by shard is the
    only all-to-all, and it moves final chunks, not intermediate state).
    """
    from .text import DECON_BENCH_MOD, DECON_NGRAM, clean_full_filter_batch, clean_full_state_ref

    w = MIXTURE_WEIGHTS if weights is None else weights
    thresholds = {s: int(round(v * _MIX_DENOM)) for s, v in w.items()}
    default_thr = int(round(MIXTURE_DEFAULT * _MIX_DENOM))
    state_ref, losers_ds = clean_full_state_ref(sf_dir, DECON_NGRAM, DECON_BENCH_MOD)

    def assemble(t: pa.Table, _cache={}) -> pa.Table:
        t = clean_full_filter_batch(t, state_ref, DECON_NGRAM, DECON_BENCH_MOD, _cache)
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "chunk_id": pa.array([], type=pa.int64()),
                "n_words": pa.array([], type=pa.int64()),
                "chunk_text": pa.array([], type=pa.string()),
                "shard": pa.array([], type=pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            bucket = (
                (ids.astype(np.uint64) * np.uint64(SHARD_MULT1)) % _M32
            ) % np.uint64(_MIX_DENOM)
        src = t.column("source").to_numpy(zero_copy_only=False)
        thr = np.array([thresholds.get(s, default_thr) for s in src], dtype=np.uint64)
        t = t.filter(pa.array(bucket < thr))
        if t.num_rows == 0:
            return empty
        chunks = _chunk_batch(t, chunk, stride)
        cids = chunks.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        shard, _ = _shard_cols(cids, n_shards)
        return chunks.append_column("shard", pa.array(shard))

    base = _docs(sf_dir)
    if losers_ds is not None:
        # loser set over the broadcast cap: anti-join in front of the fused
        # pass (see clean_full_state_ref) — the drop never hits the driver
        from ..core.joins import semi_join

        base = semi_join(base, "doc_id", losers_ds, "doc_id", anti=True)
    out = base.map_batches(assemble, batch_format="pyarrow")
    if out_dir is not None:
        import json
        import os

        from ..core.collect import reset_incomplete_sink

        marker = os.path.join(out_dir, "_CORPUS_SUCCESS.json")
        if reset_incomplete_sink(out_dir, marker):
            return rd.read_parquet(out_dir)
        out.sort(["shard", "doc_id", "chunk_id"]).write_parquet(
            out_dir, partition_cols=["shard"]
        )
        with open(marker, "w") as f:
            json.dump({"n_shards": n_shards, "chunk": chunk, "stride": stride}, f)
        return rd.read_parquet(out_dir)
    return out


# --------------------------------------------------------------------------
# Greedy packing over the PRE-TOKENIZED sequences table (the north-star
# input: doc_id:string, tokens:list<int32>, n_tok:int32, source:string)
# --------------------------------------------------------------------------

SEQ_PACK_BUDGET = 4096  # tokens per packed training example
SEQ_PACK_SHARDS = 256  # one shard's metadata must fit a worker at 10^12 rows


def seq_pack_plan(
    sf_dir: str, budget: int = SEQ_PACK_BUDGET, n_shards: int = SEQ_PACK_SHARDS
) -> rd.Dataset:
    """``doc_pack_examples`` applied to the actual training-sequence table:
    greedy first-fit of VALID sequences (non-null doc_id, 1 ≤ n_tok ≤ 2048)
    into ``budget``-token examples, keyed by the numeric doc_id suffix.

    Reads only (doc_id, n_tok) — the token payload column never leaves
    storage; at 10^12 sequences the whole plan is 40 B/row of metadata.
    Within-shard order is (shuffle_key, doc_num, n_tok): doc_num ties are
    injected duplicate doc_ids, and the extra n_tok key makes the walk
    order (hence the output multiset) deterministic under them.
    """
    from .seq_queries import _seq_ds

    def meta(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").combine_chunks()
        ntok = t.column("n_tok").combine_chunks()
        valid = pc.and_(
            pc.is_valid(ids),
            pc.and_(
                pc.is_valid(ntok),
                pc.and_(
                    pc.greater_equal(ntok, 1),
                    pc.less_equal(ntok, MAX_N_TOK_DEFAULT),
                ),
            ),
        )
        t = pa.table({"doc_id": ids, "n_tok": ntok}).filter(valid)
        from .tokens import _doc_num

        num = _doc_num(t.column("doc_id"))
        shard, key = _shard_cols(num, n_shards)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "doc_num": pa.array(num),
                "shard": pa.array(shard),
                "shuffle_key": pa.array(key),
                "n_tok": pc.cast(t.column("n_tok"), pa.int64()),
            }
        )

    meta_ds = _seq_ds(sf_dir, columns=["doc_id", "n_tok"]).map_batches(
        meta, batch_format="pyarrow"
    )
    # shard→walk via the raw-task tree (state/dupfinder pattern), NOT
    # groupby().map_groups: Ray's Sort operator cost ~7 s of an 8.9 s wall
    # at 800k rows (measured; the 256 chunky groups themselves are fine) —
    # a map-split by shard range + one vectorized reduce per range is the
    # same exchange with two task waves
    bundles = list(meta_ds.iter_internal_ref_bundles())
    block_refs = [ref for b in bundles for ref in b.block_refs]
    if not block_refs:
        return rd.from_arrow([_SEQ_PACK_EMPTY])
    from ..core.salting import cluster_range_count

    ranges = cluster_range_count(n_shards)
    per = 8
    mapped = [
        _seq_pack_split.options(num_returns=ranges).remote(
            block_refs[i : i + per], ranges, n_shards
        )
        for i in range(0, len(block_refs), per)
    ]
    tables = [
        _seq_pack_reduce.remote(budget, *[m[r] for m in mapped]) for r in range(ranges)
    ]
    return rd.from_arrow_refs(tables)


_SEQ_PACK_EMPTY = pa.table(
    {
        "doc_id": pa.array([], type=pa.string()),
        "shard": pa.array([], type=pa.int64()),
        "pack_id": pa.array([], type=pa.int64()),
        "pack_pos": pa.array([], type=pa.int64()),
        "tok_offset": pa.array([], type=pa.int64()),
        "n_tok": pa.array([], type=pa.int64()),
    }
)


@ray.remote
def _seq_pack_split(block_refs: list, ranges: int, n_shards: int):
    """Map task: split meta blocks into contiguous shard ranges
    (``num_returns=ranges``); a shard's rows all land in one range."""
    blocks = ray.get(list(block_refs))
    tables = [b if isinstance(b, pa.Table) else pa.Table.from_batches([b]) for b in blocks]
    tables = [x for x in tables if x.num_rows > 0]
    if not tables:
        return tuple(None for _ in range(ranges)) if ranges > 1 else None
    t = pa.concat_tables(tables) if len(tables) > 1 else tables[0]
    shard = t.column("shard").to_numpy(zero_copy_only=False)
    width = -(-n_shards // ranges)  # ceil: shard // width ∈ [0, ranges)
    order = np.argsort(shard, kind="stable")
    bounds = np.searchsorted(shard[order], np.arange(1, ranges) * width)
    parts = []
    for lo, hi in zip(np.r_[0, bounds], np.r_[bounds, len(order)]):
        parts.append(t.take(pa.array(order[lo:hi])) if hi > lo else None)
    return tuple(parts) if ranges > 1 else parts[0]


@ray.remote
def _seq_pack_reduce(budget: int, *parts) -> pa.Table:
    """Reduce task: sort one shard range by (shard, shuffle_key, doc_num,
    n_tok) and run the greedy walk per shard segment."""
    tables = [p for p in parts if p is not None]
    if not tables:
        return _SEQ_PACK_EMPTY
    t = pa.concat_tables(tables) if len(tables) > 1 else tables[0]
    shard = t.column("shard").to_numpy(zero_copy_only=False)
    num = t.column("doc_num").to_numpy(zero_copy_only=False)
    key = t.column("shuffle_key").to_numpy(zero_copy_only=False)
    lens = t.column("n_tok").to_numpy(zero_copy_only=False)
    order = np.lexsort((lens, num, key, shard))
    shard, lens = shard[order], lens[order]
    new_shard = np.empty(shard.size, dtype=bool)
    new_shard[0] = True
    new_shard[1:] = shard[1:] != shard[:-1]
    seg_starts = np.r_[np.flatnonzero(new_shard), shard.size]
    pid = np.empty(shard.size, dtype=np.int64)
    pos = np.empty(shard.size, dtype=np.int64)
    off = np.empty(shard.size, dtype=np.int64)
    for lo, hi in zip(seg_starts[:-1], seg_starts[1:]):
        pid[lo:hi], pos[lo:hi], off[lo:hi] = _pack_plan(lens[lo:hi], budget)
    take = pa.array(order)
    return pa.table(
        {
            "doc_id": t.column("doc_id").take(take),
            "shard": pa.array(shard),
            "pack_id": pa.array(pid),
            "pack_pos": pa.array(pos),
            "tok_offset": pa.array(off),
            "n_tok": pa.array(lens),
        }
    )


# --------------------------------------------------------------------------
# Pack EXECUTION: materialize the packed token arrays (the payload half)
# --------------------------------------------------------------------------

_SEQ_PACKX_SCHEMA = pa.schema(
    [
        ("shard", pa.int64()),
        ("pack_id", pa.int64()),
        ("n_seqs", pa.int64()),
        ("fill", pa.int64()),
        ("tok_sum", pa.int64()),
        ("tok_first", pa.int64()),
        ("tok_last", pa.int64()),
    ]
)


def seq_pack_execute(
    sf_dir: str,
    budget: int = SEQ_PACK_BUDGET,
    n_shards: int = SEQ_PACK_SHARDS,
    with_payload: bool = False,
) -> rd.Dataset:
    """Materialize the packed training examples ``seq_pack_plan`` only PLANS:
    pack members' token arrays concatenated in pack order, one row per pack.

    Unlike the plan (32 B/row metadata), execution must CO-LOCATE pack
    members' payloads — the one unavoidable full-payload exchange in the
    packing story. It reuses the plan's raw-task shard-range split/reduce
    (one exchange, two task waves: the same movement a shuffle would do,
    without the Sort operator's measured ~7 s overhead), so each reduce
    task holds a contiguous shard range, re-derives the greedy walk from
    its local metadata, and emits its packs without any further shuffle.

    Two semantic deltas from the plan, both deliberate:

    - Only CONSISTENT rows pack (``len(tokens) == n_tok`` on top of the
      plan's validity filter): execution uses n_tok as the *cost* of a
      row, which is only honest when it matches the actual array.
    - The within-shard order appends the token array itself as the final
      tiebreak. Plan output is invariant under (doc_id, n_tok)-tie swaps
      (both rows contribute identical plan rows); pack CONTENT is not, so
      ties are resolved by array lexicographic order — mirrored exactly by
      the oracle's ``ORDER BY ..., ptok`` (DuckDB list comparison). Tie
      runs have equal n_tok (hence equal length), so the resolver is one
      ``np.lexsort`` over the stacked (run, n_tok) matrix; runs are
      vanishingly rare at scale (identical suffix+length), cost ~0.

    Default output is the per-pack summary (driver-hashable scalars whose
    values pin the member multiset and concatenation boundaries:
    ``tok_sum`` is content-sensitive, ``tok_first``/``tok_last`` pin the
    edges); ``with_payload=True`` adds the packed ``tokens`` list column —
    built zero-copy from the reduce's already-ordered flat values buffer
    (`ListArray.from_arrays` over pack offsets, no per-pack gather).

    Reference analog: the reference assembles per-row prompt payloads
    before scoring (SURVEY §3); here the assembly is the training-example
    pack itself.
    """
    from .tokens import _tokens_parts  # shared list-column decomposition

    def meta(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").combine_chunks()
        ntok = t.column("n_tok").combine_chunks()
        toks = t.column("tokens")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        tlen = pc.list_value_length(toks)
        valid = pc.and_(
            pc.and_(pc.is_valid(ids), pc.is_valid(ntok)),
            pc.and_(
                pc.and_(
                    pc.greater_equal(ntok, 1),
                    pc.less_equal(ntok, MAX_N_TOK_DEFAULT),
                ),
                pc.equal(pc.cast(tlen, pa.int32()), ntok),
            ),
        )
        valid = pc.fill_null(valid, False)
        t = pa.table({"doc_id": ids, "n_tok": ntok, "tokens": toks}).filter(valid)
        from .tokens import _doc_num

        num = _doc_num(t.column("doc_id"))
        shard, key = _shard_cols(num, n_shards)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "doc_num": pa.array(num),
                "shard": pa.array(shard),
                "shuffle_key": pa.array(key),
                "n_tok": pc.cast(t.column("n_tok"), pa.int64()),
                # large_list NOW so downstream concat/take in the reduce use
                # int64 offsets — a shard range can exceed 2^31 tokens at
                # design scale, where int32 list offsets overflow
                "tokens": pc.cast(t.column("tokens"), pa.large_list(pa.int32())),
            }
        )

    from .seq_queries import _seq_ds

    ds = _seq_ds(sf_dir, columns=["doc_id", "n_tok", "tokens"]).map_batches(
        meta, batch_format="pyarrow"
    )
    bundles = list(ds.iter_internal_ref_bundles())
    block_refs = [ref for b in bundles for ref in b.block_refs]
    empty = (
        _SEQ_PACKX_SCHEMA.append(pa.field("tokens", pa.large_list(pa.int32())))
        if with_payload
        else _SEQ_PACKX_SCHEMA
    ).empty_table()
    if not block_refs:
        return rd.from_arrow([empty])
    from ..core.salting import cluster_range_count

    ranges = cluster_range_count(n_shards)
    per = 8
    mapped = [
        _seq_pack_split.options(num_returns=ranges).remote(
            block_refs[i : i + per], ranges, n_shards
        )
        for i in range(0, len(block_refs), per)
    ]
    tables = [
        _seq_packx_reduce.remote(budget, with_payload, *[m[r] for m in mapped])
        for r in range(ranges)
    ]
    return rd.from_arrow_refs(tables)


def _lex_tie_resolve(
    order: np.ndarray,
    keys: tuple[np.ndarray, ...],
    offs: np.ndarray,
    vals: np.ndarray,
) -> np.ndarray:
    """Stable-reorder ``order`` so rows tied on all ``keys`` are sorted by
    token-array lexicographic order (ties share a length — equal n_tok)."""
    n = order.size
    if n < 2:
        return order
    tie = np.ones(n - 1, dtype=bool)
    for k in keys:
        s = k[order]
        tie &= s[1:] == s[:-1]
    if not tie.any():
        return order
    runs = np.flatnonzero(np.diff(np.r_[False, tie, False].astype(np.int8)))
    out = order.copy()
    for lo, hi in zip(runs[::2], runs[1::2] + 1):
        rows = order[lo:hi]
        L = int(offs[rows[0] + 1] - offs[rows[0]])
        if L == 0:
            continue  # identical empties: any order, output-invariant
        mat = vals[offs[rows][:, None] + np.arange(L, dtype=np.int64)[None, :]]
        out[lo:hi] = rows[np.lexsort(tuple(mat[:, j] for j in range(L - 1, -1, -1)))]
    return out


@ray.remote
def _seq_packx_reduce(budget: int, with_payload: bool, *parts) -> pa.Table:
    """Reduce: order one shard range, run the greedy walk, emit one row per
    pack (summary scalars; optionally the concatenated payload)."""
    from .tokens import _tokens_parts

    tables = [p for p in parts if p is not None]
    base = (
        _SEQ_PACKX_SCHEMA.append(pa.field("tokens", pa.large_list(pa.int32())))
        if with_payload
        else _SEQ_PACKX_SCHEMA
    ).empty_table()
    if not tables:
        return base
    t = pa.concat_tables(tables) if len(tables) > 1 else tables[0]
    if t.num_rows == 0:
        return base
    shard = t.column("shard").to_numpy(zero_copy_only=False)
    num = t.column("doc_num").to_numpy(zero_copy_only=False)
    key = t.column("shuffle_key").to_numpy(zero_copy_only=False)
    lens = t.column("n_tok").to_numpy(zero_copy_only=False)
    offs0, vals0 = _tokens_parts(t.column("tokens"))
    order = np.lexsort((lens, num, key, shard))
    order = _lex_tie_resolve(order, (shard, key, num, lens), offs0, vals0)
    shard, lens = shard[order], lens[order]
    # flat values in FINAL order via Arrow take (C++ list gather rebuilds the
    # child buffer contiguously — no O(total-tokens) int64 index temporaries,
    # which at 10^12-row shard ranges would triple the reduce's footprint)
    taken = t.column("tokens").take(pa.array(order))
    offs_t, flat = _tokens_parts(taken)
    flat = flat[offs_t[0] : offs_t[-1]]
    total = int(lens.sum())
    row_off = np.concatenate(([0], np.cumsum(lens)))
    new_shard = np.empty(shard.size, dtype=bool)
    new_shard[0] = True
    new_shard[1:] = shard[1:] != shard[:-1]
    seg_starts = np.r_[np.flatnonzero(new_shard), shard.size]
    pid = np.empty(shard.size, dtype=np.int64)
    for lo, hi in zip(seg_starts[:-1], seg_starts[1:]):
        pid[lo:hi], _, _ = _pack_plan(lens[lo:hi], budget)
    # pack boundaries: first row of each (shard, pack) run
    newp = np.empty(shard.size, dtype=bool)
    newp[0] = True
    newp[1:] = (shard[1:] != shard[:-1]) | (pid[1:] != pid[:-1])
    p0 = np.flatnonzero(newp)  # first member row of each pack
    pn = np.r_[p0[1:], shard.size]  # one past the last member
    n_seqs = pn - p0
    fill = row_off[pn] - row_off[p0]
    csum = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(flat.astype(np.int64), out=csum[1:])
    tok_sum = csum[row_off[pn]] - csum[row_off[p0]]
    cols = {
        "shard": pa.array(shard[p0]),
        "pack_id": pa.array(pid[p0]),
        "n_seqs": pa.array(n_seqs.astype(np.int64)),
        "fill": pa.array(fill),
        "tok_sum": pa.array(tok_sum),
        "tok_first": pa.array(flat[row_off[p0]].astype(np.int64)),
        "tok_last": pa.array(flat[row_off[pn] - 1].astype(np.int64)),
    }
    if with_payload:
        # large_list: int64 offsets — a shard range can exceed 2^31 tokens
        # at design scale, where int32 list offsets would overflow
        cols["tokens"] = pa.LargeListArray.from_arrays(
            pa.array(np.r_[row_off[p0], total], type=pa.int64()),
            pa.array(flat, type=pa.int32()),
        )
    return pa.table(cols)


# --------------------------------------------------------------------------
# DSIR-style importance-resampling data selection
# --------------------------------------------------------------------------

DSIR_TARGET_MOD = 7  # target-domain slice: doc_id % 7 == 0 (the "Wikipedia")
DSIR_KEEP_NUM = 1  # keep the top keep_num/keep_den of docs by weight
DSIR_KEEP_DEN = 4

def _dual_lm_totals(t: pa.Table, st) -> tuple:
    """Per-doc integer-millibit cross-entropy totals under BOTH LMs in one
    fused pass (single split, two sorted-array lookups): (doc_ids, n_bigrams,
    total_millibits_target, total_millibits_raw).  Shared by
    ``doc_dsir_select`` and the ``select_training_docs`` capstone."""
    from ..core.rounding import round_half_away

    (Vt, w1t, c1t, bgt, c2t), (Vr, w1r, c1r, bgr, c2r) = st
    texts = pc.fill_null(t.column("text").combine_chunks(), "")
    _, off, flat, lens = _split_words(texts)
    doc_ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    n_docs = len(doc_ids)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    n = len(doc_idx)
    keep = np.zeros(n, dtype=bool)
    if n > 1:
        keep[:-1] = doc_idx[:-1] == doc_idx[1:]
    d = doc_idx[keep]
    keep_arr = pa.array(keep[:-1]) if n > 1 else pa.array([], type=pa.bool_())
    bg_all = (
        pc.binary_join_element_wise(flat.slice(0, n - 1), flat.slice(1, n - 1), " ")
        if n > 1
        else pa.array([], type=pa.string())
    )
    bg = np.asarray(bg_all.filter(keep_arr).to_numpy(zero_copy_only=False), dtype=object)
    first = np.asarray(
        flat.slice(0, max(n - 1, 0)).filter(keep_arr).to_numpy(zero_copy_only=False),
        dtype=object,
    )

    def lookup(keys, sorted_keys, vals):
        if len(sorted_keys) == 0 or len(keys) == 0:
            return np.zeros(len(keys), dtype=np.int64)
        pos = np.searchsorted(sorted_keys, keys)
        pos_c = np.minimum(pos, len(sorted_keys) - 1)
        hit = (pos < len(sorted_keys)) & (sorted_keys[pos_c] == keys)
        return np.where(hit, vals[pos_c], 0)

    def millibits(V, w1, c1, bigrams, c2):
        cc2 = lookup(bg, bigrams, c2)
        cc1 = lookup(first, w1, c1)
        return round_half_away(
            -np.log2((cc2 + 1) * 1.0 / (cc1 + V)) * 1000, 0
        ).astype(np.int64)

    mt = millibits(Vt, w1t, c1t, bgt, c2t)
    mr = millibits(Vr, w1r, c1r, bgr, c2r)
    tot_t = np.zeros(n_docs, dtype=np.int64)
    tot_r = np.zeros(n_docs, dtype=np.int64)
    cntb = np.zeros(n_docs, dtype=np.int64)
    np.add.at(tot_t, d, mt)
    np.add.at(tot_r, d, mr)
    np.add.at(cntb, d, 1)
    return doc_ids, cntb, tot_t, tot_r


_DSIR_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_bigrams", pa.int64()),
        ("weight_millibits", pa.int64()),
        ("selected", pa.bool_()),
    ]
)


def doc_dsir_select(
    sf_dir: str,
    target_mod: int = DSIR_TARGET_MOD,
    raw_mod: int = LM_REF_MOD,
    keep_num: int = DSIR_KEEP_NUM,
    keep_den: int = DSIR_KEEP_DEN,
) -> rd.Dataset:
    """DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169 "Data
    Selection for Language Models via Importance Resampling"), made exact
    and oracle-checkable: per-doc importance weight = log p_target(doc) −
    log p_raw(doc) under two add-one-smoothed bigram LMs (the paper's
    hashed-ngram features become exact bigram features — hashing is a
    memory optimization, not a semantic one), and the top
    ceil(n·keep_num/keep_den) docs by (weight DESC, doc_id ASC) are
    selected.  The paper's Gumbel-top-k resampling is replaced by
    deterministic top-k (the same replacement every seeded op in this repo
    makes); weights stay INTEGER MILLIBITS (difference of two
    order-independent integer sums — exact under any execution order in
    both engines, the doc_lm_score contract).

    Output: one verdict row per doc — (doc_id, n_bigrams,
    weight_millibits, selected).

    Scale shape: two reference-slice LM builds (bounded by language, not
    corpus size — build_bigram_lm's contract), ONE fused scoring pass
    (single split, two sorted-array lookups), then the global top-k
    threshold via ``state/orderstats.kth_stats`` — distributed radix
    select, ≤3 histogram passes over the materialized 24-byte/row
    projection, driver holds a 2^16-int histogram, never a value list.
    Tie-break at the threshold weight resolves with a second radix select
    over doc_id WITHIN the tie group, so even a fully-degenerate corpus
    (all weights equal) never ships ids to the driver.

    Reference analog: rule-scored classification → keep/drop routing
    (app.py:1435-1448 verdict aggregation); oracle: two mirrored LM CTEs +
    window rank (see __ray_entry__.oracle_sql).
    """
    from ..state.orderstats import kth_with_tiecut

    lm_t = build_bigram_lm(sf_dir, target_mod)
    lm_r = build_bigram_lm(sf_dir, raw_mod)
    state_ref = ray.put((lm_t, lm_r))

    def score(t: pa.Table, _cache={}) -> pa.Table:
        st = _cache.get("st")
        if st is None:
            st = _cache["st"] = ray.get(state_ref)
        doc_ids, cntb, tot_t, tot_r = _dual_lm_totals(t, st)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids),
                "n_bigrams": pa.array(cntb),
                "weight_millibits": pa.array(tot_r - tot_t),
            }
        )

    scored = (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(score, batch_format="pyarrow")
        .materialize()
    )
    n = scored.count()
    if n == 0:
        return rd.from_arrow(_DSIR_SCHEMA.empty_table())
    k = (n * keep_num + keep_den - 1) // keep_den  # ceil(n·num/den)
    thr, tie_cut = kth_with_tiecut(scored, "weight_millibits", k, descending=True)

    def verdict(t: pa.Table) -> pa.Table:
        w = t.column("weight_millibits").to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        sel = (w > thr) | ((w == thr) & (ids <= tie_cut))
        return t.append_column("selected", pa.array(sel))

    return scored.map_batches(verdict, batch_format="pyarrow")


def dsir_oracle_sql(
    target_mod: int = DSIR_TARGET_MOD,
    raw_mod: int = LM_REF_MOD,
    keep_num: int = DSIR_KEEP_NUM,
    keep_den: int = DSIR_KEEP_DEN,
) -> str:
    """DuckDB oracle for doc_dsir_select: two mirrored add-one bigram-LM
    CTEs (doc_lm_score's oracle shape, parameterized by ref mod), weight =
    raw − target integer millibits, selected = rank ≤ ceil(n·num/den)
    over (weight DESC, doc_id ASC)."""

    def lm(tag: str, mod: int) -> str:
        return f"""
            ref{tag} AS (SELECT ws FROM w WHERE doc_id % {mod} = 0),
            rb{tag} AS (
              SELECT ws[i] AS w1, ws[i+1] AS w2
              FROM ref{tag}, UNNEST(range(1, len(ws))) AS t(i) WHERE len(ws) >= 2
            ),
            cb2{tag} AS (SELECT w1, w2, count(*) AS c FROM rb{tag} GROUP BY w1, w2),
            cb1{tag} AS (SELECT w1, count(*) AS c FROM rb{tag} GROUP BY w1),
            v{tag} AS (
              SELECT count(DISTINCT x) AS vs
              FROM (SELECT unnest(ws) AS x FROM ref{tag}) u
            )"""

    return f"""
            WITH w AS (
              SELECT doc_id,
                     string_split_regex(trim(lower(coalesce(text, ''))), '\\s+') AS ws
              FROM documents
            ),
            {lm('t', target_mod)},
            {lm('r', raw_mod)},
            db AS (
              SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
              FROM w, UNNEST(range(1, len(ws))) AS t(i) WHERE len(ws) >= 2
            ),
            mb AS (
              SELECT d.doc_id,
                     round(-log2((coalesce(c2t.c, 0) + 1) * 1.0
                                 / (coalesce(c1t.c, 0) + vt.vs)) * 1000, 0)::BIGINT AS mt,
                     round(-log2((coalesce(c2r.c, 0) + 1) * 1.0
                                 / (coalesce(c1r.c, 0) + vr.vs)) * 1000, 0)::BIGINT AS mr
              FROM db d
              LEFT JOIN cb2t c2t ON d.w1 = c2t.w1 AND d.w2 = c2t.w2
              LEFT JOIN cb1t c1t ON d.w1 = c1t.w1
              LEFT JOIN cb2r c2r ON d.w1 = c2r.w1 AND d.w2 = c2r.w2
              LEFT JOIN cb1r c1r ON d.w1 = c1r.w1
              CROSS JOIN vt CROSS JOIN vr
            ),
            s AS (
              SELECT doc_id, count(*)::BIGINT AS n,
                     sum(mt)::BIGINT AS tt, sum(mr)::BIGINT AS tr
              FROM mb GROUP BY doc_id
            ),
            base AS (
              SELECT w.doc_id,
                     coalesce(s.n, 0)::BIGINT AS n_bigrams,
                     (coalesce(s.tr, 0) - coalesce(s.tt, 0))::BIGINT AS weight_millibits
              FROM w LEFT JOIN s USING (doc_id)
            ),
            ranked AS (
              SELECT *,
                     row_number() OVER (ORDER BY weight_millibits DESC, doc_id) AS rk,
                     count(*) OVER () AS nn
              FROM base
            )
            SELECT doc_id, n_bigrams, weight_millibits,
                   rk <= (nn * {keep_num} + {keep_den - 1}) // {keep_den} AS selected
            FROM ranked ORDER BY doc_id
    """

# --------------------------------------------------------------------------
# CCNet-style perplexity bucketing (head / middle / tail)
# --------------------------------------------------------------------------

_CCNET_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_bigrams", pa.int64()),
        ("score_ubits", pa.int64()),
        ("bucket", pa.string()),
    ]
)


def doc_ccnet_buckets(sf_dir: str, ref_mod: int = LM_REF_MOD) -> rd.Dataset:
    """CCNet's head/middle/tail split (Wenzek et al. 2020, arXiv:1911.00359
    §3.3): every document bucketed by reference-LM perplexity terciles —
    'head' = the best-scoring (lowest cross-entropy) third, the slice CCNet
    feeds to training first.  Exact and integer-only: the per-doc key is
    ``score_ubits = (total_millibits · 1000) // n_bigrams`` (microbits per
    bigram, floor — both sides nonnegative, so floor division agrees
    between numpy and SQL), ranked by (score ASC, doc_id ASC); tercile
    boundaries sit at ranks ceil(n/3) and ceil(2n/3) over the docs WITH
    bigrams; docs without bigrams get bucket 'none' and a NULL score.

    Scale shape: one ``doc_lm_score`` scoring pass (reference-slice LM,
    broadcast once) materialized as a 24-byte/row projection; the two
    tercile boundaries AND their doc_id tie cutoffs come from
    ``state/orderstats`` radix select (the ``doc_dsir_select`` treatment),
    so the driver only ever holds 2^16-int histograms — no sort, no value
    list, no shipped group.  Reference analog: rule-scored classification
    routing (M18, app.py:1435-1448); oracle: LM CTE + window rank (see
    __ray_entry__.oracle_sql)."""
    from ..state.orderstats import kth_with_tiecut

    def project(t: pa.Table) -> pa.Table:
        n = t.column("n_bigrams").to_numpy(zero_copy_only=False).astype(np.int64)
        tot = (
            t.column("total_millibits").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        score = np.where(n > 0, (tot * 1000) // np.maximum(n, 1), np.int64(-1))
        has = pa.array(n > 0)
        # nullable copy for the radix select (kth_stats drops nulls)
        ranked = pc.if_else(
            has, pa.array(np.where(n > 0, score, 0)), pa.nulls(len(n), pa.int64())
        )
        return pa.table(
            {
                "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                "n_bigrams": pa.array(n),
                "score": pa.array(score),
                "ranked_score": ranked,
                "is_ranked": pc.cast(has, pa.int64()),
            }
        )

    scored = (
        doc_lm_score(sf_dir, ref_mod)
        .map_batches(project, batch_format="pyarrow")
        .materialize()
    )
    n_ranked = int(scored.sum("is_ranked") or 0) if scored.count() else 0
    if n_ranked == 0:
        def all_none(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "n_bigrams": t.column("n_bigrams"),
                    "score_ubits": pa.nulls(t.num_rows, type=pa.int64()),
                    "bucket": pa.array(["none"] * t.num_rows, type=pa.string()),
                }
            )

        return scored.map_batches(all_none, batch_format="pyarrow")

    def boundary(k: int) -> tuple[int, int]:
        return kth_with_tiecut(scored, "ranked_score", k)

    k1 = (n_ranked + 2) // 3  # ceil(n/3)
    k2 = (2 * n_ranked + 2) // 3  # ceil(2n/3)
    t1, d1 = boundary(k1)
    t2, d2 = boundary(k2)

    def verdict(t: pa.Table) -> pa.Table:
        n = t.column("n_bigrams").to_numpy(zero_copy_only=False).astype(np.int64)
        s = t.column("score").to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        in_head = (s < t1) | ((s == t1) & (ids <= d1))
        in_mid = (s < t2) | ((s == t2) & (ids <= d2))
        bucket = np.where(
            n == 0, "none", np.where(in_head, "head", np.where(in_mid, "middle", "tail"))
        )
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_bigrams": pa.array(n),
                "score_ubits": pc.if_else(
                    pa.array(n > 0), pa.array(s), pa.nulls(len(n), pa.int64())
                ),
                "bucket": pa.array(bucket.tolist(), type=pa.string()),
            }
        )

    return scored.map_batches(verdict, batch_format="pyarrow")


def ccnet_oracle_sql(ref_mod: int = LM_REF_MOD) -> str:
    """DuckDB oracle for doc_ccnet_buckets: the doc_lm_score LM CTE, the
    integer microbits-per-bigram key, and a window rank into terciles."""
    return f"""
            WITH w AS (
              SELECT doc_id,
                     string_split_regex(trim(lower(coalesce(text, ''))), '\\s+') AS ws
              FROM documents
            ),
            ref AS (SELECT ws FROM w WHERE doc_id % {ref_mod} = 0),
            rb AS (
              SELECT ws[i] AS w1, ws[i+1] AS w2
              FROM ref, UNNEST(range(1, len(ws))) AS t(i) WHERE len(ws) >= 2
            ),
            cb2 AS (SELECT w1, w2, count(*) AS c FROM rb GROUP BY w1, w2),
            cb1 AS (SELECT w1, count(*) AS c FROM rb GROUP BY w1),
            v AS (
              SELECT count(DISTINCT x) AS vs
              FROM (SELECT unnest(ws) AS x FROM ref) u
            ),
            db AS (
              SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
              FROM w, UNNEST(range(1, len(ws))) AS t(i) WHERE len(ws) >= 2
            ),
            mb AS (
              SELECT d.doc_id,
                     round(-log2((coalesce(cb2.c, 0) + 1) * 1.0
                                 / (coalesce(cb1.c, 0) + v.vs)) * 1000, 0)::BIGINT AS m
              FROM db d
              LEFT JOIN cb2 ON d.w1 = cb2.w1 AND d.w2 = cb2.w2
              LEFT JOIN cb1 ON d.w1 = cb1.w1
              CROSS JOIN v
            ),
            s AS (
              SELECT doc_id, count(*)::BIGINT AS n, sum(m)::BIGINT AS tot
              FROM mb GROUP BY doc_id
            ),
            base AS (
              SELECT w.doc_id, coalesce(s.n, 0)::BIGINT AS n_bigrams,
                     CASE WHEN s.n > 0 THEN (s.tot * 1000) // s.n END AS score
              FROM w LEFT JOIN s USING (doc_id)
            ),
            ranked AS (
              SELECT doc_id,
                     row_number() OVER (ORDER BY score, doc_id) AS rk,
                     count(*) OVER () AS nn
              FROM base WHERE score IS NOT NULL
            )
            SELECT b.doc_id, b.n_bigrams, b.score::BIGINT AS score_ubits,
                   CASE WHEN b.score IS NULL THEN 'none'
                        WHEN r.rk <= (r.nn + 2) // 3 THEN 'head'
                        WHEN r.rk <= (2 * r.nn + 2) // 3 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM base b LEFT JOIN ranked r USING (doc_id)
            ORDER BY b.doc_id
    """


# --------------------------------------------------------------------------
# Training-doc selection capstone: strip ⊕ DSIR ⊕ CCNet in one verdict
# --------------------------------------------------------------------------

_TRAINSEL_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("clean_text", pa.string()),
        ("weight_millibits", pa.int64()),
        ("bucket", pa.string()),
    ]
)


def select_training_docs(
    sf_dir: str,
    target_mod: int = DSIR_TARGET_MOD,
    raw_mod: int = LM_REF_MOD,
    keep_num: int = DSIR_KEEP_NUM,
    keep_den: int = DSIR_KEEP_DEN,
    cap: "int | None" = None,
) -> rd.Dataset:
    """The documents-axis selection capstone: one verdict per doc combining
    the three round-4 quality gates — admitted docs are those that are (a)
    DSIR-selected (top keep_num/keep_den by target-vs-raw LM importance,
    ``doc_dsir_select`` semantics), (b) in CCNet's head or middle
    perplexity tercile (``doc_ccnet_buckets`` semantics), and (c) left with
    ≥1 statement after cross-doc boilerplate removal
    (``doc_boilerplate_strip`` semantics) — emitted with their CLEANED
    text, importance weight and tercile label.  This is the
    gate-on-multiple-signals composition every production curation
    pipeline runs (CCNet buckets × importance selection × boilerplate
    hygiene) with every signal individually oracle-graded.

    Scale shape: both LMs are built once and broadcast; ONE thin scoring
    projection feeds all FOUR radix selects (DSIR threshold + tie, the two
    CCNet boundaries + ties); the boilerplate set comes from the shared
    candidate→verify pipeline.  Under the broadcast cap the final pass is
    ONE fused map over doc rows (strip + dual-LM score + verdict, no
    join); above it the strip output joins the selected verdicts on
    doc_id — a hash join of two row-per-doc projections, never payloads.

    Oracle: the three component oracles composed as CTE subqueries joined
    on doc_id (see __ray_entry__.oracle_sql)."""
    from ..core.joins import BROADCAST_KEY_CAP, probe_keys
    from ..state.orderstats import kth_with_tiecut
    from .text import (
        BOILERPLATE_MIN_DF,
        SEGMENT_WIDTH,
        _boilerplate_reassemble,
        _boilerplate_set,
        _window_segments,
        doc_boilerplate_strip,
    )

    cap = BROADCAST_KEY_CAP if cap is None else cap
    width, min_df = SEGMENT_WIDTH, BOILERPLATE_MIN_DF
    docs = _docs(sf_dir, columns=["doc_id", "text"])
    lm_t = build_bigram_lm(sf_dir, target_mod)
    lm_r = build_bigram_lm(sf_dir, raw_mod)
    state_ref = ray.put((lm_t, lm_r))

    def project(t: pa.Table, _cache={}) -> pa.Table:
        st = _cache.get("st")
        if st is None:
            st = _cache["st"] = ray.get(state_ref)
        doc_ids, cnt, tot_t, tot_r = _dual_lm_totals(t, st)
        score = np.where(cnt > 0, (tot_r * 1000) // np.maximum(cnt, 1), np.int64(-1))
        has = pa.array(cnt > 0)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids),
                "weight_millibits": pa.array(tot_r - tot_t),
                "ranked_score": pc.if_else(
                    has, pa.array(np.where(cnt > 0, score, 0)),
                    pa.nulls(len(cnt), pa.int64()),
                ),
                "is_ranked": pc.cast(has, pa.int64()),
            }
        )

    scored = docs.map_batches(project, batch_format="pyarrow").materialize()
    n_all = scored.count()
    if n_all == 0:
        return rd.from_arrow(_TRAINSEL_SCHEMA.empty_table())
    n_ranked = int(scored.sum("is_ranked") or 0)
    if n_ranked == 0:
        return rd.from_arrow(_TRAINSEL_SCHEMA.empty_table())

    # DSIR threshold over ALL docs (weight desc, doc_id asc) and the CCNet
    # tercile boundaries over docs WITH bigrams (score asc, doc_id asc) —
    # all through the single-sourced selection idiom (kth_with_tiecut), so
    # tie semantics can never drift from the component ops
    kd = (n_all * keep_num + keep_den - 1) // keep_den
    tw, dw = kth_with_tiecut(scored, "weight_millibits", kd, descending=True)
    t1, d1 = kth_with_tiecut(scored, "ranked_score", (n_ranked + 2) // 3)
    t2, d2 = kth_with_tiecut(scored, "ranked_score", (2 * n_ranked + 2) // 3)

    def verdict_fields(t: pa.Table, st) -> "tuple":
        doc_ids, cnt, tot_t, tot_r = _dual_lm_totals(t, st)
        weight = tot_r - tot_t
        score = np.where(cnt > 0, (tot_r * 1000) // np.maximum(cnt, 1), np.int64(-1))
        dsir_sel = (weight > tw) | ((weight == tw) & (doc_ids <= dw))
        in_head = (cnt > 0) & ((score < t1) | ((score == t1) & (doc_ids <= d1)))
        in_mid = (cnt > 0) & ((score < t2) | ((score == t2) & (doc_ids <= d2)))
        bucket = np.where(in_head, "head", "middle")
        return doc_ids, weight, bucket, dsir_sel & in_mid

    bp_ds = _boilerplate_set(docs, width, min_df)
    bp_keys = probe_keys(bp_ds, "statement", cap) if bp_ds is not None else pa.array(
        [], type=pa.string()
    )
    if bp_keys is not None:
        ref = ray.put(bp_keys.drop_null())

        def final(t: pa.Table, _cache={}) -> pa.Table:
            st = _cache.get("st")
            if st is None:
                st = _cache["st"] = ray.get(state_ref)
            ks = _cache.get("ks")
            if ks is None:
                ks = _cache["ks"] = ray.get(ref)
            seg = _window_segments(t, width)
            if seg.num_rows == 0:
                return _TRAINSEL_SCHEMA.empty_table()
            is_bp = pc.fill_null(
                pc.is_in(seg.column("statement"), value_set=ks), False
            ).to_numpy(zero_copy_only=False)
            reasm = _boilerplate_reassemble(
                seg.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64),
                seg.column("statement").to_pandas(),
                np.asarray(is_bp, dtype=bool),
            ).to_pandas()
            doc_ids, weight, bucket, sel = verdict_fields(t, st)
            vdf = pd.DataFrame(
                {
                    "doc_id": doc_ids[sel],
                    "weight_millibits": weight[sel],
                    "bucket": bucket[sel],
                }
            )
            m = vdf.merge(reasm[reasm["n_kept"] >= 1], on="doc_id", how="inner")
            return pa.table(
                {
                    "doc_id": pa.array(m["doc_id"].to_numpy().astype(np.int64)),
                    "clean_text": pa.array(m["clean_text"], type=pa.string()),
                    "weight_millibits": pa.array(
                        m["weight_millibits"].to_numpy().astype(np.int64)
                    ),
                    "bucket": pa.array(m["bucket"], type=pa.string()),
                }
            )

        return docs.map_batches(final, batch_format="pyarrow")

    # --- above-cap boilerplate set: join strip output with the verdicts ---
    # Verdicts come from the MATERIALIZED scoring projection (which already
    # holds every field the gates need), not a redundant LM re-scoring pass
    # over the raw text; bp_ds is threaded into the strip so its candidate
    # pipeline never runs twice.
    from ..core.batches import strip_schema_metadata

    def verdicts_only(t: pa.Table) -> pa.Table:
        doc_ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        weight = (
            t.column("weight_millibits").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        has = pc.is_valid(t.column("ranked_score")).to_numpy(zero_copy_only=False)
        score = (
            pc.fill_null(t.column("ranked_score"), -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        dsir_sel = (weight > tw) | ((weight == tw) & (doc_ids <= dw))
        in_head = has & ((score < t1) | ((score == t1) & (doc_ids <= d1)))
        in_mid = has & ((score < t2) | ((score == t2) & (doc_ids <= d2)))
        sel = dsir_sel & in_mid
        bucket = np.where(in_head, "head", "middle")
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[sel]),
                "weight_millibits": pa.array(weight[sel]),
                "bucket": pa.array(bucket[sel], type=pa.string()),
            }
        )

    strip_ds = doc_boilerplate_strip(
        sf_dir, min_df, width, cap=cap, precomputed_bp=bp_ds
    )
    joined = strip_schema_metadata(
        scored.map_batches(verdicts_only, batch_format="pyarrow")
    ).join(
        strip_schema_metadata(strip_ds),
        join_type="inner",
        num_partitions=8,
        on=("doc_id",),
    )

    def finalize(t: pa.Table) -> pa.Table:
        keep = t.filter(
            pc.greater_equal(pc.cast(t.column("n_kept"), pa.int64()), 1)
        )
        return pa.table(
            {
                "doc_id": pc.cast(keep.column("doc_id"), pa.int64()),
                "clean_text": keep.column("clean_text"),
                "weight_millibits": pc.cast(
                    keep.column("weight_millibits"), pa.int64()
                ),
                "bucket": keep.column("bucket"),
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow")


def train_select_oracle_sql() -> str:
    """Composed capstone oracle: the three component oracles as CTE
    subqueries joined on doc_id."""
    from .text import boilerplate_oracle_sql

    return f"""
            WITH d AS ({dsir_oracle_sql()}),
            c AS ({ccnet_oracle_sql()}),
            b AS ({boilerplate_oracle_sql()})
            SELECT d.doc_id, b.clean_text, d.weight_millibits, c.bucket
            FROM d
            JOIN c ON c.doc_id = d.doc_id
            JOIN b ON b.doc_id = d.doc_id
            WHERE d.selected AND c.bucket IN ('head', 'middle')
              AND b.n_kept >= 1
            ORDER BY d.doc_id
    """


# ---------------------------------------------------------------------------
# doc_tokenize — the text→tokens bridge (VERDICT r4 item 3): documents →
# north-star sequences shape, closing the corpus loop
# (documents → tokenize → prepare_training_sequences).
# ---------------------------------------------------------------------------

_TOKENIZE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("n_unk", pa.int64()),
        ("source", pa.string()),
    ]
)


def doc_tokenize(sf_dir: str, vocab_path: "str | None" = None) -> rd.Dataset:
    """Tokenize the documents table against the vocab DIMENSION parquet
    (``sources/dimensions.ensure_vocab_dim`` — the same file
    ``seq_detokenize`` decodes against), emitting the north-star sequences
    shape: one row per document, ``(doc_id, tokens:list<int32>,
    n_tok:int32, n_unk:int64, source)``.

    Contract (deterministic, SQL-replayable): text is normalized
    trim→lower→whitespace-split (the statement-family normalization); each
    word is scanned left to right with GREEDY LONGEST-MATCH against the
    vocab pieces — at each position the longest piece prefixing the
    remainder is consumed and its token_id emitted; when no piece matches,
    exactly one character is consumed, nothing is emitted, and the doc's
    ``n_unk`` increments.  Doc tokens are the per-word token runs
    concatenated in word order.  Every document emits a row (possibly an
    empty token list).

    Scale shape: the vocab dimension is broadcast ONCE (``ray.put``; each
    worker builds per-byte-length sorted code tables in a task cache —
    tiny state, so task functions, not an actor pool).  Per batch the scan
    is vectorized ROUNDS over all still-active words simultaneously,
    operating directly on the Arrow string values' UTF-8 BYTE buffer — no
    pandas object dtype anywhere in the hot path: each round packs the
    next ≤8 bytes of every active word into uint64 codes and matches them
    against per-length sorted vocab-code arrays via ``searchsorted``
    (packing is injective per length, so matches are EXACT, no hashing).
    Byte matching equals character matching for UTF-8 (a whole-character
    piece can only byte-match at character boundaries — UTF-8 is
    self-synchronizing), and an unmatched position consumes one
    CHARACTER (starter byte + its continuation bytes).  Pieces longer
    than 8 bytes take a per-candidate fallback (none exist in the
    dimension vocab).  Per-batch work is O(max_word_len) vectorized
    passes, never a per-word Python loop; rows never shuffle; output
    order is input order.

    Reference analog: segmentation with row backref (M6,
    banningredients.py:87-118) composed with the vocab dimension loader
    (S2); the greedy-longest-match contract is the ``seq_bpe_apply``
    leftmost-greedy idiom applied at character level.
    """
    import pyarrow.parquet as _pq

    from ..sources.dimensions import ensure_vocab_dim

    if vocab_path is None:
        vocab_path = ensure_vocab_dim()
    vt = _pq.read_table(vocab_path)
    missing = {"token_id", "piece"} - set(vt.column_names)
    if missing:
        raise ValueError(f"vocab dimension missing required columns {sorted(missing)}")
    vref = ray.put(vt.select(["token_id", "piece"]).combine_chunks())

    docs = _docs(sf_dir, columns=["doc_id", "text", "source"])

    def tok(t: pa.Table, _cache={}) -> pa.Table:
        st = _cache.get("st")
        if st is None:
            v = ray.get(vref)
            ids = v.column("token_id").to_numpy(zero_copy_only=False).astype(np.int64)
            pieces = v.column("piece").to_pylist()
            # per-BYTE-length packed uint64 code tables (sorted, with the
            # ids co-sorted): code = big-endian byte packing, injective at
            # fixed length → searchsorted matching is exact
            by_len_codes: dict[int, tuple[np.ndarray, np.ndarray]] = {}
            big: dict[int, dict[bytes, int]] = {}
            grouped: dict[int, list] = {}
            for p, i in zip(pieces, ids):
                b = p.encode("utf-8")
                grouped.setdefault(len(b), []).append((b, i))
            for L, entries in grouped.items():
                if L > 8:
                    big[L] = {b: i for b, i in entries}
                    continue
                codes = np.array(
                    [int.from_bytes(b, "big") for b, _ in entries], dtype=np.uint64
                )
                lids = np.array([i for _, i in entries], dtype=np.int64)
                order = np.argsort(codes)
                by_len_codes[L] = (codes[order], lids[order])
            lens_desc = sorted(set(by_len_codes) | set(big), reverse=True)
            st = _cache["st"] = (by_len_codes, big, lens_desc)
        by_len_codes, big, lens_desc = st
        if t.num_rows == 0:
            return _TOKENIZE_SCHEMA.empty_table()
        from .text import _split_words

        _, off, flat, wlens = _split_words(
            pc.fill_null(t.column("text").combine_chunks(), "")
        )
        nw = int(off[-1] - off[0])
        # the values buffer can start past 0 / extend past the last list
        # (sliced or combined chunks) — slice to exactly this batch's words
        if int(off[0]) != 0 or len(flat) != nw:
            flat = flat.slice(int(off[0]), nw)
        flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
        bufs = flat.buffers()
        odt = np.int64 if pa.types.is_large_string(flat.type) else np.int32
        boff = np.frombuffer(bufs[1], odt)[flat.offset : flat.offset + nw + 1]
        data = np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
        pos = boff[:-1].astype(np.int64).copy()  # current byte position
        end = boff[1:].astype(np.int64)
        unk = np.zeros(nw, dtype=np.int64)
        rounds_idx: list[np.ndarray] = []
        rounds_tok: list[np.ndarray] = []
        active = np.flatnonzero(pos < end)
        while active.size:
            p = pos[active]
            rem = end[active] - p
            matched = np.full(active.size, -1, dtype=np.int64)
            consumed = np.zeros(active.size, dtype=np.int64)
            for L in lens_desc:
                unm = matched < 0
                if not unm.any():
                    break
                cand = np.flatnonzero(unm & (rem >= L))
                if cand.size == 0:
                    continue
                if L > 8:
                    dL = big[L]
                    for j in cand:  # rare path: pieces over 8 bytes
                        b = data[p[j] : p[j] + L].tobytes()
                        tid = dL.get(b)
                        if tid is not None:
                            matched[j] = tid
                            consumed[j] = L
                    continue
                wb = data[p[cand][:, None] + np.arange(L)].astype(np.uint64)
                code = wb[:, 0]
                for k in range(1, L):
                    code = (code << np.uint64(8)) | wb[:, k]
                codes_L, ids_L = by_len_codes[L]
                loc = np.minimum(
                    np.searchsorted(codes_L, code), codes_L.size - 1
                )
                hit = codes_L[loc] == code
                hi = cand[hit]
                matched[hi] = ids_L[loc[hit]]
                consumed[hi] = L
            unm = matched < 0
            if unm.any():
                # unmatched: consume ONE CHARACTER — the starter byte plus
                # its UTF-8 continuation bytes (0b10xxxxxx)
                ui = np.flatnonzero(unm)
                c = np.ones(ui.size, dtype=np.int64)
                for k in (1, 2, 3):
                    look = p[ui] + k
                    cont = (
                        (c == k)
                        & (look < end[active][ui])
                        & ((data[np.minimum(look, data.size - 1)] & 0xC0) == 0x80)
                    )
                    c[cont] += 1
                consumed[ui] = c
                np.add.at(unk, active[ui], 1)
            hitmask = matched >= 0
            rounds_idx.append(active[hitmask])
            rounds_tok.append(matched[hitmask])
            pos[active] = p + consumed
            active = active[pos[active] < end[active]]
        if rounds_idx:
            idx = np.concatenate(rounds_idx)
            tks = np.concatenate(rounds_tok)
            order = np.argsort(idx, kind="stable")  # keeps round order per word
            idx, tks = idx[order], tks[order]
        else:
            idx = np.empty(0, dtype=np.int64)
            tks = np.empty(0, dtype=np.int64)
        per_word = np.bincount(idx, minlength=nw).astype(np.int64)
        # word rows are doc-major (ListArray offsets), so reduceat at the
        # word-list offsets rolls token/unk counts up to docs; every doc has
        # ≥1 word slot (empty text normalizes to [""])
        starts = (off[:-1] - off[0]).astype(np.int64)
        per_doc = np.add.reduceat(per_word, starts)
        unk_doc = np.add.reduceat(unk, starts)
        offsets = np.zeros(t.num_rows + 1, dtype=np.int64)
        np.cumsum(per_doc, out=offsets[1:])
        tokens = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int64()).cast(pa.int32())
            if offsets[-1] <= np.iinfo(np.int32).max
            else pa.array(offsets, type=pa.int64()),
            pa.array(tks, type=pa.int32()),
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "tokens": tokens.cast(pa.list_(pa.int32())),
                "n_tok": pa.array(per_doc, type=pa.int64()).cast(pa.int32()),
                "n_unk": pa.array(unk_doc, type=pa.int64()),
                "source": t.column("source"),
            }
        )

    return docs.map_batches(tok, batch_format="pyarrow")


def tokenize_documents_to_corpus(
    sf_dir: str, out_dir: str, vocab_path: "str | None" = None
) -> str:
    """Write ``doc_tokenize`` output as a sequences-shaped corpus
    (``frag-*.parquet`` with doc_id:string, tokens, n_tok, source) so the
    documents table feeds ``prepare_training_sequences`` end-to-end —
    the docs→training-corpus composition VERDICT r4 item 3 asks for.
    doc_ids become ``doc-%012d`` (digit-suffix convention every seq
    pipeline's suffix arithmetic relies on), and document sources map
    deterministically into the sequences SOURCE_ALLOWLIST (stable hash of
    the source name mod |allowlist|) so the downstream validity gate sees
    a well-formed corpus rather than rejecting every row."""
    import os as _os

    from ..core.hashing import hash_strings
    from ..core.schema import ALLOWED_SOURCES

    allow = sorted(ALLOWED_SOURCES)
    ds = doc_tokenize(sf_dir, vocab_path)

    def to_seq(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        sid = pa.array([f"doc-{i:012d}" for i in ids], type=pa.string())
        h = hash_strings(t.column("source").combine_chunks()) % np.uint64(len(allow))
        src = pa.array([allow[int(i)] for i in h], type=pa.string())
        return pa.table(
            {
                "doc_id": sid,
                "tokens": t.column("tokens"),
                "n_tok": t.column("n_tok"),
                "source": src,
            }
        )

    _os.makedirs(out_dir, exist_ok=True)
    ds.map_batches(to_seq, batch_format="pyarrow").write_parquet(out_dir)
    # normalize names to the frag-*.parquet convention resolve_sequences reads
    for i, f in enumerate(sorted(_os.listdir(out_dir))):
        if f.endswith(".parquet") and not f.startswith("frag-"):
            _os.replace(
                _os.path.join(out_dir, f),
                _os.path.join(out_dir, f"frag-{i:05d}.parquet"),
            )
    return out_dir

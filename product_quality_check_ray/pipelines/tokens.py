"""Token-level operators over the pre-tokenized ``sequences`` table.

These run directly on the north-star input shape (``BASELINE.json:
input_hint`` — doc_id:string, tokens:list<int32>, n_tok:int32,
source:string) at the TOKEN level, with no text detour:

- ``seq_decontaminate``: benchmark n-gram decontamination. A deterministic
  holdout slice of the corpus (doc_id numeric suffix % DECON_HOLD_MOD == 0)
  plays the benchmark suite; every non-holdout sequence is scanned for
  EXACT token k-gram overlap with the holdout's gram set. The gram set is
  collected once and broadcast via ``ray.put`` — the contract is the
  real-world one: benchmark suites are MBs (≤ millions of grams), so the
  gram index fits in the object store even when the corpus is 100 TB, and
  the corpus side stays one streaming ``map_batches`` pass that never
  shuffles. Membership is exact end-to-end (bitmap + sorted-hash prefilter,
  then row-compare of the int32 gram keys), not hash-approximate.
- ``seq_dup_token_arrays``: exact sequence-level content dedup — groups of
  rows whose ENTIRE token arrays are identical (token-array equality, the
  per-row invariant named in ``BASELINE.json``). Candidate→recover shape
  (the ``exact_loser_ids`` / ``state/dupfinder`` design): a 64-bit
  position-mixed content hash per row (fully vectorized; cumsum-diff
  segment sums, no reduceat-empty-segment pitfalls) goes through the
  hash-range tree reduce, and only CANDIDATE rows (duplicated hash) are
  materialized and verified by exact array comparison — the corpus never
  shuffles, the driver only ever sees the candidate set, and 64-bit
  collisions are filtered exactly.

Both ops read a deterministically AUGMENTED view of the corpus: the random
fixture has essentially zero cross-row token overlap, which would make both
queries vacuously empty (the ADVICE r1 "vacuously green" lesson on
``embedding_near_dups``). A fixed 16-token canary is spliced in, keyed on
the doc_id numeric suffix, with the exact same expression reproduced in the
SQL oracles so both engines transform identical inputs (the
``doc_pii_redact`` augmentation precedent, ``pipelines/textprep.py``).

Reference analogs: prescreen exact-match pass over a broadcast dictionary
(``prompts/banningredients.py:149,192-197``) for the gram membership; exact
duplicate grouping (``app.py`` duplicate handling, SURVEY G4/D1) for the
content dedup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..core.collect import collect_table as _collect
from ..core.hashing import splitmix64
from ..core.schema import ALLOWED_SOURCES as _ALLOWED
from ..core.schema import VOCAB
# --- decontamination constants (mirrored verbatim into the SQL oracle) ----
DECON_K = 8            # token n-gram length
DECON_HOLD_MOD = 97    # doc_id suffix % this == 0  → benchmark holdout row
DECON_PATCH_MOD = 13   # suffix % this == DECON_PATCH_RES → canary-patched row
DECON_PATCH_RES = 5
CANARY_LEN = 16
# Knuth multiplicative constant; values land uniformly in [0, VOCAB)
CANARY: tuple[int, ...] = tuple((2654435761 * (j + 1)) % VOCAB for j in range(CANARY_LEN))
_CANARY_NP = np.asarray(CANARY, dtype=np.int32)

# --- content-dedup constants (mirrored into the SQL oracle) ---------------
DUPSEQ_MOD = 257       # suffix % this == DUPSEQ_RES → whole array replaced
DUPSEQ_RES = 3
DUPSEQ_LEN_BASE = 4    # replacement = CANARY[: 4 + suffix % 5] (5 groups)
DUPSEQ_LEN_CHOICES = 5

_U64 = np.uint64
_GOLD = _U64(0x9E3779B97F4A7C15)


def _seq_ds(sf_dir: str, columns=None) -> rd.Dataset:
    from ..datagen import resolve_sequences

    return rd.read_parquet(resolve_sequences(sf_dir), columns=columns)


def _aug(sf_dir: str, augment: "bool | None") -> bool:
    """Resolve an op's fixture-augmentation flag (ADVICE r2, high): the
    deterministic canary splices / holdout slice / near-dup families apply
    ONLY to fixture-provenance corpora (or on explicit opt-in) — a user
    corpus reaching these ops through ``resolve_sequences`` runs plain, so
    its rows are never silently rewritten, dropped, or mis-reported."""
    if augment is not None:
        return augment
    from ..datagen import is_fixture_corpus

    return is_fixture_corpus(sf_dir)


def _suffix_i64(doc_id: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """Numeric 12-digit doc_id suffix; -1 where doc_id is NULL or does not
    end in 12 digits.

    The SQL analog is ``try_cast(right(doc_id, 12) AS BIGINT)``: fixture
    doc_ids always end in 12 digits, but every sequences op also accepts
    USER corpora via ``datagen.resolve_sequences``, whose ids may have any
    shape — those rows take the -1 sentinel instead of raising
    (ADVICE r2)."""
    sl = pc.utf8_slice_codeunits(doc_id, start=-12, stop=1 << 30)
    ok = pc.fill_null(pc.match_substring_regex(sl, r"^\d{12}$"), False)
    s = pc.cast(pc.if_else(ok, sl, pa.scalar(None, pa.string())), pa.int64())
    return np.asarray(pc.fill_null(s, -1).to_numpy(zero_copy_only=False), dtype=np.int64)


def _doc_num(doc_id: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """int64 shard/order key per (non-null) doc_id: the numeric 12-digit
    suffix when present (fixture ids — mirrored by the SQL oracles' cast),
    else a deterministic 48-bit string hash so arbitrary user ids still
    spread across shards instead of all colliding on the -1 sentinel."""
    sfx = _suffix_i64(doc_id)
    bad = sfx < 0
    if bad.any():
        import pandas as pd

        sfx = sfx.copy()  # the fill_null output buffer can be read-only

        ids_obj = np.asarray(
            [
                x if x is not None else ""
                for x in (
                    doc_id.combine_chunks()
                    if isinstance(doc_id, pa.ChunkedArray)
                    else doc_id
                ).to_pylist()
            ],
            dtype=object,
        )
        h = pd.util.hash_array(ids_obj[bad]) % np.uint64(1 << 48)
        sfx[bad] = h.astype(np.int64)
    return sfx


def _tokens_parts(col: "pa.ChunkedArray | pa.ListArray") -> tuple[np.ndarray, np.ndarray]:
    """(offsets int64 [n+1], values int32 buffer truncated to offsets[-1]).

    Offsets are ABSOLUTE into the values buffer (offsets[0] may be nonzero
    for sliced arrays — callers index with them directly, the
    ``row_checks._list_min_max`` convention). Null list ELEMENTS become -1
    (invalid-token sentinel, same as the check kernels)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    inner = arr.values
    if inner.null_count:
        inner = pc.fill_null(inner, -1)
    vals = inner.to_numpy(zero_copy_only=False)[: offs[-1]]
    return offs, np.asarray(vals, dtype=np.int32)


def _patch_prefix(offs: np.ndarray, vals: np.ndarray, rows: np.ndarray) -> np.ndarray:
    """Copy of ``vals`` with rows' first min(CANARY_LEN, len) tokens replaced
    by the canary (SQL: list_cat(CANARY[1:least(16,len)], tokens[least+1:]))."""
    if rows.size == 0:
        return vals
    out = vals.copy()
    m = np.minimum(offs[rows + 1] - offs[rows], CANARY_LEN)
    nz = m > 0
    rows, m = rows[nz], m[nz]
    if rows.size == 0:
        return out
    total = int(m.sum())
    intra = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(m) - m, m)
    out[np.repeat(offs[rows], m) + intra] = _CANARY_NP[intra]
    return out


def _window_starts(offs: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Absolute start positions of all WITHIN-ROW k-token windows:
    (starts, row index per window, per-row window counts) — no gather."""
    lens = offs[1:] - offs[:-1]
    m = np.maximum(lens - k + 1, 0)
    total = int(m.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64), m
    intra = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(m) - m, m)
    starts = np.repeat(offs[:-1], m) + intra
    gdoc = np.repeat(np.arange(len(lens), dtype=np.int64), m)
    return starts, gdoc, m


def _gather_windows(vals: np.ndarray, starts: np.ndarray, k: int) -> np.ndarray:
    """(len(starts), k) contiguous int32 windows (candidate-set-sized only
    in hot paths — the full-corpus path prefilters by hash first)."""
    if starts.size == 0:
        return np.empty((0, k), dtype=np.int32)
    win = vals[starts[:, None] + np.arange(k, dtype=np.int64)[None, :]]
    return np.ascontiguousarray(win, dtype=np.int32)


def _gram_windows(
    offs: np.ndarray, vals: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All within-row k-token windows: ((total, k) int32 contiguous,
    row index per window, per-row window counts)."""
    starts, gdoc, m = _window_starts(offs, k)
    return _gather_windows(vals, starts, k), gdoc, m


def _void(win: np.ndarray, k: int) -> np.ndarray:
    """(n, k) int32 windows → length-n V{4k} byte-key view (exact, orderable)."""
    return np.ascontiguousarray(win).view(f"V{4 * k}").ravel()


_GRAM_BYTES = 4 * DECON_K
_GRAM_TYPE = pa.binary(_GRAM_BYTES)  # fixed-size binary


def _holdout_grams_batch(t: pa.Table) -> pa.Table:
    """Per-batch UNIQUE canary-patched k-gram keys of holdout rows (combiner:
    the driver unions already-deduped 32-byte keys, never raw windows)."""
    sfx = _suffix_i64(t.column("doc_id"))
    hold = (sfx >= 0) & (sfx % DECON_HOLD_MOD == 0)
    if not hold.any():
        return pa.table({"g": pa.array([], type=_GRAM_TYPE)})
    sel = t.filter(pa.array(hold))
    s2 = sfx[hold]
    offs, vals = _tokens_parts(sel.column("tokens"))
    prows = np.flatnonzero(s2 % DECON_PATCH_MOD == DECON_PATCH_RES)
    win, _, _ = _gram_windows(offs, _patch_prefix(offs, vals, prows), DECON_K)
    u = np.unique(_void(win, DECON_K))
    garr = pa.Array.from_buffers(_GRAM_TYPE, len(u), [None, pa.py_buffer(u.tobytes())])
    return pa.table({"g": garr})


def _window_hash64(vals: np.ndarray, k: int) -> np.ndarray:
    """64-bit mixes of EVERY length-k window of the flat values buffer
    (k shifted multiply-adds, uint64 wraparound — no (n, k) materialization).
    Prefilter only: exact membership is verified on the 32-byte keys."""
    v = vals.astype(_U64)
    n = v.size - k + 1
    if n <= 0:
        return np.empty(0, dtype=_U64)
    with np.errstate(over="ignore"):
        acc = np.zeros(n, dtype=_U64)
        mult = _U64(1)
        for j in range(k - 1, -1, -1):
            acc += v[j : j + n] * mult
            mult = _U64(mult * _GOLD)
        return splitmix64(acc)


class GramIndex:
    """Broadcast benchmark gram index.

    Three plain numpy arrays (so the broadcast is zero-copy: workers read
    plasma buffers, no per-task deserialization copy):

    - ``bitmap``: direct-addressed hash bitmap — the O(1) per-window
      prefilter (~2% false positives at the cap, 0 false negatives);
    - ``h``: per-key 64-bit hashes sorted ascending (uint64 searchsorted is
      8-byte SIMD compares — measured ~10× cheaper than sorting/searching
      the 32-byte keys directly);
    - ``keymat``: the exact (n, k) int32 gram keys in ``h``'s order, used to
      verify candidates by row comparison (hash-collision runs are resolved
      exactly, so membership is EXACT end to end).

    Keys need not be unique: per-batch combiner dedup already removes ~all
    repeats, and boolean membership is unaffected by the stragglers — which
    removes a corpus-sized driver ``np.unique`` (22 s at 28M grams)."""

    __slots__ = ("keymat", "h", "bitmap", "mask")

    def __init__(self, keymat: np.ndarray, h: np.ndarray, bitmap: np.ndarray, mask):
        self.keymat, self.h, self.bitmap, self.mask = keymat, h, bitmap, _U64(mask)

    @classmethod
    def build(cls, keymat: np.ndarray) -> "GramIndex":
        if len(keymat):
            h = _key_hash64(keymat)
            order = np.argsort(h, kind="stable")
            return cls.from_sorted(np.ascontiguousarray(keymat[order]), h[order])
        return cls.from_sorted(keymat, np.empty(0, dtype=_U64))

    @classmethod
    def from_sorted(cls, keymat: np.ndarray, h: np.ndarray) -> "GramIndex":
        """Assemble from ALREADY hash-sorted keys: the driver's remaining
        work is O(n) (bitmap scatter + packbits) — the O(n log n) sort and
        the keymat gather happen upstream (distributed sort in
        ``holdout_gram_index``). Intra-run order of equal hashes is
        irrelevant: ``member`` scans collision runs exhaustively."""
        n = max(len(keymat), 1)
        bits = 1 << max(20, min(30, int(np.ceil(np.log2(n * 64)))))
        mask = _U64(bits - 1)
        if len(keymat):
            flags = np.zeros(bits, dtype=bool)
            flags[(h & mask).astype(np.int64)] = True
            bitmap = np.packbits(flags, bitorder="little")
        else:
            h = np.empty(0, dtype=_U64)
            bitmap = np.zeros(bits >> 3, dtype=np.uint8)
        return cls(keymat, h, bitmap, mask)

    def parts(self) -> tuple:
        """ray.put payload: a tuple of top-level numpy arrays (zero-copy on
        every worker read, unlike a pickled instance)."""
        return (self.keymat, self.h, self.bitmap, int(self.mask))

    def maybe(self, h: np.ndarray) -> np.ndarray:
        pos = h & self.mask
        return (
            self.bitmap[(pos >> _U64(3)).astype(np.int64)]
            >> (pos & _U64(7)).astype(np.uint8)
        ) & 1 > 0

    def member(self, h: np.ndarray, win: np.ndarray) -> np.ndarray:
        """Exact membership of candidate windows: hash searchsorted, then
        row-compare the int32 keys; hash-collision runs (≈0 expected)
        checked exhaustively."""
        left = np.searchsorted(self.h, h, side="left")
        right = np.searchsorted(self.h, h, side="right")
        out = np.zeros(len(h), dtype=bool)
        runs = right - left
        single = np.flatnonzero(runs == 1)
        if single.size:
            out[single] = (self.keymat[left[single]] == win[single]).all(axis=1)
        for i in np.flatnonzero(runs > 1):  # collision runs: cold path
            out[i] = bool(
                (self.keymat[left[i] : right[i]] == win[i]).all(axis=1).any()
            )
        return out


def _key_hash64(keymat: np.ndarray) -> np.ndarray:
    """Per-key hash computed column-wise on the (n, k) int32 key matrix —
    the same polynomial ``_window_hash64`` evaluates at each window."""
    with np.errstate(over="ignore"):
        acc = np.zeros(len(keymat), dtype=_U64)
        mult = _U64(1)
        for j in range(keymat.shape[1] - 1, -1, -1):
            acc += keymat[:, j].astype(_U64) * mult
            mult = _U64(mult * _GOLD)
    return splitmix64(acc)


def _fsb_to_mat(col: "pa.ChunkedArray | pa.Array", k: int) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(arr) == 0:
        return np.empty((0, k), dtype=np.int32)
    buf = arr.buffers()[1]
    flat = np.frombuffer(
        buf, dtype=np.int32, count=len(arr) * k, offset=arr.offset * 4 * k
    )
    return flat.reshape(-1, k)


# above this GRAM count the O(n log n) hash sort moves off the driver into a
# distributed Dataset.sort exchange; below it, driver argsort beats the
# sort's fixed multi-second orchestration cost. Crossover sized from
# measurement: driver argsort+gather ≈ 0.75 s per M grams (21 s at 28M),
# the sort exchange ≈ 3–5 s flat — so ~8M grams is the break-even.
GRAM_INDEX_SORT_GRAMS = 8_000_000


def holdout_gram_index(
    seq: rd.Dataset, *, distributed: bool | None = None
) -> GramIndex:
    """Benchmark gram index of the holdout slice (broadcast once).
    Size contract documented in the module docstring.

    Large holdouts build DISTRIBUTED: grams are hashed per batch and
    range-sorted by ``Dataset.sort`` (an all-to-all exchange over workers);
    the driver receives already-sorted blocks and does only the O(n) bitmap
    scatter — removing the single-threaded argsort+gather that cost 21 s at
    28M grams. ``distributed=None`` decides by the ACTUAL gram count (the
    gram extraction is materialized once and reused — deciding by corpus
    row count sent sf0.1's ~1M-gram index through the exchange and cost
    seq_decontaminate a needless ~3 s, r3 bench)."""
    grams = seq.map_batches(
        _holdout_grams_batch, batch_format="pyarrow", batch_size=None
    )
    return gram_index_from_ds(grams, distributed=distributed)


def gram_index_from_ds(
    grams: rd.Dataset, *, distributed: bool | None = None
) -> GramIndex:
    """GramIndex from any Dataset carrying a ``g`` fixed-size-binary gram
    column (the ``holdout_gram_index`` decision logic, shared with the
    capstone's scout-pass gram stream): below GRAM_INDEX_SORT_GRAMS the
    driver argsort wins; above it the hash sort runs as a distributed
    ``Dataset.sort`` exchange and the driver only does the O(n) assembly."""
    if distributed is None:
        # the gram stream is small relative to the corpus (a
        # 1/DECON_HOLD_MOD row sample); materializing it makes count() free
        # and lets the chosen branch reuse the extraction pass
        grams = grams.materialize()
        distributed = grams.count() > GRAM_INDEX_SORT_GRAMS
    if not distributed:
        tbl = _collect(grams)
        if "g" not in tbl.column_names:  # 0-row corpus: no blocks survive
            tbl = pa.table({"g": pa.array([], type=_GRAM_TYPE)})
        return GramIndex.build(_fsb_to_mat(tbl.column("g"), DECON_K))

    def add_h(t: pa.Table) -> pa.Table:
        mat = _fsb_to_mat(t.column("g"), DECON_K)
        return t.append_column("h", pa.array(_key_hash64(mat), type=pa.uint64()))

    tbl = _collect(grams.map_batches(add_h, batch_format="pyarrow").sort("h"))
    return GramIndex.from_sorted(
        _fsb_to_mat(tbl.column("g"), DECON_K),
        tbl.column("h").to_numpy().astype(_U64),
    )


_DECON_EMPTY = pa.schema(
    [
        ("doc_id", pa.string()),
        ("source", pa.string()),
        ("n_tok", pa.int32()),
        ("n_grams", pa.int64()),
        ("hit_grams", pa.int64()),
        ("contaminated", pa.bool_()),
    ]
)


def seq_decontaminate(sf_dir: str, augment: bool | None = None) -> rd.Dataset:
    """Token-level benchmark decontamination over the sequences corpus.

    Two passes over storage (the canonical decontamination shape: build the
    benchmark gram index once, then stream the corpus): pass 1 collects the
    holdout gram set and broadcasts it; pass 2 flags every non-holdout row
    with its exact contaminated-gram count. Output: one row per non-holdout
    input row.

    On NON-fixture corpora (``_aug``) there is no synthetic holdout slice:
    every row is scanned, none is patched, and — with no external benchmark
    index — nothing flags. Real deployments plug a benchmark gram table in
    via ``holdout_gram_index`` over their own eval suite."""
    aug = _aug(sf_dir, augment)
    seq = _seq_ds(sf_dir)
    # index pass reads only what it needs (column pruning at the read)
    hold_ref = ray.put(
        holdout_gram_index(_seq_ds(sf_dir, columns=["doc_id", "tokens"])).parts()
        if aug
        else GramIndex.build(np.empty((0, DECON_K), dtype=np.int32)).parts()
    )

    def scan(t: pa.Table) -> pa.Table:
        index = GramIndex(*ray.get(hold_ref))  # zero-copy from local object store
        sfx = _suffix_i64(t.column("doc_id"))
        keep = (
            ~((sfx >= 0) & (sfx % DECON_HOLD_MOD == 0))
            if aug
            else np.ones(sfx.size, dtype=bool)
        )
        sel = t.filter(pa.array(keep))
        if sel.num_rows == 0:
            return _DECON_EMPTY.empty_table()
        s2 = sfx[keep]
        offs, vals = _tokens_parts(sel.column("tokens"))
        if aug:
            prows = np.flatnonzero(
                (s2 >= 0) & (s2 % DECON_PATCH_MOD == DECON_PATCH_RES)
            )
            vals = _patch_prefix(offs, vals, prows)
        starts, gdoc, m = _window_starts(offs, DECON_K)
        hits = np.zeros(sel.num_rows, dtype=np.int64)
        if starts.size and index.h.size:
            # O(1) bitmap prefilter on the rolling 64-bit hash; exact key
            # verification gathers CANDIDATE windows only
            h = _window_hash64(vals, DECON_K)[starts]
            cand = index.maybe(h)
            if cand.any():
                win = _gather_windows(vals, starts[cand], DECON_K)
                member = index.member(h[cand], win)
                if member.any():
                    hits = np.bincount(
                        gdoc[cand][member], minlength=sel.num_rows
                    ).astype(np.int64)
        return pa.table(
            {
                "doc_id": sel.column("doc_id"),
                "source": sel.column("source"),
                "n_tok": sel.column("n_tok"),
                "n_grams": pa.array(m.astype(np.int64)),
                "hit_grams": pa.array(hits),
                "contaminated": pa.array(hits > 0),
            }
        )

    # bounded batches: with whole read blocks (batch_size=None) every task
    # first-touches ~400 MB of numpy temps (window hashes + candidate
    # gathers) in a fresh malloc arena — the seq_repetition_scores lesson —
    # which cost 3-4x over the kernel's ideal wall at 12.8M rows (measured
    # 135 s scan vs 22 s single-thread-extrapolated); 8k rows ≈ 14 MB of
    # temps per batch lets each worker amortize its arena across ~50 batches
    return seq.map_batches(scan, batch_format="pyarrow", batch_size=8192)


# ---------------------------------------------------------------------------
# Token-level sliding-window chunking
# ---------------------------------------------------------------------------

CHUNK_W = 512  # window width (tokens per training chunk)
CHUNK_S = 384  # stride (W - S = 128-token overlap between adjacent chunks)

_CHUNK_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("chunk_idx", pa.int64()),
        ("tok_start", pa.int64()),
        ("chunk_len", pa.int64()),
        ("tok_sum", pa.int64()),
        ("tok_first", pa.int64()),
        ("tok_last", pa.int64()),
    ]
)


def seq_chunk_windows(
    sf_dir: str, width: int = CHUNK_W, stride: int = CHUNK_S
) -> rd.Dataset:
    """Split over-length sequences into fixed-width token windows.

    The token-level analog of ``textprep.doc_chunks`` (word windows over
    documents), run directly on the north-star pre-tokenized table: every
    valid row (non-null doc_id and tokens, ≥1 token) yields
    ``1 + ceil(max(len - width, 0) / stride)`` chunks; chunk *i* covers
    token positions ``[i*stride, min(i*stride + width, len))``. The final
    window is CLIPPED to the row end, never padded, so every token lands
    in ≥1 chunk and chunk boundaries are a pure function of the row —
    embarrassingly parallel, no shuffle, one streaming pass.

    Emits per-chunk summary columns (offset/length plus content-sensitive
    ``tok_sum``/``tok_first``/``tok_last``) rather than the sliced arrays:
    the driver's value hash covers scalars, and the three content columns
    pin the slice boundaries exactly (an off-by-one start/end moves
    first/last/sum). Chunk sums come from one cumulative sum over the flat
    values buffer (no per-chunk gather). Null token ELEMENTS take the -1
    invalid sentinel (``_tokens_parts``), mirrored in the oracle via
    ``list_transform(coalesce(x, -1))``.

    Reference analog: fixed-size statement windows (SURVEY M8) — here at
    the token level for training-example assembly.
    """

    def chunk(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").combine_chunks()
        toks = t.column("tokens")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        valid = pc.and_(pc.is_valid(ids), pc.is_valid(toks))
        sel = pa.table({"doc_id": ids, "tokens": toks}).filter(valid)
        if sel.num_rows == 0:
            return _CHUNK_SCHEMA.empty_table()
        offs, vals = _tokens_parts(sel.column("tokens"))
        lens = offs[1:] - offs[:-1]
        nchunks = 1 + (np.maximum(lens - width, 0) + stride - 1) // stride
        nchunks[lens == 0] = 0  # zero-token rows yield no chunks
        total = int(nchunks.sum())
        if total == 0:
            return _CHUNK_SCHEMA.empty_table()
        row = np.repeat(np.arange(lens.size, dtype=np.int64), nchunks)
        cidx = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(nchunks) - nchunks, nchunks
        )
        st = cidx * stride
        en = np.minimum(st + width, lens[row])
        vals64 = vals.astype(np.int64)  # vals spans [0, offs[-1]) — absolute
        csum = np.zeros(vals64.size + 1, dtype=np.int64)
        np.cumsum(vals64, out=csum[1:])
        abs_st = offs[:-1][row] + st
        abs_en = offs[:-1][row] + en
        return pa.table(
            {
                "doc_id": sel.column("doc_id").take(pa.array(row)),
                "chunk_idx": pa.array(cidx),
                "tok_start": pa.array(st),
                "chunk_len": pa.array(en - st),
                "tok_sum": pa.array(csum[abs_en] - csum[abs_st]),
                "tok_first": pa.array(vals64[abs_st]),
                "tok_last": pa.array(vals64[abs_en - 1]),
            }
        )

    return _seq_ds(sf_dir, columns=["doc_id", "tokens"]).map_batches(
        chunk, batch_format="pyarrow", batch_size=None
    )


# ---------------------------------------------------------------------------
# Length-sorted batch plan (padding-efficiency / dynamic batching)
# ---------------------------------------------------------------------------

LENBATCH_B = 512  # sequences per training batch

_LENBATCH_SCHEMA = pa.schema(
    [
        ("batch_id", pa.int64()),
        ("n_seqs", pa.int64()),
        ("min_tok", pa.int64()),
        ("max_tok", pa.int64()),
        ("sum_tok", pa.int64()),
        ("pad_waste", pa.int64()),
    ]
)


def seq_length_batches(sf_dir: str, batch_rows: int = LENBATCH_B) -> pa.Table:
    """Length-sorted batch plan over the sequences table: global order by
    (n_tok, doc_id), consecutive runs of ``batch_rows`` sequences form one
    training batch, and each batch reports its padding waste
    (``n_seqs·max_tok − sum_tok`` — the cost of padding the batch to its
    longest member). Length-grouped batching is the standard fix for
    padding blow-up in variable-length training; this op IS the planner.

    Distributed shape (the ``state/dupfinder`` split/reduce pattern, but
    range-partitioned by VALUE): one metadata-only pass (16 B/row —
    ``columns=["doc_id", "n_tok"]``, the token payload never leaves
    storage) splits rows into contiguous n_tok intervals, so the global
    sort decomposes into independent per-range Arrow sorts. Global ranks
    need only per-range COUNTS (driver cumsum over ≤R ints — wave 1
    returns counts, sorted range tables stay in the object store), then
    wave 2 assigns ranks/batch ids per range and emits per-batch PARTIAL
    aggregates; a batch straddles ≤2 ranges, so the driver's final merge
    sees ``n_batches + R`` tiny rows. Skew note: ranges split the n_tok
    VALUE domain [1, 2048]; a corpus concentrated on one length puts that
    length's run in one range — rank assignment within equal n_tok is
    order-free ACROSS equal keys only via doc_id, so a skewed key can be
    salted by widening the range key to (n_tok, doc_id prefix) without
    changing output (ranks within identical (n_tok, doc_id) ties are
    interchangeable).

    Validity filter matches ``seq_pack_plan``: non-null doc_id/n_tok,
    1 ≤ n_tok ≤ 2048.
    """
    from ..core.schema import MAX_N_TOK_DEFAULT

    def meta(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").combine_chunks()
        ntok = t.column("n_tok").combine_chunks()
        valid = pc.and_(
            pc.and_(pc.is_valid(ids), pc.is_valid(ntok)),
            pc.and_(
                pc.greater_equal(ntok, 1), pc.less_equal(ntok, MAX_N_TOK_DEFAULT)
            ),
        )
        sel = pa.table(
            {"doc_id": ids, "n_tok": pc.cast(ntok, pa.int64())}
        ).filter(valid)
        return sel

    meta_ds = _seq_ds(sf_dir, columns=["doc_id", "n_tok"]).map_batches(
        meta, batch_format="pyarrow", batch_size=None
    )
    bundles = list(meta_ds.iter_internal_ref_bundles())
    block_refs = [ref for b in bundles for ref in b.block_refs]
    if not block_refs:
        return _LENBATCH_SCHEMA.empty_table()
    from ..core.salting import cluster_range_count

    ranges = cluster_range_count(MAX_N_TOK_DEFAULT)
    # contiguous n_tok intervals: bounds[r] = first n_tok of range r+1
    width = -(-MAX_N_TOK_DEFAULT // ranges)
    per = 8
    mapped = [
        _lenbatch_split.options(num_returns=ranges).remote(
            block_refs[i : i + per], ranges, width
        )
        for i in range(0, len(block_refs), per)
    ]
    sorted_counts = [
        _lenbatch_sort.options(num_returns=2).remote(*[m[r] for m in mapped])
        for r in range(ranges)
    ]
    counts = ray.get([c for (_t, c) in sorted_counts])
    offsets = np.concatenate([[0], np.cumsum(counts)])[:-1]
    partials = [
        _lenbatch_aggregate.remote(t, int(offsets[r]), batch_rows)
        for r, (t, _c) in enumerate(sorted_counts)
        if counts[r] > 0
    ]
    parts = [p for p in ray.get(partials) if p is not None and p.num_rows]
    if not parts:
        return _LENBATCH_SCHEMA.empty_table()
    t = pa.concat_tables(parts)
    # final merge: boundary batches appear in ≤2 ranges (tiny driver table)
    bid = t.column("batch_id").to_numpy(zero_copy_only=False)
    order = np.argsort(bid, kind="stable")
    bid = bid[order]
    cnt = t.column("n_seqs").to_numpy(zero_copy_only=False)[order]
    mn = t.column("min_tok").to_numpy(zero_copy_only=False)[order]
    mx = t.column("max_tok").to_numpy(zero_copy_only=False)[order]
    sm = t.column("sum_tok").to_numpy(zero_copy_only=False)[order]
    starts = np.r_[0, np.flatnonzero(bid[1:] != bid[:-1]) + 1]
    n_seqs = np.add.reduceat(cnt, starts)
    min_tok = np.minimum.reduceat(mn, starts)
    max_tok = np.maximum.reduceat(mx, starts)
    sum_tok = np.add.reduceat(sm, starts)
    return pa.table(
        {
            "batch_id": pa.array(bid[starts]),
            "n_seqs": pa.array(n_seqs),
            "min_tok": pa.array(min_tok),
            "max_tok": pa.array(max_tok),
            "sum_tok": pa.array(sum_tok),
            "pad_waste": pa.array(n_seqs * max_tok - sum_tok),
        }
    )


@ray.remote
def _lenbatch_split(block_refs: list, ranges: int, width: int):
    """Map task: split meta blocks into contiguous n_tok intervals
    (``(n_tok - 1) // width`` — every row of one n_tok value lands in
    exactly one range, so per-range sorts compose to the global order)."""
    blocks = ray.get(list(block_refs))
    tables = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b]) for b in blocks
    ]
    tables = [x for x in tables if x.num_rows > 0]
    if not tables:
        return tuple(None for _ in range(ranges)) if ranges > 1 else None
    t = pa.concat_tables(tables) if len(tables) > 1 else tables[0]
    nt = t.column("n_tok").to_numpy(zero_copy_only=False)
    rng = (nt - 1) // width
    order = np.argsort(rng, kind="stable")
    bounds = np.searchsorted(rng[order], np.arange(1, ranges))
    parts = []
    for lo, hi in zip(np.r_[0, bounds], np.r_[bounds, len(order)]):
        parts.append(t.take(pa.array(order[lo:hi])) if hi > lo else None)
    return tuple(parts) if ranges > 1 else parts[0]


@ray.remote
def _lenbatch_sort(*parts):
    """Wave-1 reduce: sort one n_tok interval by (n_tok, doc_id); returns
    (sorted table, row count). The driver fetches ONLY the count — the
    sorted table ref feeds wave 2 without leaving the object store."""
    tables = [p for p in parts if p is not None]
    if not tables:
        return None, 0
    t = pa.concat_tables(tables) if len(tables) > 1 else tables[0]
    t = t.sort_by([("n_tok", "ascending"), ("doc_id", "ascending")])
    return t, t.num_rows


@ray.remote
def _lenbatch_aggregate(t, offset: int, batch_rows: int):
    """Wave-2: global ranks = offset + local position; per-batch partial
    aggregates via reduceat over the (already sorted) range."""
    if t is None or t.num_rows == 0:
        return None
    nt = t.column("n_tok").to_numpy(zero_copy_only=False)
    rn = offset + np.arange(nt.size, dtype=np.int64)
    bid = rn // batch_rows
    starts = np.r_[0, np.flatnonzero(bid[1:] != bid[:-1]) + 1]
    cnt = np.diff(np.r_[starts, nt.size])
    return pa.table(
        {
            "batch_id": pa.array(bid[starts]),
            "n_seqs": pa.array(cnt.astype(np.int64)),
            "min_tok": pa.array(np.minimum.reduceat(nt, starts)),
            "max_tok": pa.array(np.maximum.reduceat(nt, starts)),
            "sum_tok": pa.array(np.add.reduceat(nt, starts)),
        }
    )


# ---------------------------------------------------------------------------
# Exact sequence-content dedup
# ---------------------------------------------------------------------------


def _content_hash(
    offs: np.ndarray, vals: np.ndarray, tweak: np.uint64 = _U64(0)
) -> np.ndarray:
    """Order-sensitive 64-bit content hash per row (uint64), fully vectorized.

    h = mix( Σ_j mix(v_j + j·GOLD ^ tweak)  +  mix(len) ): each element is
    mixed with its INTRA-ROW position before a commutative sum, so
    permutations differ; segment sums come from a cumsum difference (no
    reduceat empty-segment pitfall). ``tweak=0`` (the default) is
    bit-identical to the historical hash; a nonzero tweak yields an
    independent second hash for 128-bit content identities
    (``seq_incremental_dedup``). Candidate-only contract at 64 bits:
    collisions are filtered by the exact verification pass."""
    lens = offs[1:] - offs[:-1]
    with np.errstate(over="ignore"):
        seg = vals[offs[0] : offs[-1]].astype(_U64)  # -1 → 2^64-1, deterministic
        total = seg.size
        intra = (
            np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(lens) - lens, lens)
        ).astype(_U64)
        hv = splitmix64((seg + intra * _GOLD) ^ tweak)
        c = np.zeros(total + 1, dtype=_U64)
        np.cumsum(hv, out=c[1:])
        sums = c[offs[1:] - offs[0]] - c[offs[:-1] - offs[0]]
        return splitmix64(sums + splitmix64(lens.astype(_U64)))


def _canary_prefix_hash(length: int) -> np.uint64:
    offs = np.array([0, length], dtype=np.int64)
    return _content_hash(offs, _CANARY_NP[:length].copy())[0]


_DUPSEQ_PREFIX_HASHES = np.array(
    [_canary_prefix_hash(DUPSEQ_LEN_BASE + i) for i in range(DUPSEQ_LEN_CHOICES)],
    dtype=_U64,
)


def _row_hashes(
    t: pa.Table, aug: bool = True
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(sfx, offs, vals, per-row content hash of the AUGMENTED view);
    ``aug=False`` hashes the plain input arrays."""
    sfx = _suffix_i64(t.column("doc_id"))
    offs, vals = _tokens_parts(t.column("tokens"))
    h = _content_hash(offs, vals)
    if aug:
        rep = (sfx >= 0) & (sfx % DUPSEQ_MOD == DUPSEQ_RES)
        if rep.any():
            h[rep] = _DUPSEQ_PREFIX_HASHES[
                (sfx[rep] % DUPSEQ_LEN_CHOICES).astype(np.int64)
            ]
    return sfx, offs, vals, h


_DUPSEQ_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("source", pa.string()),
        ("n_tok", pa.int32()),
        ("tlen", pa.int64()),
        ("group_rep", pa.string()),
        ("group_size", pa.int64()),
    ]
)


def seq_dup_token_arrays(sf_dir: str, augment: bool | None = None) -> pa.Table:
    """Rows whose (augmented-view) token arrays are EXACTLY duplicated
    corpus-wide; non-fixture corpora are hashed PLAIN (``_aug``).

    Output per duplicated row: (doc_id, source, n_tok, tlen, group_rep =
    min doc_id in the group, group_size). Candidate→recover: only rows whose
    64-bit content hash repeats are ever materialized; exact token-array
    equality is verified on the (tiny) candidate set."""
    aug = _aug(sf_dir, augment)
    seq = _seq_ds(sf_dir)

    def add_hash(t: pa.Table) -> pa.Table:
        _, _, _, h = _row_hashes(t, aug)
        return pa.table({"h": pa.array(h.view(np.int64))})

    from ..state.dupfinder import find_dup_hash_values

    hashed = seq.map_batches(add_hash, batch_format="pyarrow", batch_size=None).materialize()
    dup_h = find_dup_hash_values(hashed, "h")
    if dup_h.size == 0:
        return _DUPSEQ_SCHEMA.empty_table()
    dup_sorted = np.sort(dup_h.view(_U64))

    def candidates(t: pa.Table) -> pa.Table:
        sfx, offs, vals, h = _row_hashes(t, aug)
        pos = np.minimum(np.searchsorted(dup_sorted, h), dup_sorted.size - 1)
        mask = dup_sorted[pos] == h
        if not mask.any():
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.string()),
                    "source": pa.array([], type=pa.string()),
                    "n_tok": pa.array([], type=pa.int32()),
                    "ptok": pa.array([], type=pa.list_(pa.int32())),
                }
            )
        idx = np.flatnonzero(mask)
        sel = t.take(pa.array(idx))
        # augmented token arrays for candidate rows only (cold path)
        rep = aug & (sfx[idx] >= 0) & (sfx[idx] % DUPSEQ_MOD == DUPSEQ_RES)
        ptok = []
        for j, i in enumerate(idx):
            if rep[j]:
                L = DUPSEQ_LEN_BASE + int(sfx[i] % DUPSEQ_LEN_CHOICES)
                ptok.append(_CANARY_NP[:L].tolist())
            else:
                ptok.append(vals[offs[i] : offs[i + 1]].tolist())
        return pa.table(
            {
                "doc_id": sel.column("doc_id"),
                "source": sel.column("source"),
                "n_tok": sel.column("n_tok"),
                "ptok": pa.array(ptok, type=pa.list_(pa.int32())),
            }
        )

    cand = _collect(seq.map_batches(candidates, batch_format="pyarrow", batch_size=None))
    if cand.num_rows == 0:
        return _DUPSEQ_SCHEMA.empty_table()
    # exact grouping of the candidate set (driver-side, candidate-only)
    keys = [
        np.asarray(x, dtype=np.int32).tobytes() if x is not None else b""
        for x in cand.column("ptok").to_pylist()
    ]
    groups: dict[bytes, list[int]] = {}
    for i, kb in enumerate(keys):
        groups.setdefault(kb, []).append(i)
    doc_ids = cand.column("doc_id").to_pylist()
    out_rows: list[int] = []
    reps: list[str | None] = []
    sizes: list[int] = []
    for members in groups.values():
        if len(members) < 2:
            continue  # 64-bit collision filtered exactly
        named = [doc_ids[i] for i in members if doc_ids[i] is not None]
        rep = min(named) if named else None
        for i in members:
            out_rows.append(i)
            reps.append(rep)
            sizes.append(len(members))
    if not out_rows:
        return _DUPSEQ_SCHEMA.empty_table()
    sel = cand.take(pa.array(out_rows))
    tlen = pc.cast(pc.list_value_length(sel.column("ptok")), pa.int64())
    return pa.table(
        {
            "doc_id": sel.column("doc_id"),
            "source": sel.column("source"),
            "n_tok": sel.column("n_tok"),
            "tlen": tlen,
            "group_rep": pa.array(reps, type=pa.string()),
            "group_size": pa.array(sizes, type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Detokenization (decode) and unigram-LM scoring
# ---------------------------------------------------------------------------

DETOK_PREFIX_CHARS = 64  # driver-hashed text prefix length

def seq_detokenize(
    sf_dir: str, with_text: bool = False, vocab_path: "str | None" = None
) -> rd.Dataset:
    """Decode token ids back to text — the audit/inspection step every
    training-data pipeline needs (sample rows, eyeball the decode).

    The vocabulary is a genuine DIMENSION TABLE (``sources/dimensions``:
    (token_id, piece) parquet, written deterministically when no
    ``vocab_path`` is given): the dense piece array is loaded once on the
    driver, ``ray.put`` ONCE, and each batch decodes by one vectorized
    Arrow ``take`` gather — never re-shipped per task, no per-row Python.
    OOV counts against the dimension: ids outside [0, VOCAB), null
    elements (the -1 sentinel) AND ids absent from the vocab (dropped
    slots) all decode to ``"<unk>"`` — a range check alone would miss the
    absent slots.

    Default output keeps the driver-hashable audit columns (oov count,
    decoded length, 64-char prefix — the prefix pins token order, the
    length pins the whole decode); ``with_text=True`` adds the full decoded
    string column. One streaming pass, no shuffle.
    """
    from ..sources.dimensions import ensure_vocab_dim, load_vocab_pieces

    vp = ensure_vocab_dim() if vocab_path is None else vocab_path
    pieces_ref = ray.put(load_vocab_pieces(vp))

    def decode(t: pa.Table, _cache={}) -> pa.Table:
        pieces = _cache.get("p")
        if pieces is None:
            pieces = _cache["p"] = ray.get(pieces_ref)
        toks = t.column("tokens")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        n = len(toks)
        valid_list = pc.is_valid(toks)
        offs, vals = _tokens_parts(toks.fill_null([]))
        # re-base to the row span so flat strings, offsets and masks align
        rel = vals[offs[0] : offs[-1]]
        offs = offs - offs[0]
        in_range = (rel >= 0) & (rel < VOCAB)
        gathered = pieces.take(
            pa.array(np.where(in_range, rel, 0).astype(np.int64))
        )
        # OOV = out-of-range OR absent from the vocab dimension (null piece)
        oov = ~in_range | np.asarray(
            pc.is_null(gathered).to_numpy(zero_copy_only=False), dtype=bool
        )
        flat = pc.fill_null(
            pc.if_else(pa.array(~oov), gathered, pa.scalar(None, pa.string())),
            "<unk>",
        )
        # large_list: a block's flat token count may exceed 2^31 at design
        # scale — int64 offsets end-to-end, same as the pack-execute path
        lists = pa.LargeListArray.from_arrays(pa.array(offs, type=pa.int64()), flat)
        txt = pc.binary_join(lists, " ")
        # null token LISTS decode to NULL text (mirrored by the oracle)
        txt = pc.if_else(valid_list, txt, pa.scalar(None, pa.string()))
        row = np.repeat(np.arange(n, dtype=np.int64), offs[1:] - offs[:-1])
        n_oov = np.bincount(row[oov], minlength=n).astype(np.int64) if row.size else np.zeros(n, dtype=np.int64)
        cols = {
            "doc_id": t.column("doc_id"),
            "source": t.column("source"),
            "n_tok": t.column("n_tok"),
            "tlen": pc.cast(pc.list_value_length(toks), pa.int64()),
            "n_oov": pc.if_else(valid_list, pa.array(n_oov), pa.scalar(None, pa.int64())),
            "text_len": pc.utf8_length(txt).cast(pa.int64()),
            "text_prefix": pc.utf8_slice_codeunits(txt, 0, DETOK_PREFIX_CHARS),
        }
        if with_text:
            cols["text"] = txt
        return pa.table(cols)

    return _seq_ds(sf_dir).map_batches(decode, batch_format="pyarrow", batch_size=None)


SEQLM_REF_MOD = 11  # suffix % this == 0 → reference-LM slice (~9% of rows)


def _seqlm_counts(sf_dir: str, ref_mod: int = SEQLM_REF_MOD) -> tuple[np.ndarray, int]:
    """Dense unigram counts over the reference slice: one VOCAB-length int64
    vector per batch (combiner), summed on the driver. The count vector is
    256 KB at VOCAB=32k — broadcastable at any corpus scale, and the
    groupby a string-keyed LM would need simply never happens."""

    def partial(t: pa.Table) -> pa.Table:
        sfx = _suffix_i64(t.column("doc_id"))
        ref = (sfx >= 0) & (sfx % ref_mod == 0)
        if not ref.any():
            return pa.table({"c": pa.array([], type=pa.int64())})
        offs, vals = _tokens_parts(t.filter(pa.array(ref)).column("tokens"))
        seg = vals[offs[0] : offs[-1]]
        inv = seg[(seg >= 0) & (seg < VOCAB)]
        c = np.bincount(inv, minlength=VOCAB).astype(np.int64)
        # total INCLUDING oov/null-sentinel tokens rides in one extra slot
        return pa.table({"c": pa.array(np.r_[c, seg.size])})

    tbl = _collect(
        _seq_ds(sf_dir, columns=["doc_id", "tokens"]).map_batches(
            partial, batch_format="pyarrow", batch_size=None
        )
    )
    if tbl.num_rows == 0 or "c" not in tbl.column_names:
        return np.zeros(VOCAB, dtype=np.int64), 0  # 0-row corpus: no blocks
    arr = tbl.column("c").to_numpy(zero_copy_only=False)
    if arr.size == 0:
        return np.zeros(VOCAB, dtype=np.int64), 0
    mat = arr.reshape(-1, VOCAB + 1).sum(axis=0)
    return mat[:VOCAB], int(mat[VOCAB])


def seq_unigram_lm_score(sf_dir: str, ref_mod: int = SEQLM_REF_MOD) -> rd.Dataset:
    """Per-sequence add-one-smoothed unigram cross-entropy against a
    reference slice of the corpus — the token-level CCNet-style perplexity
    quality proxy (``doc_lm_score``'s design, one level down the stack and
    with a DENSE count vector instead of a string-keyed LM).

    P(t) = (c[t] + 1) / (total + VOCAB); out-of-vocabulary ids (and the -1
    null-element sentinel) take c = 0. Float parity is the proven
    ``doc_lm_score`` contract: each token's -log2 P is quantized to integer
    MILLIBITS (half-away, = DuckDB ``round``), so per-row totals are
    order-independent integer sums; the per-token millibit value is
    precomputed ONCE per worker as a VOCAB-length table and the whole score
    pass is one gather + cumsum-diff — no log evaluations in the hot loop.
    """
    from ..core.rounding import round_half_away

    counts, total = _seqlm_counts(sf_dir, ref_mod)
    state_ref = ray.put((counts, total))

    def score(t: pa.Table, _cache={}) -> pa.Table:
        mb = _cache.get("mb")
        if mb is None:
            counts, total = ray.get(state_ref)
            vals_mb = round_half_away(
                -np.log2((counts + 1) * 1.0 / (total + VOCAB)) * 1000, 0
            ).astype(np.int64)
            oov_mb = int(
                round_half_away(
                    np.array([-np.log2(1.0 / (total + VOCAB)) * 1000]), 0
                )[0]
            )
            mb = _cache["mb"] = (vals_mb, oov_mb)
        vals_mb, oov_mb = mb
        toks = t.column("tokens")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        valid_list = pc.is_valid(toks)
        offs, vals = _tokens_parts(toks.fill_null([]))
        inv = (vals >= 0) & (vals < VOCAB)
        per_tok = np.where(inv, vals_mb[np.clip(vals, 0, VOCAB - 1)], oov_mb)
        csum = np.zeros(per_tok.size + 1, dtype=np.int64)
        np.cumsum(per_tok, out=csum[1:])
        tot = csum[offs[1:]] - csum[offs[:-1]]
        lens = (offs[1:] - offs[:-1]).astype(np.int64)
        bits = pa.array(
            np.where(lens > 0, tot * 1.0 / (1000.0 * np.maximum(lens, 1)), np.nan)
        )
        bits = pc.if_else(pc.and_(valid_list, pa.array(lens > 0)), bits, pa.scalar(None, pa.float64()))
        zero = pa.scalar(None, pa.int64())
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "source": t.column("source"),
                "n_tok": t.column("n_tok"),
                "n_scored": pc.if_else(valid_list, pa.array(lens), zero),
                "total_millibits": pc.if_else(valid_list, pa.array(tot), zero),
                "bits_per_tok": bits,
            }
        )

    return _seq_ds(sf_dir).map_batches(score, batch_format="pyarrow", batch_size=None)


def _dense_group_sum(tbl: pa.Table, width: int) -> tuple[list, np.ndarray]:
    """Sum the fixed-width int64 list column ``c`` of a partials table per
    distinct ``source`` — via the ListArray's contiguous values buffer
    reshaped to (rows, width), NOT ``np.stack`` over per-row objects (which
    materializes thousands of small ndarrays and copies ~1 GB at sf0.1).
    Returns (sources in first-seen order with None for NULL, summed
    (n_sources, width) matrix)."""
    col = tbl.column("c")
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offs = col.offsets.to_numpy(zero_copy_only=False)
    flat = col.values.to_numpy(zero_copy_only=False)
    flat = flat[offs[0] : offs[-1]].reshape(len(tbl), width)
    srcs = np.asarray(tbl.column("source").to_numpy(zero_copy_only=False), dtype=object)
    codes, uniq = pd.factorize(pd.Series(srcs).astype("string"), use_na_sentinel=False)
    out = np.zeros((len(uniq), width), dtype=np.int64)
    for ci in range(len(uniq)):  # |sources| iterations, vectorized inside
        out[ci] = flat[codes == ci].sum(axis=0)
    names = [None if pd.isna(u) else str(u) for u in uniq]
    return names, out


def seq_source_entropy(sf_dir: str) -> pa.Table:
    """Per-source unigram entropy and vocabulary-concentration audit — the
    token-level corpus-quality fingerprint (a source whose entropy collapses
    or whose top token dominates is boilerplate/mis-tokenized; the LM-score
    op ranks ROWS, this ranks SOURCES).

    Aggregation is the dense-count-vector pattern (``_seqlm_counts``): each
    batch emits one (VOCAB+2)-slot int64 row PER SOURCE PRESENT (256 KB at
    VOCAB=32k; the two extra slots carry the oov count and ride-along
    total), and the driver group-sums the handful of source-keyed vectors —
    no string-keyed token groupby ever happens. At 10^12 rows the partial
    count is batches × |sources|; interpose one combine ``map_batches``
    (sum vectors per source within a task) to keep the driver's share at
    |sources| × tasks.

    Float parity is the proven ``doc_lm_score``/``seq_unigram_lm_score``
    contract: each distinct token's -log2(c/N) is quantized to integer
    MILLIBITS (half-away = DuckDB ``round``), totals are exact integer sums
    of c·mb, and the single final division is rounded to 6 — so the SQL
    oracle agrees bit-for-bit. Null token ELEMENTS take the -1 sentinel
    (oov), null token LISTS contribute nothing, NULL source is its own
    group. Ties for the top token break to the smallest id on both sides.

    Output: (source, n_tokens, n_oov, distinct_tokens, top_token,
    top_count, total_millibits, bits_per_tok).
    """
    from ..core.rounding import round_half_away as _rha_

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column("source")
        toks = t.column("tokens")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        offs, vals = _tokens_parts(toks.fill_null([]))
        seg = vals[offs[0] : offs[-1]]
        offs = offs - offs[0]
        lens = offs[1:] - offs[:-1]
        src = np.asarray(ids.to_numpy(zero_copy_only=False), dtype=object)
        # group batch rows by source (few distinct values; factorize once)
        codes, uniq = pd.factorize(pd.Series(src), use_na_sentinel=False)
        out_src: list = []
        out_vec: list = []
        tok_code = np.repeat(codes, lens)
        inv = (seg >= 0) & (seg < VOCAB)
        for ci, sname in enumerate(uniq):
            m = tok_code == ci
            sv = seg[m & inv]
            c = np.bincount(sv, minlength=VOCAB).astype(np.int64)
            n_oov = int(m.sum() - sv.size)
            out_src.append(None if (isinstance(sname, float)) or sname is None else sname)
            out_vec.append(np.r_[c, n_oov, int(m.sum())])
        if not out_src:
            return pa.table(
                {
                    "source": pa.array([], type=pa.string()),
                    "c": pa.array([], type=pa.list_(pa.int64())),
                }
            )
        return pa.table(
            {
                "source": pa.array(out_src, type=pa.string()),
                "c": pa.array([v for v in out_vec], type=pa.list_(pa.int64())),
            }
        )

    tbl = _collect(
        _seq_ds(sf_dir, columns=["source", "tokens"]).map_batches(
            partial, batch_format="pyarrow", batch_size=None
        )
    )
    schema = pa.schema(
        [
            ("source", pa.string()),
            ("n_tokens", pa.int64()),
            ("n_oov", pa.int64()),
            ("distinct_tokens", pa.int64()),
            ("top_token", pa.int64()),
            ("top_count", pa.int64()),
            ("total_millibits", pa.int64()),
            ("bits_per_tok", pa.float64()),
        ]
    )
    if tbl.num_rows == 0:
        return schema.empty_table()
    names, summed = _dense_group_sum(tbl, VOCAB + 2)
    rows = []
    for ci, sname in enumerate(names):
        v = summed[ci]
        c, n_oov = v[:VOCAB], int(v[VOCAB])
        n = int(c.sum())
        if n == 0:
            rows.append((sname, 0, n_oov, 0, None, None, 0, None))
            continue
        nz = np.flatnonzero(c)
        mb = _rha_(-np.log2(c[nz] / n) * 1000, 0).astype(np.int64)
        total_mb = int((c[nz] * mb).sum())
        top = int(nz[np.argmax(c[nz])])
        rows.append(
            (
                sname,
                n,
                n_oov,
                int(nz.size),
                top,
                int(c[top]),
                total_mb,
                float(_rha_(np.array([total_mb / (1000.0 * n)]), 6)[0]),
            )
        )
    rows.sort(key=lambda r: (r[0] is not None, r[0]))
    return pa.table(
        {f.name: pa.array([r[i] for r in rows], type=f.type) for i, f in enumerate(schema)}
    )


# ---------------------------------------------------------------------------
# Per-source boundary-token audit (BOS/EOS placement drift validation)
# ---------------------------------------------------------------------------

BOUNDARY_TOP_N = 3  # ranks reported per (source, position)
BOUNDARY_PCT = 5    # anchored ⇔ modal boundary token covers ≥ this % of rows

_BOUNDARY_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("position", pa.string()),
        ("rnk", pa.int64()),
        ("token", pa.int64()),
        ("cnt", pa.int64()),
        ("n_rows", pa.int64()),
        ("anchored", pa.int64()),
    ]
)


def seq_boundary_audit(
    sf_dir: str,
    top_n: int = BOUNDARY_TOP_N,
    pct: int = BOUNDARY_PCT,
    augment: bool | None = None,
) -> pa.Table:
    """Per-(source, boundary-position) top-``top_n`` tokens with an
    ``anchored`` flag — the BOS/EOS placement audit. A pre-tokenized corpus
    whose tokenizer job prepends BOS / appends EOS has a single dominant
    first/last token per source; a source where that anchor disappears (or
    a new one appears) was tokenized by a drifted job. The flag is exact
    integer cross-multiplication (modal count · 100 ≥ n_rows · pct), so no
    float threshold can disagree with the SQL oracle.

    Aggregation is the dense-count-vector pattern (``seq_source_entropy``):
    each batch emits one (2·(VOCAB+1)+1)-slot int64 row per source present
    (~½ MB at VOCAB=32k — first-token counts, last-token counts, row
    count), and the driver group-sums the handful of source-keyed vectors;
    no (source, token) row ever shuffles and driver state is bounded by
    |sources| × VOCAB, independent of corpus size. Boundary tokens outside
    [0, VOCAB) — planted OOV/negative values, null elements — audit under
    the -1 invalid sentinel (mirrored in SQL via CASE). On fixture corpora
    the canary prefix patch (``DECON_PATCH_MOD``) provides the non-vacuous
    anchor: every source's first position is anchored (~1/13 ≥ 5%), no
    last position is (random tails) — both flag branches are exercised.

    Reference analog: per-column allowed-value prescreen over a broadcast
    dictionary (``prompts/banningredients.py:146-197``) re-expressed as a
    distribution audit; SURVEY §2.5 G5/G6.
    """
    aug = _aug(sf_dir, augment)
    V1 = VOCAB + 1

    def partial(t: pa.Table) -> pa.Table:
        toks = t.column("tokens")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        keep = pc.and_(pc.is_valid(toks), pc.greater(pc.list_value_length(toks), 0))
        cols = {"source": t.column("source"), "tokens": toks}
        if aug:
            cols["doc_id"] = t.column("doc_id")
        sel = pa.table(cols).filter(keep)
        if sel.num_rows == 0:
            return pa.table(
                {
                    "source": pa.array([], type=pa.string()),
                    "c": pa.array([], type=pa.list_(pa.int64())),
                }
            )
        offs, vals = _tokens_parts(sel.column("tokens"))
        if aug:
            sfx = _suffix_i64(sel.column("doc_id"))
            prows = np.flatnonzero(
                (sfx >= 0) & (sfx % DECON_PATCH_MOD == DECON_PATCH_RES)
            )
            vals = _patch_prefix(offs, vals, prows)
        f = vals[offs[:-1]].astype(np.int64)
        last = vals[offs[1:] - 1].astype(np.int64)
        f = np.where((f >= 0) & (f < VOCAB), f, -1)
        last = np.where((last >= 0) & (last < VOCAB), last, -1)
        src = np.asarray(
            sel.column("source").to_numpy(zero_copy_only=False), dtype=object
        )
        codes, uniq = pd.factorize(pd.Series(src), use_na_sentinel=False)
        out_src: list = []
        out_vec: list = []
        for ci, sname in enumerate(uniq):
            m = codes == ci
            cf = np.bincount(f[m] + 1, minlength=V1).astype(np.int64)
            cl = np.bincount(last[m] + 1, minlength=V1).astype(np.int64)
            out_src.append(
                None if sname is None or isinstance(sname, float) else sname
            )
            out_vec.append(np.r_[cf, cl, int(m.sum())])
        return pa.table(
            {
                "source": pa.array(out_src, type=pa.string()),
                "c": pa.array(out_vec, type=pa.list_(pa.int64())),
            }
        )

    cols = ["doc_id", "source", "tokens"] if aug else ["source", "tokens"]
    tbl = _collect(
        _seq_ds(sf_dir, columns=cols).map_batches(
            partial, batch_format="pyarrow", batch_size=None
        )
    )
    if tbl.num_rows == 0:
        return _BOUNDARY_SCHEMA.empty_table()
    names, summed = _dense_group_sum(tbl, 2 * V1 + 1)
    rows = []
    for ci, sname in enumerate(names):
        v = summed[ci]
        n_rows = int(v[-1])
        for pos, c in (("first", v[:V1]), ("last", v[V1 : 2 * V1])):
            nz = np.flatnonzero(c)
            if nz.size == 0:
                continue
            order = nz[np.lexsort((nz, -c[nz]))][: int(top_n)]
            anchored = int(int(c[order[0]]) * 100 >= n_rows * int(pct))
            for r, slot in enumerate(order, 1):
                rows.append(
                    (sname, pos, r, int(slot) - 1, int(c[slot]), n_rows, anchored)
                )
    rows.sort(key=lambda r: (r[0] is not None, r[0], r[1], r[2]))
    return pa.table(
        {
            f.name: pa.array([r[i] for r in rows], type=f.type)
            for i, f in enumerate(_BOUNDARY_SCHEMA)
        }
    )


# ---------------------------------------------------------------------------
# Capstone: full training-sequence preparation in one composition
# ---------------------------------------------------------------------------


def _intra(counts: np.ndarray) -> np.ndarray:
    """0..c-1 within each segment of ``counts`` (flat, vectorized)."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    return np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )


def _capstone_view(
    t: pa.Table, aug: bool = True
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, pa.Table]:
    """The capstone's augmented token view for rows with non-null doc_id AND
    tokens: DUPSEQ whole-array replacement wins over the DECON prefix patch
    (replacement overwrites the whole array, so precedence only needs to be
    fixed and mirrored). Returns (sfx, offs_eff [0-based], vals_eff,
    row_selector_mask_applied_table) aligned to the FILTERED table.

    ``aug=False`` (user corpora, ADVICE r2): the view is the PLAIN input —
    no canary splices, no prefix patches."""
    ids = t.column("doc_id").combine_chunks()
    toks = t.column("tokens")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    keep = pc.and_(pc.is_valid(ids), pc.is_valid(toks))
    sel = t.filter(keep)
    if sel.num_rows == 0:
        e = np.empty(0, dtype=np.int64)
        return e, np.zeros(1, dtype=np.int64), np.empty(0, dtype=np.int32), e, sel
    sfx = _suffix_i64(sel.column("doc_id"))
    offs, vals = _tokens_parts(sel.column("tokens"))
    lens = offs[1:] - offs[:-1]
    if not aug:
        return sfx, offs - offs[0], vals[offs[0] : offs[-1]], lens, sel
    prows = np.flatnonzero((sfx >= 0) & (sfx % DECON_PATCH_MOD == DECON_PATCH_RES))
    vals_p = _patch_prefix(offs, vals, prows)
    dup = (sfx >= 0) & (sfx % DUPSEQ_MOD == DUPSEQ_RES)
    lens_eff = np.where(dup, DUPSEQ_LEN_BASE + sfx % DUPSEQ_LEN_CHOICES, lens)
    offs_eff = np.concatenate(([0], np.cumsum(lens_eff)))
    span = vals_p[offs[0] : offs[-1]]
    drows = np.flatnonzero(dup)
    if drows.size == 0:
        return sfx, offs_eff, span, lens_eff, sel
    # DUPSEQ rows are ~1/257 of the corpus: drop their original tokens with
    # ONE boolean-mask compaction (a single C pass over the buffer) and
    # splice their canary replacements in with one np.concatenate — no
    # O(total-tokens) int64 index temporaries (measured 2.3 s → ~0.2 s per
    # 50k-row block at sf0.1)
    keep = np.ones(span.size, dtype=bool)
    base = offs - offs[0]
    cd = lens[drows]
    if cd.sum():
        keep[np.repeat(base[:-1][drows], cd) + _intra(cd)] = False
    main = span[keep]
    # insertion points in compacted coordinates: dropped-tokens-before is a
    # cumsum over the TINY dup-row lengths (not over the 50M-element mask)
    kept_before = base[:-1][drows] - np.concatenate(([0], np.cumsum(cd)))[:-1]
    pieces = []
    prev = 0
    for pos, r in zip(kept_before, drows):
        pieces.append(main[prev:pos])
        pieces.append(_CANARY_NP[: lens_eff[r]])
        prev = pos
    pieces.append(main[prev:])
    return sfx, offs_eff, np.concatenate(pieces), lens_eff, sel


def _capstone_training_rows(t: pa.Table, aug: bool = True):
    return _training_rows_from_view(*_capstone_view(t, aug), holdout=aug)


def _training_rows_from_view(sfx, offs, vals, lens, sel, holdout: bool = True):
    """(sel_table, sfx, offs_eff, vals_eff, lens_eff) for the capstone's
    TRAINING-candidate population: valid (1 ≤ len ≤ 2048, all tokens in
    [0, VOCAB), allowlisted source) and not in the benchmark holdout
    (``holdout=False`` on user corpora: no fixture holdout slice exists,
    so no rows are excluded as "benchmark")."""
    if sel.num_rows == 0:
        return sel, sfx, offs, vals, lens
    # per-row min/max over the augmented buffer (cummin-free: reduceat is
    # safe here because zero-length rows are invalid anyway and masked)
    from ..core.schema import MAX_N_TOK_DEFAULT

    ok_len = (lens >= 1) & (lens <= MAX_N_TOK_DEFAULT)
    tmin = np.full(sel.num_rows, -1, dtype=np.int64)
    tmax = np.full(sel.num_rows, 1 << 40, dtype=np.int64)
    nz = lens > 0
    if nz.any():
        st = offs[:-1][nz]
        tmin[nz] = np.minimum.reduceat(vals, st) if st.size else tmin[nz]
        tmax[nz] = np.maximum.reduceat(vals, st) if st.size else tmax[nz]
        # reduceat runs to the NEXT start, so mask rows after the last
        # nonzero segment correctly: reduceat over starts covers to end of
        # vals for the final segment — exact because trailing zero-length
        # rows contribute no values
    src = sel.column("source")
    src_ok = pc.fill_null(pc.is_in(src, value_set=pa.array(list(_ALLOWED))), False)
    src_ok = np.asarray(src_ok.to_numpy(zero_copy_only=False), dtype=bool)
    keep = ok_len & (tmin >= 0) & (tmax < VOCAB) & src_ok
    if holdout:
        keep &= ~((sfx >= 0) & (sfx % DECON_HOLD_MOD == 0))
    if keep.all():
        return sel, sfx, offs, vals, lens
    idx = np.flatnonzero(keep)
    sel2 = sel.take(pa.array(idx))
    lens2 = lens[idx]
    offs2 = np.concatenate(([0], np.cumsum(lens2)))
    # compact the values buffer by DROPPING rejected rows' tokens (one
    # boolean-mask pass) — rejects are ~10% of rows, so the mask scatter is
    # small and there are no O(total-tokens) index temporaries
    drop = np.flatnonzero(~keep)
    mask = np.ones(int(offs[-1] - offs[0]), dtype=bool)
    cdp = lens[drop]
    if cdp.sum():
        mask[np.repeat(offs[:-1][drop] - offs[0], cdp) + _intra(cdp)] = False
    vals2 = vals[offs[0] : offs[-1]][mask]
    return sel2, sfx[idx], offs2, vals2, lens2


def _capstone_holdout_grams(t: pa.Table) -> pa.Table:
    return _holdout_grams_from_view(*_capstone_view(t))


_EMPTY_GRAMS = pa.table({"g": pa.array([], type=_GRAM_TYPE)})


def _holdout_grams_from_view(sfx, offs, vals, _lens, _sel) -> pa.Table:
    """Benchmark gram combiner over the CAPSTONE view's holdout slice."""
    hold = np.flatnonzero((sfx >= 0) & (sfx % DECON_HOLD_MOD == 0))
    if hold.size == 0:
        return pa.table({"g": pa.array([], type=_GRAM_TYPE)})
    # gather holdout rows' segments into a compact buffer
    lens = offs[1:] - offs[:-1]
    ch = lens[hold]
    sub = vals[np.repeat(offs[:-1][hold], ch) + _intra(ch)]
    soff = np.concatenate(([0], np.cumsum(ch)))
    win, _, _ = _gram_windows(soff, sub, DECON_K)
    u = np.unique(_void(win, DECON_K))
    garr = pa.Array.from_buffers(_GRAM_TYPE, len(u), [None, pa.py_buffer(u.tobytes())])
    return pa.table({"g": garr})


def prepare_training_sequences(
    sf_dir: str,
    budget: int | None = None,
    n_shards: int | None = None,
    out_dir: str | None = None,
    augment: bool | None = None,
) -> rd.Dataset:
    """The tokens-axis CAPSTONE: the full training-sequence preparation flow
    over the north-star table, every stage exact and SQL-expressible —

      validity gate (augmented view: 1 ≤ len ≤ 2048, all tokens in
        [0, VOCAB), allowlisted source; the -1 null-element sentinel fails
        the range check, mirroring the row-check kernels)
      → benchmark holdout exclusion (suffix % DECON_HOLD_MOD == 0 rows are
        the eval suite — they index the decontamination pass and never
        train)
      → exact content dedup (keep the min-doc_id copy of each duplicated
        token array; rows TIED on (array, min doc_id) are mutually
        indistinguishable and all kept — the deterministic,
        window-SQL-mirrorable rule)
      → decontamination (drop survivors sharing any token 8-gram with the
        holdout)
      → greedy pack plan (the ``seq_pack_plan`` shard-range walk over the
        survivors, n_eff = augmented length as cost)

    Dataflow (THREE reads of storage, the minimum under the two inherent
    barriers — the gram/hash state must exist before candidates can be
    recovered, and the loser set before the final filter): the SCOUT pass
    computes the augmented view once per batch and emits BOTH the holdout
    gram combiner rows and the training-row content hashes as one union
    table (one parquet read instead of two); grams build the broadcast
    index, hashes feed the ``state/dupfinder`` tree reduce; the candidate
    pass recovers only dup-hash rows and derives the loser set exactly on
    the driver — keyed by (hash, doc_id) with the candidate ARRAYS kept
    for an exact byte re-verify, so duplicate doc_ids and 64-bit
    collisions cannot misfire; the final pass re-reads the corpus ONCE,
    applies every predicate fused, and feeds 40 B/row metadata into the
    pack split/reduce. Token payloads never shuffle at any stage.
    """
    from .textprep import (
        SEQ_PACK_BUDGET,
        SEQ_PACK_SHARDS,
        _SEQ_PACK_EMPTY,
        _seq_pack_reduce,
        _seq_pack_split,
        _shard_cols,
    )

    budget = SEQ_PACK_BUDGET if budget is None else budget
    n_shards = SEQ_PACK_SHARDS if n_shards is None else n_shards
    aug = _aug(sf_dir, augment)
    params = {"budget": budget, "n_shards": n_shards, "augment": aug}
    if out_dir is not None:
        done = _read_finished_plan(out_dir, params)
        if done is not None:  # resume: skip ALL recomputation
            return done

    # --- scout pass: holdout grams + training-row hashes in ONE read (the
    # augmented view is computed once per batch and shared by both halves;
    # plain user corpora have no holdout slice, so their gram half is empty
    # and the decontamination stage naturally no-ops)
    def scout(t: pa.Table) -> pa.Table:
        view = _capstone_view(t, aug)
        gt = _holdout_grams_from_view(*view) if aug else _EMPTY_GRAMS
        sel, sfx, offs, vals, lens = _training_rows_from_view(*view, holdout=aug)
        ng, nh = gt.num_rows, sel.num_rows
        h = (
            _content_hash(offs, vals).view(np.int64)
            if nh
            else np.empty(0, dtype=np.int64)
        )
        return pa.table(
            {
                "g": pa.concat_arrays(
                    [gt.column("g").combine_chunks(), pa.nulls(nh, _GRAM_TYPE)]
                ),
                "h": pa.concat_arrays(
                    [pa.nulls(ng, pa.int64()), pa.array(h, type=pa.int64())]
                ),
            }
        )

    from ..state.dupfinder import find_dup_hash_values

    # bounded batches on every big-temp pass (scout / candidates / final):
    # whole read blocks first-touch hundreds of MB of numpy temps per task
    # in fresh malloc arenas (window hashes, gram matrices, content-hash
    # buffers) — the seq_repetition_scores lesson; 8k rows keeps each batch
    # ~15 MB so workers amortize their arenas across ~dozens of batches
    # (12.8M-row A/B: seq_decontaminate's identical scan went 156 s → 63 s)
    scouted = (
        _seq_ds(sf_dir, columns=["doc_id", "tokens", "source"])
        .map_batches(scout, batch_format="pyarrow", batch_size=8192)
        .materialize()
    )
    # gram index: driver argsort below the crossover, distributed Dataset
    # sort above it (the benchmark-index decision logic, shared) — 28M-gram
    # fixtures previously went through the single-threaded GramIndex.build
    idx = gram_index_from_ds(
        scouted.map_batches(
            lambda t: t.filter(pc.is_valid(t.column("g"))).select(["g"]),
            batch_format="pyarrow",
            batch_size=None,
        )
    )
    gram_ref = ray.put(idx.parts())
    hashed = scouted.map_batches(
        lambda t: t.filter(pc.is_valid(t.column("h"))).select(["h"]),
        batch_format="pyarrow",
        batch_size=None,
    ).materialize()
    dup_h = find_dup_hash_values(hashed, "h")
    losers: dict[tuple[int, str], set[bytes]] = {}
    if dup_h.size:
        dup_sorted = np.sort(dup_h.view(_U64))

        def candidates(t: pa.Table) -> pa.Table:
            sel, sfx, offs, vals, lens = _capstone_training_rows(t, aug)
            if sel.num_rows == 0:
                return pa.table(
                    {
                        "doc_id": pa.array([], type=pa.string()),
                        "h": pa.array([], type=pa.int64()),
                        "b": pa.array([], type=pa.binary()),
                    }
                )
            h = _content_hash(offs, vals)
            pos = np.minimum(np.searchsorted(dup_sorted, h), dup_sorted.size - 1)
            m = dup_sorted[pos] == h
            ii = np.flatnonzero(m)
            return pa.table(
                {
                    "doc_id": sel.column("doc_id").take(pa.array(ii)),
                    "h": pa.array(h[ii].view(np.int64)),
                    "b": pa.array(
                        [vals[offs[i] : offs[i + 1]].tobytes() for i in ii],
                        type=pa.binary(),
                    ),
                }
            )

        cand = _collect(
            _seq_ds(sf_dir, columns=["doc_id", "tokens", "source"]).map_batches(
                candidates, batch_format="pyarrow", batch_size=8192
            )
        )
        groups: dict[bytes, list[tuple[str, int]]] = {}
        for did, hv, b in zip(
            cand.column("doc_id").to_pylist(),
            cand.column("h").to_pylist(),
            cand.column("b").to_pylist(),
        ):
            groups.setdefault(b, []).append((did, hv))
        for b, members in groups.items():
            if len(members) < 2:
                continue
            rep = min(d for d, _ in members)
            for did, hv in members:
                if did != rep:
                    losers.setdefault((hv, did), set()).add(b)
    loser_ref = ray.put(losers)

    # --- final fused pass → pack metadata
    def final(t: pa.Table, _cache={}) -> pa.Table:
        st = _cache.get("st")
        if st is None:
            lm = ray.get(loser_ref)
            lh = np.sort(np.array([k[0] for k in lm], dtype=np.int64))
            st = _cache["st"] = (GramIndex(*ray.get(gram_ref)), lm, lh)
        index, loser_map, loser_hashes = st
        sel, sfx, offs, vals, lens = _capstone_training_rows(t, aug)
        n = sel.num_rows
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.string()),
                "doc_num": pa.array([], type=pa.int64()),
                "shard": pa.array([], type=pa.int64()),
                "shuffle_key": pa.array([], type=pa.int64()),
                "n_tok": pa.array([], type=pa.int64()),
            }
        )
        if n == 0:
            return empty
        keep = np.ones(n, dtype=bool)
        if loser_map:
            hi = _content_hash(offs, vals).view(np.int64)
            pos = np.minimum(np.searchsorted(loser_hashes, hi), loser_hashes.size - 1)
            maybe = np.flatnonzero(loser_hashes[pos] == hi)  # tiny: losers only
            if maybe.size:
                ids = sel.column("doc_id").take(pa.array(maybe)).to_pylist()
                for j, i in enumerate(maybe):
                    s = loser_map.get((int(hi[i]), ids[j]))
                    if s is not None and vals[offs[i] : offs[i + 1]].tobytes() in s:
                        keep[i] = False
        # decontamination on the remaining rows
        if index.h.size:
            starts, gdoc, _m = _window_starts(offs, DECON_K)
            if starts.size:
                gmask = keep[gdoc]
                starts2, gdoc2 = starts[gmask], gdoc[gmask]
                if starts2.size:
                    hh = _window_hash64(vals, DECON_K)[starts2]
                    cndt = index.maybe(hh)
                    if cndt.any():
                        win = _gather_windows(vals, starts2[cndt], DECON_K)
                        member = index.member(hh[cndt], win)
                        if member.any():
                            keep[np.unique(gdoc2[cndt][member])] = False
        ii = np.flatnonzero(keep)
        if ii.size == 0:
            return empty
        out = sel.take(pa.array(ii))
        # fixture ids: doc_num == suffix (oracle parity); arbitrary user ids
        # fall back to the deterministic string hash so shards stay balanced
        num = sfx[ii] if (sfx[ii] >= 0).all() else _doc_num(out.column("doc_id"))
        shard, key = _shard_cols(num, n_shards)
        return pa.table(
            {
                "doc_id": out.column("doc_id"),
                "doc_num": pa.array(num),
                "shard": pa.array(shard),
                "shuffle_key": pa.array(key),
                "n_tok": pa.array(lens[ii].astype(np.int64)),
            }
        )

    meta_ds = _seq_ds(sf_dir, columns=["doc_id", "tokens", "source"]).map_batches(
        final, batch_format="pyarrow", batch_size=8192
    )
    bundles = list(meta_ds.iter_internal_ref_bundles())
    block_refs = [ref for b in bundles for ref in b.block_refs]
    if not block_refs:
        # empty plan: nothing to sink (a partitioned write of 0 rows writes
        # no files, which a resume read could not distinguish from failure)
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
    return _maybe_sink_plan(rd.from_arrow_refs(tables), out_dir, params)


def _read_finished_plan(out_dir: str, params: dict | None = None) -> "rd.Dataset | None":
    """Read a marker-complete plan sink back, restoring the direct-path
    schema (the hive partition read re-infers ``shard`` as a trailing
    partition field; consumers must see the same int64 column order either
    way). Returns None when no complete sink exists OR the marker records
    different parameters (budget/n_shards) than the caller asked for —
    a stale plan must recompute, not silently satisfy a different request."""
    import json as _json
    import os as _os

    marker = _os.path.join(out_dir, "_PREP_SUCCESS.json")
    if not _os.path.exists(marker):
        return None
    if params is not None:
        try:
            with open(marker) as f:
                recorded = _json.load(f).get("params")
        except (OSError, _json.JSONDecodeError):
            return None
        if recorded != params:
            return None

    def fix(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "shard": pc.cast(t.column("shard"), pa.int64()),
                "pack_id": t.column("pack_id"),
                "pack_pos": t.column("pack_pos"),
                "tok_offset": t.column("tok_offset"),
                "n_tok": t.column("n_tok"),
            }
        )

    return rd.read_parquet(out_dir).map_batches(fix, batch_format="pyarrow")


def _maybe_sink_plan(
    ds: rd.Dataset, out_dir: str | None, params: dict | None = None
) -> rd.Dataset:
    """Resumable capstone sink: shard-partitioned parquet + success marker
    (recording the plan parameters — a resume with DIFFERENT budget/shards
    must recompute, never silently satisfy a different request).

    A marker-complete sink short-circuits the WHOLE pipeline (checked at
    the top of ``prepare_training_sequences``); a killed run left no
    marker, so its partial files are REMOVED before the rewrite (Ray's
    ``write_parquet`` appends by default — stale survivors would otherwise
    merge into the new output). Cleanup only touches what a prior run
    could have written (``shard=<n>`` partition dirs and the marker),
    never unrelated files sharing the directory. A plan with ZERO rows is
    returned directly without writing a marker (a partitioned write of 0
    rows emits no files, which a resume read could not distinguish from a
    missing sink)."""
    if out_dir is None:
        return ds
    import json as _json
    import os as _os
    import shutil as _shutil

    marker = _os.path.join(out_dir, "_PREP_SUCCESS.json")
    if _os.path.exists(out_dir):
        for name in _os.listdir(out_dir):
            path = _os.path.join(out_dir, name)
            if name.startswith("shard=") and _os.path.isdir(path):
                _shutil.rmtree(path)
            elif name == "_PREP_SUCCESS.json":
                _os.remove(path)
    mat = ds.materialize()
    if mat.count() == 0:
        return mat
    mat.write_parquet(out_dir, partition_cols=["shard"])
    with open(marker, "w") as f:
        _json.dump({"params": params}, f)
    return _read_finished_plan(out_dir, params)


# ---------------------------------------------------------------------------
# Token-level near-duplicate pairs (head-anchor blocking + exact verify)
# ---------------------------------------------------------------------------

SEQND_MOD = 401   # suffix % this == SEQND_RES → near-dup family member
SEQND_RES = 7
SEQND_L = 64      # generated array length
SEQND_TAIL = 2    # trailing tokens that differ between pair members
SEQND_A = 17      # generation constants (kept < VOCAB so BIGINT math is
SEQND_B = 31      # exact in both numpy int64 and DuckDB — no overflow)
SEQND_C = 101
SEQND_THRESHOLD = 0.8

_SEQND_SCHEMA = pa.schema(
    [
        ("doc_id_a", pa.string()),
        ("doc_id_b", pa.string()),
        ("shared", pa.int64()),
        ("n_union", pa.int64()),
        ("jaccard", pa.float64()),
    ]
)


def _seqnd_tokens(sfx: np.ndarray) -> np.ndarray:
    """Generated member arrays, flattened ((n, L) int32): pair members share
    group g = sfx // (2·MOD) and differ only in the last TAIL tokens via
    member m = (sfx // MOD) % 2 — token j = (A·((g+1) % V) + B·(j+1)
    [+ C·(m+1) for tail j]) % V, mirrored verbatim in the SQL oracle."""
    g = (sfx // (2 * SEQND_MOD)) % VOCAB
    m = (sfx // SEQND_MOD) % 2
    j = np.arange(SEQND_L, dtype=np.int64)
    base = SEQND_A * (g + 1)[:, None] + SEQND_B * (j + 1)[None, :]
    tail = np.where(j >= SEQND_L - SEQND_TAIL, 1, 0)[None, :] * (
        SEQND_C * (m + 1)[:, None]
    )
    return ((base + tail) % VOCAB).astype(np.int32)


def _planted_view(t: pa.Table, aug: bool, mod: int, res: int, gen_fn, gen_len: int):
    """(doc_ids, offs, vals) of a planted-family-augmented view: rows with a
    numeric suffix ≡ ``res`` (mod ``mod``) have their token array REPLACED
    by ``gen_fn(sfx)`` (an (n, gen_len) int32 matrix); rows shorter than
    DECON_K tokens are excluded (every family op needs one full window);
    ``aug=False`` (user corpora) plants nothing. Shared by the near-dup
    (``_seqnd_view``) and minhash-recall (``_seqmh_view``) families."""
    ids = t.column("doc_id").combine_chunks()
    toks = t.column("tokens")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    keep = pc.and_(pc.is_valid(ids), pc.is_valid(toks))
    sel = pa.table({"doc_id": ids, "tokens": toks}).filter(keep)
    if sel.num_rows == 0:
        return sel.column("doc_id"), np.zeros(1, dtype=np.int64), np.empty(0, np.int32)
    sfx = _suffix_i64(sel.column("doc_id"))
    offs, vals = _tokens_parts(sel.column("tokens"))
    lens = offs[1:] - offs[:-1]
    nd = aug & (sfx >= 0) & (sfx % mod == res)
    lens_eff = np.where(nd, gen_len, lens)
    # same mask-compaction + splice shape as _capstone_view
    span = vals[offs[0] : offs[-1]]
    drows = np.flatnonzero(nd)
    offs_eff = np.concatenate(([0], np.cumsum(lens_eff)))
    if drows.size == 0:
        out = span
    else:
        keep_m = np.ones(span.size, dtype=bool)
        base = offs - offs[0]
        cd = lens[drows]
        if cd.sum():
            keep_m[np.repeat(base[:-1][drows], cd) + _intra(cd)] = False
        main = span[keep_m]
        gen = gen_fn(sfx[drows])
        kept_before = base[:-1][drows] - np.concatenate(([0], np.cumsum(cd)))[:-1]
        pieces = []
        prev = 0
        for k, (pos, _r) in enumerate(zip(kept_before, drows)):
            pieces.append(main[prev:pos])
            pieces.append(gen[k])
            prev = pos
        pieces.append(main[prev:])
        out = np.concatenate(pieces)
    # restrict to rows with at least one head window
    ok = lens_eff >= DECON_K
    if not ok.all():
        idx = np.flatnonzero(ok)
        drop = np.flatnonzero(~ok)
        mask = np.ones(out.size, dtype=bool)
        cdp = lens_eff[drop]
        if cdp.sum():
            mask[np.repeat(offs_eff[:-1][drop], cdp) + _intra(cdp)] = False
        out = out[mask]
        lens_eff = lens_eff[idx]
        offs_eff = np.concatenate(([0], np.cumsum(lens_eff)))
        return sel.column("doc_id").take(pa.array(idx)), offs_eff, out
    return sel.column("doc_id"), offs_eff, out


def _seqnd_view(t: pa.Table, aug: bool = True):
    """(doc_ids, offs, vals) of the near-dup-augmented view, rows with
    ≥ DECON_K tokens only (the head anchor needs one full window);
    ``aug=False`` (user corpora) plants no synthetic family."""
    return _planted_view(t, aug, SEQND_MOD, SEQND_RES, _seqnd_tokens, SEQND_L)


def seq_neardup_pairs(
    sf_dir: str, threshold: float = SEQND_THRESHOLD, augment: bool | None = None
) -> pa.Table:
    """Token-level NEAR-duplicate pairs over the sequences table: rows whose
    exact distinct-8-gram Jaccard is ≥ ``threshold``, blocked on the HEAD
    anchor (rows sharing their first 8-gram verbatim).

    Head-anchor blocking is the deterministic cousin of MinHash banding:
    candidate generation is exact set equality on one 32-byte key per row
    (so the whole op is oracle-expressible and collision-free), at the cost
    of a documented recall assumption — near-dups must agree on their head
    window (true for prefix-preserving edits: the tail-append/suffix-edit
    family this view plants, and the common real-world boilerplate-prefix
    case). For edit-anywhere near-dups, ``doc_minhash_dups`` is the
    probabilistic scale path (word level; same machinery lifts to tokens).

    Candidate→recover shape: one streaming pass emits each row's 64-bit
    head hash into the ``dupfinder`` tree reduce (8 B/row through the
    exchange, corpus never shuffles); only rows with a DUPLICATED head
    hash are recovered (with payloads) and verified on the driver — exact
    32-byte head grouping resolves hash collisions, then exact
    distinct-gram Jaccard per in-group pair. Pair members are ROWS;
    doc_id_a < doc_id_b (same-id row pairs are excluded, matching the SQL
    self-join).

    The planted family (suffix % {MOD} == {RES}; generated 64-token arrays
    per group differing in a 2-token tail → Jaccard 55/59 ≈ 0.932) makes
    the query non-vacuous on the random fixture — the same ADVICE-r1
    augmentation contract as the other token ops, mirrored in the oracle.
    """
    from ..state.dupfinder import find_dup_hash_values

    aug = _aug(sf_dir, augment)

    def head_hash(t: pa.Table) -> pa.Table:
        _ids, offs, vals = _seqnd_view(t, aug)
        if offs.size <= 1:
            return pa.table({"h": pa.array([], type=pa.int64())})
        heads = _gather_windows(vals, offs[:-1], DECON_K)
        return pa.table({"h": pa.array(_key_hash64(heads).view(np.int64))})

    cols = ["doc_id", "tokens"]
    hashed = (
        _seq_ds(sf_dir, columns=cols)
        .map_batches(head_hash, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    dup_h = find_dup_hash_values(hashed, "h")
    if dup_h.size == 0:
        return _SEQND_SCHEMA.empty_table()
    dup_sorted = np.sort(dup_h.view(_U64))

    def recover(t: pa.Table) -> pa.Table:
        ids, offs, vals = _seqnd_view(t, aug)
        if offs.size <= 1:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.string()),
                    "head": pa.array([], type=_GRAM_TYPE),
                    "ptok": pa.array([], type=pa.list_(pa.int32())),
                }
            )
        heads = _gather_windows(vals, offs[:-1], DECON_K)
        h = _key_hash64(heads)
        pos = np.minimum(np.searchsorted(dup_sorted, h), dup_sorted.size - 1)
        m = np.flatnonzero(dup_sorted[pos] == h)
        if m.size == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.string()),
                    "head": pa.array([], type=_GRAM_TYPE),
                    "ptok": pa.array([], type=pa.list_(pa.int32())),
                }
            )
        hb = _void(heads[m], DECON_K)
        return pa.table(
            {
                "doc_id": ids.take(pa.array(m)) if isinstance(ids, pa.ChunkedArray) else pa.chunked_array([ids]).take(pa.array(m)),
                "head": pa.Array.from_buffers(
                    _GRAM_TYPE, m.size, [None, pa.py_buffer(np.ascontiguousarray(hb).tobytes())]
                ),
                "ptok": pa.array(
                    [vals[offs[i] : offs[i + 1]].tolist() for i in m],
                    type=pa.list_(pa.int32()),
                ),
            }
        )

    cand = _collect(
        _seq_ds(sf_dir, columns=cols).map_batches(
            recover, batch_format="pyarrow", batch_size=None
        )
    )
    if cand.num_rows == 0:
        return _SEQND_SCHEMA.empty_table()
    # driver verify: exact head grouping, exact distinct-gram Jaccard
    from ..core.rounding import round_half_away as _rha

    heads = cand.column("head").to_pylist()
    ids = cand.column("doc_id").to_pylist()
    toks = cand.column("ptok").to_pylist()
    groups: dict[bytes, list[int]] = {}
    for i, hb in enumerate(heads):
        groups.setdefault(hb, []).append(i)
    gsets = {}
    out = {"doc_id_a": [], "doc_id_b": [], "shared": [], "n_union": [], "jaccard": []}
    for members in groups.values():
        if len(members) < 2:
            continue  # 64-bit collision filtered exactly
        for i in members:
            if i not in gsets:
                arr = np.asarray(toks[i], dtype=np.int32)
                win = _gather_windows(arr, np.arange(arr.size - DECON_K + 1), DECON_K)
                gsets[i] = np.unique(_void(win, DECON_K))
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                i, j = members[x], members[y]
                da, db = ids[i], ids[j]
                if da is None or db is None or da == db:
                    continue
                if da > db:
                    i, j, da, db = j, i, db, da
                s = np.intersect1d(gsets[i], gsets[j]).size
                u = gsets[i].size + gsets[j].size - s
                jac = float(_rha(np.array([s / u]), 6)[0]) if u else 0.0
                if jac >= threshold:
                    out["doc_id_a"].append(da)
                    out["doc_id_b"].append(db)
                    out["shared"].append(s)
                    out["n_union"].append(u)
                    out["jaccard"].append(jac)
    return pa.table(
        {
            "doc_id_a": pa.array(out["doc_id_a"], type=pa.string()),
            "doc_id_b": pa.array(out["doc_id_b"], type=pa.string()),
            "shared": pa.array(out["shared"], type=pa.int64()),
            "n_union": pa.array(out["n_union"], type=pa.int64()),
            "jaccard": pa.array(out["jaccard"], type=pa.float64()),
        }
    )


def seq_neardup_clusters(
    sf_dir: str,
    threshold: float = SEQND_THRESHOLD,
    augment: "bool | None" = None,
    *,
    driver_cap: "int | None" = None,
) -> pa.Table:
    """Near-duplicate CLUSTERS over the sequences table: the verified
    head-anchor pairs merged into components (``state/components`` —
    union-find under the pair cap, hash-partitioned label propagation
    above it), keeper = min doc_id per component. The tokens-axis
    ``doc_near_dup_clusters``: rows are vertices under their 64-bit id
    hash; the min-STRING representative is recovered from the (cap-bounded)
    pair id set after labeling, so cluster ids match the SQL oracle's
    ``min(doc_id)`` exactly. Head-anchor components are cliques (every row
    has ONE head group), so the oracle's bounded-hop closure is exact."""
    from ..core.hashing import hash_strings
    from ..state.components import connected_component_refs

    pairs = seq_neardup_pairs(sf_dir, threshold, augment)
    empty = pa.schema(
        [
            ("doc_id", pa.string()),
            ("cluster_id", pa.string()),
            ("is_keeper", pa.bool_()),
        ]
    ).empty_table()
    if pairs.num_rows == 0:
        return empty
    da = pairs.column("doc_id_a").to_pylist()
    db = pairs.column("doc_id_b").to_pylist()
    ha = hash_strings(pa.array(da)).view(np.int64)
    hb = hash_strings(pa.array(db)).view(np.int64)
    rid_to_id: dict[int, str] = {}
    for r, d in zip(np.concatenate([ha, hb]).tolist(), da + db):
        if rid_to_id.setdefault(r, d) != d:
            raise ValueError(f"64-bit doc_id hash collision on rid {r}")
    comp = pa.concat_tables(
        ray.get(connected_component_refs(ha, hb, driver_cap=driver_cap))
    )
    labels = dict(
        zip(comp.column("doc_id").to_pylist(), comp.column("cluster_id").to_pylist())
    )
    # component representative = min STRING id among members
    rep: dict[int, str] = {}
    for r, root in labels.items():
        d = rid_to_id[r]
        if root not in rep or d < rep[root]:
            rep[root] = d
    rows = sorted(
        (rid_to_id[r], rep[root]) for r, root in labels.items()
    )
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in rows], type=pa.string()),
            "cluster_id": pa.array([c for _, c in rows], type=pa.string()),
            "is_keeper": pa.array([d == c for d, c in rows], type=pa.bool_()),
        }
    )


# ---------------------------------------------------------------------------
# Token-level MinHash banding recall (the edit-anywhere complement to
# seq_neardup_pairs' head-anchor blocking)
# ---------------------------------------------------------------------------

SEQMH_MOD = 419   # suffix % this == SEQMH_RES → minhash-recall family member
SEQMH_RES = 11
SEQMH_L = 64      # circular core length (64 distinct circular 8-grams)
SEQMH_ROT = 32    # member-1 rotation offset — heads differ by construction
SEQMH_A = 23      # generation constants (< VOCAB ⇒ BIGINT-exact in DuckDB)
SEQMH_B = 29
SEQMH_GEN_LEN = SEQMH_L + DECON_K - 1  # 71: linear grams = circular grams
SEQMH_K = 16      # minhash permutations (8 bands × 2 rows — identical
#                   sets still share every band, and random-pair false
#                   positives at r=2 are J²-suppressed; 64 perms were 4× the
#                   signature cost for no recall-contract gain)
SEQMH_BANDS = 8
SEQMH_MAX_BUCKET = 1024

_SEQMH_RECALL_SCHEMA = pa.schema(
    [
        ("n_truth_pairs", pa.int64()),
        ("n_truth_found", pa.int64()),
        ("recall", pa.float64()),
    ]
)


def _seqmh_tokens(sfx: np.ndarray) -> np.ndarray:
    """Generated member arrays ((n, 71) int32): pair members share group
    g = sfx // (2·MOD) and are ROTATIONS of one circular 64-token core
    (member m starts at offset m·32), each extended by its first 7 tokens —
    so the two members' distinct-8-gram SETS are identical (the 64 circular
    windows) while their heads differ. token j = (A·((g % V)+1)
    + B·((((j + m·32) mod 64))+1)) % V, mirrored verbatim in the SQL
    oracle."""
    g = (sfx // (2 * SEQMH_MOD)) % VOCAB
    m = (sfx // SEQMH_MOD) % 2
    j = np.arange(SEQMH_GEN_LEN, dtype=np.int64)
    pos = (j[None, :] + m[:, None] * SEQMH_ROT) % SEQMH_L
    return ((SEQMH_A * (g + 1)[:, None] + SEQMH_B * (pos + 1)) % VOCAB).astype(
        np.int32
    )


def _seqmh_view(t: pa.Table, aug: bool = True):
    return _planted_view(t, aug, SEQMH_MOD, SEQMH_RES, _seqmh_tokens, SEQMH_GEN_LEN)


def _seqmh_seeds() -> np.ndarray:
    return np.random.default_rng(7654321).integers(
        0, 2**63, size=SEQMH_K, dtype=np.int64
    ).astype(_U64)


def _seqmh_grams(t: pa.Table, aug: bool):
    """(ids, row gram-hash segments): per-row 8-gram uint64 hashes of the
    minhash-augmented view — (doc_ids, gram hashes flat, per-row counts).
    Hashes come from the gather-free shifted-slice polynomial
    (``_window_hash64`` over the flat buffer, within-row starts selected
    after) — materializing the (n, 8) int32 window matrix was the measured
    wall of all three passes at sf0.1."""
    ids, offs, vals = _seqmh_view(t, aug)
    if offs.size <= 1:
        return ids, np.empty(0, dtype=_U64), np.empty(0, dtype=np.int64)
    starts, _gdoc, m = _window_starts(offs, DECON_K)
    allh = _window_hash64(vals, DECON_K)
    return ids, allh[starts], m


# second independent set-hash tweak (any odd 64-bit constant): (fp1, fp2)
# together verify set equality at the 128-bit level — the same hash-level
# exactness the old per-candidate md5 pass provided, but vectorized and
# computable in the SAME scan as fp1 (random collision ≈ 2^-128 per pair;
# every dedup op in this repo verifies through the same splitmix family)
_SEQMH_FP2C = np.uint64(0x9E3779B97F4A7C15)


def _seqmh_row_features(
    gh: np.ndarray, m: np.ndarray, seeds: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """ONE lexsort per batch → per-row DISTINCT gram arrays → (fp1, fp2,
    (n, K) minhash signature).  fp1/fp2 are order-free commutative splitmix
    sums over the distinct set (fp1 bit-identical to the former
    ``_seqmh_setfp64``); the signature mins run over the deduped grams —
    min over a multiset equals min over its support, so banding is
    unchanged while every per-row reduction shares the single sort."""
    n = m.size
    gdoc = np.repeat(np.arange(n, dtype=np.int64), m)
    order = np.lexsort((gh, gdoc))
    gd, gs = gdoc[order], gh[order]
    first = np.empty(gs.size, dtype=bool)
    first[0] = True
    first[1:] = (gd[1:] != gd[:-1]) | (gs[1:] != gs[:-1])
    gd, gs = gd[first], gs[first]
    starts = np.searchsorted(gd, np.arange(n))
    sig = np.empty((n, len(seeds)), dtype=_U64)
    with np.errstate(over="ignore"):
        fp1 = np.add.reduceat(splitmix64(gs), starts)
        fp2 = np.add.reduceat(splitmix64(gs ^ _SEQMH_FP2C), starts)
        for s in range(len(seeds)):
            sig[:, s] = np.minimum.reduceat(splitmix64(gs ^ seeds[s]), starts)
    return fp1, fp2, sig


def seq_minhash_recall(sf_dir: str, augment: "bool | None" = None) -> pa.Table:
    """Recall contract for token-level MinHash banding — the EDIT-ANYWHERE
    complement to ``seq_neardup_pairs``' head-anchor blocking (whose
    documented assumption misses near-dups that disagree on their first
    8-gram): every pair of rows with IDENTICAL distinct-8-gram sets has
    identical minhash signatures, so the 8-band × 2-row index (SEQMH_K=16
    perms) MUST emit it — recall over that ground truth is exactly 1.0 and
    the truth count is plain SQL (group rows by their distinct-gram set),
    the ``doc_simhash_recall`` grading pattern on the tokens axis. As with
    every LSH cap in this repo, ``SEQMH_MAX_BUCKET`` bounds pair
    explosion: a corpus with more than that many rows sharing ONE gram set
    truncates the bucket and the reported recall honestly drops below 1.0
    — the ==1.0 contract is for corpora whose identical-set groups stay
    under the cap (the fixture guarantee, the ``doc_simhash_recall``
    caveat).

    Ground truth is non-vacuous at every scale via a planted ROTATED-twin
    family (suffix % {MOD} == {RES}): members are rotations of one circular
    64-token core, each extended by its first 7 tokens — identical gram
    sets, DIFFERENT heads, so head-anchor blocking misses exactly these
    while the minhash index must find them. Natural truth (injected exact
    token-array duplicates under distinct ids) counts too; pairs are
    distinct (doc_id_a < doc_id_b) pairs, mirrored in the oracle.

    Scale shape (candidate→recover, ONE gram scan): the single corpus scan
    computes each row's distinct-gram set once (one lexsort) and emits 1
    set-hash row — (fp1, fp2, rid, doc_id), two INDEPENDENT commutative
    64-bit set-hashes = 128-bit verification, the former md5 pass's
    hash-level exactness without its second scan — plus 16 (band key, rid)
    rows, all into one materialized exchange (~9 small rows/seq). The
    ``dupfinder`` tree reduce then finds duplicated fp1 on that
    materialized stream (no recompute), candidates are recovered by a
    cheap filter over the same stream, and banding pairs come from the
    ``pairreduce`` co-occurrence reduce over the kind-1 rows. The driver
    sees candidate rows and verified pairs only — never signatures or
    gram sets of the corpus.
    """
    from ..core.hashing import hash_strings
    from ..state.dupfinder import find_dup_hash_values
    from ..state.pairreduce import cooccurrence_pairs

    aug = _aug(sf_dir, augment)
    cols = ["doc_id", "tokens"]
    seeds = _seqmh_seeds()

    # ---- the ONE gram scan: set-hash rows (kind 0) ⊕ band rows (kind 1) ----
    def features(t: pa.Table) -> pa.Table:
        ids, gh, m = _seqmh_grams(t, aug)
        if m.size == 0:
            return pa.table(
                {
                    "kind": pa.array([], type=pa.int64()),
                    "key": pa.array([], type=pa.int64()),
                    "rid": pa.array([], type=pa.int64()),
                    "fp2": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=pa.string()),
                }
            )
        n = m.size
        fp1, fp2, sig = _seqmh_row_features(gh, m, seeds)
        ids_arr = ids if isinstance(ids, pa.ChunkedArray) else pa.chunked_array([ids])
        rid = hash_strings(ids_arr).view(np.int64)
        r = SEQMH_K // SEQMH_BANDS
        keys = np.empty((n, SEQMH_BANDS), dtype=_U64)
        for b in range(SEQMH_BANDS):
            k = splitmix64(np.full(n, b + 1, dtype=_U64))
            for s in range(b * r, (b + 1) * r):
                k = splitmix64(k ^ sig[:, s])
            keys[:, b] = k
        nb = n * SEQMH_BANDS
        return pa.table(
            {
                "kind": pa.array(
                    np.concatenate([np.zeros(n, np.int64), np.ones(nb, np.int64)])
                ),
                "key": pa.array(
                    np.concatenate([fp1.view(np.int64), keys.ravel().view(np.int64)])
                ),
                "rid": pa.array(np.concatenate([rid, np.repeat(rid, SEQMH_BANDS)])),
                "fp2": pa.array(
                    np.concatenate([fp2.view(np.int64), np.zeros(nb, np.int64)])
                ),
                "doc_id": pa.concat_arrays(
                    [ids_arr.combine_chunks(), pa.nulls(nb, type=pa.string())]
                ),
            }
        )

    feat = (
        _seq_ds(sf_dir, columns=cols)
        .map_batches(features, batch_format="pyarrow", batch_size=2048)
        .materialize()
    )
    fp_ds = feat.filter(expr="kind == 0")
    dup_fph = find_dup_hash_values(fp_ds, "key")
    empty = pa.table(
        {
            "n_truth_pairs": pa.array([0], type=pa.int64()),
            "n_truth_found": pa.array([0], type=pa.int64()),
            "recall": pa.array([1.0], type=pa.float64()),
        }
    )
    if dup_fph.size == 0:
        return empty
    dup_set = pa.array(np.asarray(dup_fph, dtype=np.int64))

    # ---- candidate recovery: a filter over the SAME materialized stream ----
    def pick(t: pa.Table) -> pa.Table:
        mask = pc.fill_null(pc.is_in(t.column("key"), value_set=dup_set), False)
        return t.filter(mask).select(["doc_id", "rid", "key", "fp2"])

    cand = _collect(fp_ds.map_batches(pick, batch_format="pyarrow"))
    # exact truth: distinct (id_a < id_b) pairs sharing BOTH set-hashes
    cids = cand.column("doc_id").to_pylist()
    crids = cand.column("rid").to_pylist()
    cfp = list(
        zip(cand.column("key").to_pylist(), cand.column("fp2").to_pylist())
    )
    rid_to_id: dict[int, str] = {}
    for r, d in zip(crids, cids):
        if rid_to_id.setdefault(r, d) != d:
            raise ValueError(f"64-bit doc_id hash collision on rid {r}")
    by_fp: dict[tuple, set] = {}
    rid_fps: dict[int, set] = {}
    for d, r, f in zip(cids, crids, cfp):
        by_fp.setdefault(f, set()).add(d)
        rid_fps.setdefault(r, set()).add(f)
    truth: set = set()
    for members in by_fp.values():
        if len(members) < 2:
            continue  # fp1 collision with fp2 mismatch filtered here
        ms = sorted(members)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                truth.add((ms[x], ms[y]))
    n_truth = len(truth)
    if n_truth == 0:
        return empty

    # ---- banding pairs from the kind-1 rows of the same stream ----
    pairs = cooccurrence_pairs(
        feat.filter(expr="kind == 1"),
        "key",
        "rid",
        max_bucket=SEQMH_MAX_BUCKET,
        distinct_ids=True,
    )
    found: set = set()
    for ra, rb in zip(pairs["id_a"].to_numpy(), pairs["id_b"].to_numpy()):
        fa, fb = rid_fps.get(int(ra)), rid_fps.get(int(rb))
        if not fa or not fb or not (fa & fb):
            continue  # non-truth candidate (band collision / near-miss)
        da, db = rid_to_id[int(ra)], rid_to_id[int(rb)]
        found.add((da, db) if da < db else (db, da))
    n_found = len(found)
    from ..core.rounding import round_half_away as _rha2

    recall = float(_rha2(np.array([n_found / n_truth]), 6)[0])
    return pa.table(
        {
            "n_truth_pairs": pa.array([n_truth], type=pa.int64()),
            "n_truth_found": pa.array([n_found], type=pa.int64()),
            "recall": pa.array([recall], type=pa.float64()),
        }
    ).cast(_SEQMH_RECALL_SCHEMA)


# ---------------------------------------------------------------------------
# Corpus-wide token-bigram top-k (BPE merge-candidate mining)
# ---------------------------------------------------------------------------

BIGRAM_TOPK = 10
BIGRAM_CAND_MIN = 3  # pass-1 per-block threshold (see guarantee below)

_BIGRAM_SCHEMA = pa.schema(
    [("tok_a", pa.int64()), ("tok_b", pa.int64()), ("cnt", pa.int64())]
)
_BIGRAM_BIAS = np.uint64(1 << 31)  # int32 → unsigned 32-bit, order-preserving
_BIGRAM_SIGN = np.uint64(1 << 63)  # offset-binary ↔ two's-complement flip


def _bigram_keys(offs: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Within-row adjacent-token bigram keys, int64: the uint64 pack
    ``(a+2³¹) << 32 | (b+2³¹)`` with the sign bit flipped (offset-binary →
    two's-complement), so the key is INJECTIVE and order-isomorphic to
    (tok_a, tok_b) over ALL int32 pairs — planted OOV tokens land at
    VOCAB+0..99 (datagen), so a vocab-sized modulus packing would alias an
    OOV right-token onto a different canonical bigram and silently inflate
    its exact recount. One shifted add over the flat buffer, row
    boundaries masked out."""
    starts, _gdoc, _m = _window_starts(offs, 2)
    if starts.size == 0:
        return np.empty(0, dtype=np.int64)
    a = (vals[starts].astype(np.int64) + (1 << 31)).astype(np.uint64)
    b = (vals[starts + 1].astype(np.int64) + (1 << 31)).astype(np.uint64)
    return (((a << np.uint64(32)) | b) ^ _BIGRAM_SIGN).view(np.int64)


def _bigram_unpack(key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of ``_bigram_keys``: int64 keys → (tok_a, tok_b) int64."""
    u = key.astype(np.int64).view(np.uint64) ^ _BIGRAM_SIGN
    a = (u >> np.uint64(32)).astype(np.int64) - (1 << 31)
    b = (u & np.uint64(0xFFFFFFFF)).astype(np.int64) - (1 << 31)
    return a, b


def seq_bigram_topk(sf_dir: str, k: int = BIGRAM_TOPK) -> pa.Table:
    """EXACT top-k most frequent adjacent token bigrams corpus-wide — the
    first step of BPE-style vocabulary induction (the highest-count pair is
    the next merge), over the canary-patched view ``seq_decontaminate``
    reads (the raw random fixture has ~unit bigram counts, which would make
    a top-k meaningless; the patch is mirrored in the oracle).

    Distributed heavy-hitter shape, two passes, exact under a CHECKED
    guarantee. Pass 1 emits only bigrams appearing ≥ ``BIGRAM_CAND_MIN``
    times within a block (per-block ``np.unique`` combiner — the random
    floor of within-block repeats is what sets the threshold: at 50M
    bigrams/block over a ~10^9 key space, count-≥2 keys number ~10^6 per
    block while count-≥3 keys number ~10^4). A bigram MISSED by pass 1 has
    per-block count ≤ BIGRAM_CAND_MIN−1 everywhere, so its global count is
    ≤ (BIGRAM_CAND_MIN−1)·n_blocks; if the k-th candidate's exact count
    (from pass 2's searchsorted+bincount recount of the broadcast
    candidate set) exceeds that bound, the top-k is provably exact —
    asserted at runtime (raises rather than silently returning an
    approximate ranking). The corpus never shuffles; both passes stream
    combiner-sized tables only.
    """

    def view(t: pa.Table):
        ids = t.column("doc_id").combine_chunks()
        toks = t.column("tokens")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        keep = pc.and_(pc.is_valid(ids), pc.is_valid(toks))
        sel = pa.table({"doc_id": ids, "tokens": toks}).filter(keep)
        if sel.num_rows == 0:
            return np.zeros(1, dtype=np.int64), np.empty(0, dtype=np.int32)
        sfx = _suffix_i64(sel.column("doc_id"))
        offs, vals = _tokens_parts(sel.column("tokens"))
        prows = np.flatnonzero((sfx >= 0) & (sfx % DECON_PATCH_MOD == DECON_PATCH_RES))
        return offs, _patch_prefix(offs, vals, prows)

    ta, tb, cnt = _bigram_top_exact(
        _seq_ds(sf_dir, columns=["doc_id", "tokens"]), view, int(k)
    )
    if ta.size == 0:
        return _BIGRAM_SCHEMA.empty_table()
    return pa.table(
        {"tok_a": pa.array(ta), "tok_b": pa.array(tb), "cnt": pa.array(cnt)}
    )


def _bigram_top_exact(ds: rd.Dataset, view, k: int):
    """The two-pass checked-exact bigram heavy hitter behind
    ``seq_bigram_topk``, parameterized by the input dataset and the
    (offs, vals) view so the BPE merge loop can re-run it per step over a
    MATERIALIZED sample with merge-rewritten sequences. ``ds`` is consumed
    twice (pass 1 candidates, pass 2 recount) — pass a materialized
    dataset when re-reading is expensive. Returns (tok_a, tok_b, cnt)
    int64 arrays of the exact top-k (empty when the view holds no pairs);
    raises when exactness is not provable."""

    def candidates_batch(t: pa.Table) -> pa.Table:
        offs, vals = view(t)
        keys = _bigram_keys(offs, vals)
        if keys.size == 0:
            rep = np.empty(0, dtype=np.int64)
        else:
            u, c = np.unique(keys, return_counts=True)
            rep = u[c >= BIGRAM_CAND_MIN]
        # a flagged sentinel row per BATCH lets the driver count n_blocks
        # exactly (out-of-band: every int64 is now a valid key)
        return pa.table(
            {
                "key": pa.array(np.r_[np.int64(0), rep]),
                "sent": pa.array(np.r_[True, np.zeros(rep.size, dtype=bool)]),
            }
        )

    cand_tbl = _collect(
        ds.map_batches(candidates_batch, batch_format="pyarrow", batch_size=None)
    )
    empty = (
        np.empty(0, dtype=np.int64),
        np.empty(0, dtype=np.int64),
        np.empty(0, dtype=np.int64),
    )
    if cand_tbl.num_rows == 0 or "key" not in cand_tbl.column_names:
        return empty  # 0-row corpus: no blocks reach the map
    raw = cand_tbl.column("key").to_numpy(zero_copy_only=False)
    sent = cand_tbl.column("sent").to_numpy(zero_copy_only=False)
    n_blocks = int(sent.sum())
    cand = np.unique(raw[~sent])
    if cand.size == 0:
        return empty
    cand_ref = ray.put(cand)

    def recount(t: pa.Table, _cache={}) -> pa.Table:
        c = _cache.get("c")
        if c is None:
            c = _cache["c"] = ray.get(cand_ref)
        offs, vals = view(t)
        keys = _bigram_keys(offs, vals)
        cnt = np.zeros(c.size, dtype=np.int64)
        if keys.size:
            pos = np.searchsorted(c, keys)
            posc = np.minimum(pos, c.size - 1)
            hit = c[posc] == keys
            if hit.any():
                cnt = np.bincount(posc[hit], minlength=c.size).astype(np.int64)
        return pa.table({"cnt": pa.array(cnt)})

    parts = _collect(
        ds.map_batches(recount, batch_format="pyarrow", batch_size=None)
    )
    total = (
        parts.column("cnt")
        .to_numpy(zero_copy_only=False)
        .reshape(-1, cand.size)
        .sum(axis=0)
    )
    order = np.lexsort((cand, -total))[: int(k)]
    kth = int(total[order[-1]]) if order.size else 0
    bound = (BIGRAM_CAND_MIN - 1) * n_blocks
    if kth <= bound:
        raise ValueError(
            f"bigram top-{k} not provably exact: k-th candidate count {kth} "
            f"<= miss bound {bound} ((threshold-1) x {n_blocks} blocks); "
            "lower k or raise BIGRAM_CAND_MIN with block size"
        )
    tok_a, tok_b = _bigram_unpack(cand[order])
    return tok_a, tok_b, total[order]


# ---------------------------------------------------------------------------
# BPE vocabulary induction: iterate the exact bigram heavy hitter into an
# N-merge loop (the end-to-end tokenizer-training story)
# ---------------------------------------------------------------------------

BPE_N_MERGES = 6
BPE_SAMPLE_MOD = 7  # deterministic training sample: sfx % 7 == 0 (or no sfx)

_BPE_SCHEMA = pa.schema(
    [
        ("merge_idx", pa.int64()),
        ("tok_a", pa.int64()),
        ("tok_b", pa.int64()),
        ("new_id", pa.int64()),
        ("cnt", pa.int64()),
    ]
)


def _apply_bpe_merges(offs: np.ndarray, vals: np.ndarray, merges) -> tuple:
    """Apply merge rules in order to 0-based (offs, vals) sequences: each
    rule replaces every LEFTMOST-GREEDY non-overlapping (a, b) adjacency
    with ``new_id`` in one pass (a≠b occurrences are disjoint by
    construction; a==b runs take every other match — the standard BPE
    application, mirrored by the oracle's gaps-and-islands parity rule).
    A pass cannot create new occurrences of its own pair (new_id differs
    from a and b), so one pass per rule is complete."""
    vals = vals.astype(np.int32, copy=True)
    lens = (offs[1:] - offs[:-1]).astype(np.int64)
    for a, b, nid in merges:
        n = vals.size
        if n < 2:
            continue
        m = np.zeros(n, dtype=bool)
        m[:-1] = (vals[:-1] == a) & (vals[1:] == b)
        ends = np.cumsum(lens)[lens > 0] - 1  # last token index per row
        m[ends] = False
        idx = np.flatnonzero(m)
        if idx.size == 0:
            continue
        if a == b and idx.size > 1:
            new_run = np.empty(idx.size, dtype=bool)
            new_run[0] = True
            new_run[1:] = idx[1:] != idx[:-1] + 1
            run_id = np.cumsum(new_run) - 1
            run_start = idx[new_run][run_id]
            idx = idx[((idx - run_start) % 2) == 0]
        sel = np.zeros(n, dtype=bool)
        sel[idx] = True
        drop = np.zeros(n, dtype=bool)
        drop[idx + 1] = True
        vals = np.where(sel, np.int32(nid), vals)[~drop]
        row_of = np.repeat(np.arange(lens.size, dtype=np.int64), lens)
        lens = lens - np.bincount(row_of[idx], minlength=lens.size)
    return np.concatenate(([0], np.cumsum(lens))), vals


def _bpe_project(t: pa.Table, aug: bool) -> pa.Table:
    """One-time projection of the BPE training view: valid rows in the
    deterministic sample (numeric suffix % {MOD} == 0, or any row without a
    numeric suffix — user corpora train on everything), canary-patched like
    ``seq_bigram_topk`` when augmented. Emitted as a single patched
    ``tokens`` large_list column so the merge loop's 2N passes run over a
    MATERIALIZED ~1/{MOD} sample instead of re-reading and re-filtering
    the corpus each pass (measured: the re-reads dominated the loop wall
    at sf0.1)."""
    empty = pa.table(
        {
            "tokens": pa.array([], type=pa.large_list(pa.int32())),
            "source": pa.array([], type=pa.string()),
        }
    )
    ids = t.column("doc_id").combine_chunks()
    toks = t.column("tokens")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    src = t.column("source").combine_chunks()
    keep = pc.and_(pc.is_valid(ids), pc.is_valid(toks))
    sel = pa.table({"doc_id": ids, "tokens": toks, "source": src}).filter(keep)
    if sel.num_rows == 0:
        return empty
    sfx = _suffix_i64(sel.column("doc_id"))
    samp = (sfx < 0) | (sfx % BPE_SAMPLE_MOD == 0)
    sel = sel.filter(pa.array(samp))
    if sel.num_rows == 0:
        return empty
    sfx = sfx[samp]
    offs, vals = _tokens_parts(sel.column("tokens"))
    if aug:
        prows = np.flatnonzero(
            (sfx >= 0) & (sfx % DECON_PATCH_MOD == DECON_PATCH_RES)
        )
        vals = _patch_prefix(offs, vals, prows)
    lists = pa.LargeListArray.from_arrays(
        pa.array(offs - offs[0], type=pa.int64()),
        pa.array(vals[offs[0] : offs[-1]], type=pa.int32()),
    )
    return pa.table({"tokens": lists, "source": sel.column("source")})


def _bpe_sampled_ds(sf_dir: str, aug: bool) -> rd.Dataset:
    """The materialized (tokens, source) training sample shared by the
    merge loop and the apply pass."""
    return (
        _seq_ds(sf_dir, columns=["doc_id", "tokens", "source"])
        .map_batches(
            lambda t: _bpe_project(t, aug), batch_format="pyarrow", batch_size=None
        )
        .materialize()
    )


def _bpe_step_view(t: pa.Table, merges):
    """(offs, vals) of a projected-sample block with the merge rules so far
    applied."""
    toks = t.column("tokens")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    if len(toks) == 0:
        return np.zeros(1, dtype=np.int64), np.empty(0, dtype=np.int32)
    offs, vals = _tokens_parts(toks)
    return _apply_bpe_merges(offs - offs[0], vals[offs[0] : offs[-1]], merges)


def seq_bpe_merges(
    sf_dir: str, n_merges: int = BPE_N_MERGES, augment: "bool | None" = None
) -> pa.Table:
    """BPE vocabulary induction over the sequences corpus (VERDICT r3
    item 4): iterate the provably-exact bigram heavy hitter into an N-merge
    loop producing the merge table — (merge_idx, tok_a, tok_b,
    new_id=VOCAB+idx, cnt), the tokenizer-training capstone.

    Each step is two streaming passes over the deterministic training
    sample (``_bigram_top_exact``: per-block candidate combiner + broadcast
    recount, exactness ASSERTED via the miss bound — never a silently
    approximate merge choice; ties break to the smallest (a, b)). Merge
    application is vectorized leftmost-greedy replacement re-derived from
    the raw view each step (rules are order-dependent state, the only state
    the loop carries — a dozen ints). The canary-patched slice gives the
    fixture a real merge cascade (the canary prefix merges left-to-right);
    the oracle replays every step in chained window-function CTEs — explode
    → top pair → islands-parity selection → rebuild — with no recursion.

    Stops early (fewer rows) only when the view runs out of adjacent pairs,
    which the oracle reproduces (its per-step top-1 is empty then too)."""
    aug = _aug(sf_dir, augment)
    return _bpe_merges_over(_bpe_sampled_ds(sf_dir, aug), int(n_merges))


def _bpe_merges_over(sampled: rd.Dataset, n_merges: int) -> pa.Table:
    """The merge loop over an already-materialized sample (shared with
    ``seq_bpe_apply`` so the sample is built exactly once)."""
    merges: list[tuple[int, int, int]] = []
    rows = []
    for i in range(n_merges):
        ms = list(merges)

        def view(t: pa.Table, _ms=ms):
            return _bpe_step_view(t, _ms)

        ta, tb, cnt = _bigram_top_exact(sampled, view, 1)
        if ta.size == 0:
            break
        nid = VOCAB + i
        merges.append((int(ta[0]), int(tb[0]), nid))
        rows.append(
            {
                "merge_idx": i,
                "tok_a": int(ta[0]),
                "tok_b": int(tb[0]),
                "new_id": nid,
                "cnt": int(cnt[0]),
            }
        )
    return pa.Table.from_pylist(rows, schema=_BPE_SCHEMA)


def seq_bpe_apply(
    sf_dir: str, n_merges: int = BPE_N_MERGES, augment: "bool | None" = None
) -> pa.Table:
    """Apply the induced merge table back to the training sample — the
    train→apply closure of the tokenizer capstone: per source, rows and
    token totals before/after the ``seq_bpe_merges`` rules, plus the
    integer compression rate saved_ppm = (before − after)·10⁶ // before.
    One extra streaming pass over the SAME materialized sample the merge
    loop used (per-batch (source, before, after) integer partials, driver
    rollup); the oracle replays the merge chain and aggregates per source.
    Null sources fold last like the other per-source views."""
    aug = _aug(sf_dir, augment)
    sampled = _bpe_sampled_ds(sf_dir, aug)  # built ONCE, shared with the loop
    m_tbl = _bpe_merges_over(sampled, int(n_merges))
    merges = list(
        zip(
            m_tbl.column("tok_a").to_pylist(),
            m_tbl.column("tok_b").to_pylist(),
            m_tbl.column("new_id").to_pylist(),
        )
    )

    def partial(t: pa.Table) -> pa.Table:
        toks = t.column("tokens")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        if len(toks) == 0:
            return pa.table(
                {
                    "source": pa.array([], type=pa.string()),
                    "rows": pa.array([], type=pa.int64()),
                    "tok_before": pa.array([], type=pa.int64()),
                    "tok_after": pa.array([], type=pa.int64()),
                }
            )
        offs, vals = _tokens_parts(toks)
        before = offs[1:] - offs[:-1]
        offs2, _vals2 = _apply_bpe_merges(
            offs - offs[0], vals[offs[0] : offs[-1]], merges
        )
        after = offs2[1:] - offs2[:-1]
        src = t.column("source").to_pandas().fillna("\x00null")
        df = pd.DataFrame(
            {"source": src, "rows": np.int64(1),
             "tok_before": before, "tok_after": after}
        )
        g = df.groupby("source", as_index=False).sum()
        for c in ("rows", "tok_before", "tok_after"):
            g[c] = g[c].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    parts = _collect(sampled.map_batches(partial, batch_format="pyarrow")).to_pandas()
    if parts.empty:
        return pa.schema(
            [
                ("source", pa.string()),
                ("rows", pa.int64()),
                ("tok_before", pa.int64()),
                ("tok_after", pa.int64()),
                ("saved_ppm", pa.int64()),
            ]
        ).empty_table()
    g = parts.groupby("source", as_index=False).sum()
    g["__null"] = g["source"] == "\x00null"
    g = g.sort_values(["__null", "source"], kind="mergesort").reset_index(drop=True)
    before = g["tok_before"].astype(np.int64).to_numpy()
    after = g["tok_after"].astype(np.int64).to_numpy()
    saved = np.where(
        before > 0, (before - after) * 1_000_000 // np.maximum(before, 1), 0
    )
    return pa.table(
        {
            "source": pa.array(
                [None if n else s for s, n in zip(g["source"], g["__null"])],
                type=pa.string(),
            ),
            "rows": pa.array(g["rows"].astype(np.int64), type=pa.int64()),
            "tok_before": pa.array(before, type=pa.int64()),
            "tok_after": pa.array(after, type=pa.int64()),
            "saved_ppm": pa.array(saved.astype(np.int64), type=pa.int64()),
        }
    )


# --- split-assignment constants (mirrored verbatim into the SQL oracle) ----
SPLIT_MULT = 127        # bucket = (suffix * MULT) % PRIME % 100
SPLIT_PRIME = 999_983   # large prime decorrelates the bucket from the
#                         fixture's small augmentation moduli (97/13/257)
SPLIT_TEST_PCT = 5      # bucket < 5            → test
SPLIT_VAL_PCT = 10      # 5 <= bucket < 10      → val; else train


def seq_split_assign(sf_dir: str) -> rd.Dataset:
    """Deterministic stratified train/val/test split assignment over the
    north-star sequences table (~90/5/5).

    The bucket is pure int64 modular arithmetic on the numeric doc_id
    suffix — vectorized in the engine, exactly expressible in SQL (no
    engine-specific hash), reproducible across engines, cluster sizes and
    reruns, and independent of row order, so a re-shard of the corpus
    never migrates a row between splits. Stratification needs no shuffle:
    the suffix is uniform within every source, so per-source proportions
    hold statistically (the multiplicative step decorrelates the bucket
    from the fixture's augmentation moduli 97/13/257, which are also
    suffix-derived). NULL doc_ids are excluded (no stable key to split
    on); ids WITHOUT a 12-digit suffix — user corpora via
    ``resolve_sequences`` — take the ``_doc_num`` deterministic string
    hash instead of being dropped (the same user-corpus fallback as the
    shard/order keys; the SQL oracle mirrors the fixture arm, where every
    non-null id has the suffix)."""
    seq = _seq_ds(sf_dir, columns=["doc_id", "source"])

    def assign(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.is_valid(t.column("doc_id")))
        if sel.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.string()),
                    "source": pa.array([], type=pa.string()),
                    "split": pa.array([], type=pa.string()),
                }
            )
        num = _doc_num(sel.column("doc_id"))
        bucket = (num * SPLIT_MULT) % SPLIT_PRIME % 100
        split = np.where(
            bucket < SPLIT_TEST_PCT,
            "test",
            np.where(bucket < SPLIT_VAL_PCT, "val", "train"),
        )
        return pa.table(
            {
                "doc_id": sel.column("doc_id"),
                "source": sel.column("source"),
                "split": pa.array(split.astype(object), type=pa.string()),
            }
        )

    return seq.map_batches(assign, batch_format="pyarrow")


_REPSCORE_EMPTY = pa.schema(
    [
        ("doc_id", pa.string()),
        ("source", pa.string()),
        ("n_tok_actual", pa.int64()),
        ("n_adj_dup", pa.int64()),
        ("n_distinct", pa.int64()),
        ("top_tok_n", pa.int64()),
        ("repetitive", pa.bool_()),
    ]
)


def seq_repetition_scores(sf_dir: str) -> rd.Dataset:
    """Within-sequence token repetition metrics (the token-level analog of
    the Gopher repetition signals in ``text.doc_repetition_scores``): per
    row, the adjacent-duplicate count, distinct-token count and max
    single-token frequency, plus a composed ``repetitive`` flag.

    All metrics are INTEGER (numerator/denominator, never a float ratio)
    so the SQL oracle compares exactly. One vectorized pass per batch over
    the flat values buffer: adjacent duplicates via a shifted compare +
    cumsum window sum; distinct and top-frequency via ONE single-key sort
    of the combined ``row * 2^32 + (value - INT32_MIN)`` int64 (rows per
    batch < 2^31, values span the full int32 range, so the key is exact
    and a plain ``np.sort`` replaces a 2-key lexsort) — key changes give
    distinct counts (bincount of segment rows) and segment lengths reduce
    to per-row maxima (``np.maximum.reduceat`` at the first segment of
    each row). Null list ELEMENTS take the engine's -1 sentinel (SQL:
    ``list_transform(tokens, x -> coalesce(x, -1))``); rows with NULL
    doc_id or NULL tokens are excluded. ``batch_size`` is bounded SMALL
    (2048 rows): whole 100k-row read blocks carry ~44M flat tokens and 32
    concurrent lexsorts of that working set thrashed the node (473 s for
    the 12.8M corpus); the dominant residual cost was then FRESH-ARENA
    warmup — with one big batch per worker every temp allocation is a
    first-touch page fault, measured 16 s/task in a fresh session vs 2 s
    warm. Small batches amortize each worker's arena across many batches:
    21 s → 3.1 s cold-session at sf0.1, 61 s → 43 s at 12.8M rows,
    results identical.

    ``repetitive`` = (n>1 AND adj_dup/(n-1) > 0.3) OR (n>0 AND top/n >
    0.2), evaluated as integer cross-multiplication on both sides."""
    return _seq_ds(sf_dir, columns=["doc_id", "source", "tokens"]).map_batches(
        _repetition_batch, batch_format="pyarrow", batch_size=2048
    )


def _repetition_batch(t: pa.Table) -> pa.Table:
    """Per-batch repetition kernel (module-level so the hypothesis
    differential test drives it on crafted/sliced Arrow tables directly).
    Math documented on ``seq_repetition_scores``."""
    ok = pc.and_(pc.is_valid(t.column("doc_id")), pc.is_valid(t.column("tokens")))
    sel = t.filter(ok)
    if sel.num_rows == 0:
        return _REPSCORE_EMPTY.empty_table()
    offs, vals = _tokens_parts(sel.column("tokens"))
    v = vals[offs[0] : offs[-1]]
    ro = offs - offs[0]
    n = np.diff(ro)
    lo, hi = ro[:-1], ro[1:]
    # adjacent duplicates: window sum of the shifted compare. Indices
    # clamp to c.size-1: a TRAILING empty row has lo == hi == v.size
    # (one past c's end); clamped, its two indices coincide → 0.
    if v.size > 1:
        c = np.concatenate(([0], np.cumsum(v[1:] == v[:-1], dtype=np.int64)))
        nd = c[np.minimum(np.maximum(hi - 1, lo), c.size - 1)] - c[
            np.minimum(lo, c.size - 1)
        ]
    else:
        nd = np.zeros(n.size, dtype=np.int64)
    # distinct + top frequency: sort ONE combined int64 key whose high
    # bits are the row and low bits the (shifted) int32 value — exact,
    # and cheaper than a 2-key lexsort. Built IN PLACE (astype, +=, |=,
    # .sort()): the naive expression allocates ~40 B/token and the
    # first-touch page-zeroing of fresh arenas across 32 workers was
    # the measured wall (16 s/task first run vs 2 s warm)
    combined = v.astype(np.int64)
    combined += 1 << 31
    combined |= np.repeat(np.arange(n.size, dtype=np.int64) << 32, n)
    combined.sort()
    new_seg = np.ones(combined.size, dtype=bool)
    if combined.size:
        new_seg[1:] = combined[1:] != combined[:-1]
    seg_starts = np.flatnonzero(new_seg)
    seg_rows = (combined[seg_starts] >> 32).astype(np.int64)
    n_distinct = np.bincount(seg_rows, minlength=n.size).astype(np.int64)
    seg_lens = np.diff(np.append(seg_starts, combined.size))
    top = np.zeros(n.size, dtype=np.int64)
    nonempty = n > 0
    if seg_starts.size:
        first_seg = np.searchsorted(seg_rows, np.flatnonzero(nonempty))
        top[nonempty] = np.maximum.reduceat(seg_lens, first_seg)
    repetitive = ((n > 1) & (nd * 10 > (n - 1) * 3)) | (nonempty & (top * 5 > n))
    return pa.table(
        {
            "doc_id": sel.column("doc_id"),
            "source": sel.column("source"),
            "n_tok_actual": pa.array(n.astype(np.int64)),
            "n_adj_dup": pa.array(nd.astype(np.int64)),
            "n_distinct": pa.array(n_distinct),
            "top_tok_n": pa.array(top),
            "repetitive": pa.array(repetitive),
        }
    )



_XSRC_SCHEMA = pa.schema(
    [
        ("source_a", pa.string()),
        ("source_b", pa.string()),
        ("n_shared", pa.int64()),
    ]
)


def seq_cross_source_dups(sf_dir: str, augment: bool | None = None) -> pa.Table:
    """Inter-source contamination audit: for every unordered source pair,
    the number of DISTINCT (augmented-view) token-array contents that
    appear in BOTH sources. The same content leaking across supposedly
    independent sources (web scrape vs books vs code) is a classic
    training-mix defect this surfaces corpus-wide.

    Same candidate→recover shape as ``seq_dup_token_arrays`` (the content
    definition is shared via ``_row_hashes``): pass 1 streams distinct
    (content-hash, source) pairs per batch into the ``dupfinder``
    hash-range reduce — a hash seen twice in that stream is a candidate
    (two batches of the same source can re-emit a pair, so candidacy
    over-triggers but never under-triggers); pass 2 recovers the actual
    arrays of candidate rows only; exact grouping + the distinct-source
    check happen on the (tiny) candidate set, so 64-bit collisions and
    same-source repeats are filtered exactly."""
    aug = _aug(sf_dir, augment)
    seq = _seq_ds(sf_dir, columns=["doc_id", "source", "tokens"])

    def add_hs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("source")))
        if t.num_rows == 0:
            return pa.table(
                {"h": pa.array([], type=pa.int64()), "source": pa.array([], type=pa.string())}
            )
        _, _, _, h = _row_hashes(t, aug)
        src = np.asarray(t.column("source").to_pylist(), dtype=object)
        codes, inv = np.unique(src, return_inverse=True)
        order = np.lexsort((h, inv))
        hs, cs = h[order], inv[order]
        first = np.ones(hs.size, dtype=bool)
        first[1:] = (hs[1:] != hs[:-1]) | (cs[1:] != cs[:-1])
        return pa.table(
            {
                "h": pa.array(hs[first].view(np.int64)),
                "source": pa.array(codes[cs[first]], type=pa.string()),
            }
        )

    from ..state.dupfinder import find_dup_hash_values

    hashed = seq.map_batches(add_hs, batch_format="pyarrow", batch_size=None).materialize()
    dup_h = find_dup_hash_values(hashed, "h")
    if dup_h.size == 0:
        return _XSRC_SCHEMA.empty_table()
    dup_sorted = np.sort(dup_h.view(_U64))

    def candidates(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("source")))
        empty = pa.table(
            {
                "source": pa.array([], type=pa.string()),
                "ptok": pa.array([], type=pa.list_(pa.int32())),
            }
        )
        if t.num_rows == 0:
            return empty
        sfx, offs, vals, h = _row_hashes(t, aug)
        pos = np.minimum(np.searchsorted(dup_sorted, h), dup_sorted.size - 1)
        mask = dup_sorted[pos] == h
        if not mask.any():
            return empty
        idx = np.flatnonzero(mask)
        sel = t.take(pa.array(idx))
        rep = aug & (sfx[idx] >= 0) & (sfx[idx] % DUPSEQ_MOD == DUPSEQ_RES)
        ptok = []
        for j, i in enumerate(idx):
            if rep[j]:
                L = DUPSEQ_LEN_BASE + int(sfx[i] % DUPSEQ_LEN_CHOICES)
                ptok.append(_CANARY_NP[:L].tolist())
            else:
                ptok.append(vals[offs[i] : offs[i + 1]].tolist())
        return pa.table(
            {
                "source": sel.column("source"),
                "ptok": pa.array(ptok, type=pa.list_(pa.int32())),
            }
        )

    cand = _collect(seq.map_batches(candidates, batch_format="pyarrow", batch_size=None))
    if cand.num_rows == 0:
        return _XSRC_SCHEMA.empty_table()
    sources = cand.column("source").to_pylist()
    groups: dict[bytes, set] = {}
    for i, x in enumerate(cand.column("ptok").to_pylist()):
        kb = np.asarray(x, dtype=np.int32).tobytes()
        groups.setdefault(kb, set()).add(sources[i])
    pair_counts: dict[tuple, int] = {}
    for srcs in groups.values():
        if len(srcs) < 2:
            continue  # same-source repeat or 64-bit collision: filtered exactly
        ss = sorted(srcs)
        for ai in range(len(ss)):
            for bi in range(ai + 1, len(ss)):
                pair_counts[(ss[ai], ss[bi])] = pair_counts.get((ss[ai], ss[bi]), 0) + 1
    if not pair_counts:
        return _XSRC_SCHEMA.empty_table()
    keys = sorted(pair_counts)
    return pa.table(
        {
            "source_a": pa.array([k[0] for k in keys], type=pa.string()),
            "source_b": pa.array([k[1] for k in keys], type=pa.string()),
            "n_shared": pa.array([pair_counts[k] for k in keys], type=pa.int64()),
        }
    )


def seq_vocab_coverage(sf_dir: str) -> pa.Table:
    """Per-source EXACT vocabulary audit: row count, token count, invalid
    token count (null element / negative / >= VOCAB), and the exact number
    of distinct valid token ids the source uses.

    Distinct-count is a FIXED-WIDTH dense aggregation (one 4 KB packed
    bitset per source — VOCAB/8 bytes), so the scalable shape is the
    ``seq_token_topk`` raw-task tree: one pass per fragment pair builds
    {source: (counts, bitset)} dicts, pairwise-group merges OR the bitsets
    until one dict — #fragments × sources × ~4 KB through the object
    store, log-depth, no row shuffle, and the driver unpacks bits once. A
    (source, token)-keyed groupby would shuffle up to sources × VOCAB rows
    per block instead."""
    import glob as _glob

    import ray

    from ..datagen import resolve_sequences

    files = resolve_sequences(sf_dir)
    nb = VOCAB >> 3  # packed bitset bytes

    @ray.remote
    def scan_frag(paths: list[str]) -> dict:
        import pyarrow.parquet as pq

        out: dict = {}
        for p in paths:
            t = pq.read_table(p, columns=["source", "tokens"])
            t = t.filter(pc.is_valid(t.column("source")))
            if t.num_rows == 0:
                continue
            offs, vals = _tokens_parts(t.column("tokens").combine_chunks().fill_null([]))
            v = vals[offs[0] : offs[-1]]
            n = np.diff(offs - offs[0])
            src = np.asarray(t.column("source").to_pylist(), dtype=object)
            names, inv = np.unique(src, return_inverse=True)
            flat_src = np.repeat(inv, n)
            bad = (v < 0) | (v >= VOCAB)
            for ci, name in enumerate(names):
                rows_m = inv == ci
                el = flat_src == ci
                stats, bits = out.get(name, (np.zeros(3, dtype=np.int64), np.zeros(nb, dtype=np.uint8)))
                stats = stats + np.array(
                    [int(rows_m.sum()), int(el.sum()), int((bad & el).sum())], dtype=np.int64
                )
                good = v[el & ~bad]
                seen = np.zeros(VOCAB, dtype=bool)
                seen[good] = True
                out[name] = (stats, bits | np.packbits(seen, bitorder="little"))
        return out

    @ray.remote
    def merge(*dicts) -> dict:
        out: dict = {}
        for d in dicts:
            for k, (stats, bits) in d.items():
                if k in out:
                    s0, b0 = out[k]
                    out[k] = (s0 + stats, b0 | bits)
                else:
                    out[k] = (stats, bits)
        return out

    refs = [scan_frag.remote(files[i : i + 2]) for i in range(0, len(files), 2)]
    while len(refs) > 1:
        refs = [merge.remote(*refs[i : i + 16]) for i in range(0, len(refs), 16)]
    final = ray.get(refs[0]) if refs else {}
    keys = sorted(final)
    return pa.table(
        {
            "source": pa.array(keys, type=pa.string()),
            "n_rows": pa.array([int(final[k][0][0]) for k in keys], type=pa.int64()),
            "n_tokens": pa.array([int(final[k][0][1]) for k in keys], type=pa.int64()),
            "n_invalid_tokens": pa.array(
                [int(final[k][0][2]) for k in keys], type=pa.int64()
            ),
            "n_distinct_valid": pa.array(
                [int(np.unpackbits(final[k][1], bitorder="little").sum()) for k in keys],
                type=pa.int64(),
            ),
        }
    )


# ---------------------------------------------------------------------------
# Prefix / truncation dedup
# ---------------------------------------------------------------------------

PREFIX_K = DUPSEQ_LEN_BASE  # anchor = first-K tokens; shorter rows are out of contract
PREFIX_HOT_CAP = 1024       # anchors shared by more rows are dropped entirely

_PREFIXDUP_SCHEMA = pa.schema(
    [
        ("short_id", pa.string()),
        ("long_id", pa.string()),
        ("short_source", pa.string()),
        ("long_source", pa.string()),
        ("short_len", pa.int64()),
        ("long_len", pa.int64()),
    ]
)


def _anchor_hashes(
    sfx: np.ndarray, offs: np.ndarray, vals: np.ndarray, aug: bool
) -> tuple[np.ndarray, np.ndarray]:
    """(augmented-view tlen int64, first-PREFIX_K-token anchor hash uint64)
    per row; anchor is undefined (0) where tlen < PREFIX_K.

    The anchor uses the ``_content_hash`` formula evaluated at L=PREFIX_K,
    so a length-K row's anchor IS its content hash — the verification pass
    exploits that identity (a short row's full hash equals any superset
    row's K-prefix hash only when the prefixes match)."""
    tlen = (offs[1:] - offs[:-1]).astype(np.int64)
    rep = np.zeros(tlen.size, dtype=bool)
    if aug:
        rep = (sfx >= 0) & (sfx % DUPSEQ_MOD == DUPSEQ_RES)
        if rep.any():
            tlen = tlen.copy()
            tlen[rep] = DUPSEQ_LEN_BASE + (sfx[rep] % DUPSEQ_LEN_CHOICES)
    ok = tlen >= PREFIX_K
    h = np.zeros(tlen.size, dtype=_U64)
    plain = ok & ~rep
    if plain.any():
        with np.errstate(over="ignore"):
            idx = offs[:-1][plain, None] + np.arange(PREFIX_K, dtype=np.int64)
            mat = vals[idx].astype(_U64)
            hv = splitmix64(mat + np.arange(PREFIX_K, dtype=_U64)[None, :] * _GOLD)
            h[plain] = splitmix64(
                hv.sum(axis=1, dtype=_U64) + splitmix64(np.full(1, PREFIX_K, _U64))
            )
    if (ok & rep).any():
        h[ok & rep] = _PREFIX_CANARY_ANCHOR
    return tlen, h


def _canary_anchor() -> np.uint64:
    with np.errstate(over="ignore"):
        seg = _CANARY_NP[:PREFIX_K].astype(_U64)
        hv = splitmix64(seg + np.arange(PREFIX_K, dtype=_U64) * _GOLD)
        return splitmix64(
            hv.sum(dtype=_U64) + splitmix64(np.full(1, PREFIX_K, _U64))
        )[0]


_PREFIX_CANARY_ANCHOR = _canary_anchor()


def seq_prefix_dups(sf_dir: str, augment: bool | None = None) -> pa.Table:
    """Truncation-duplicate pairs: rows whose (augmented-view) token array
    is a STRICT prefix of another row's array — the classic re-crawl /
    re-tokenize-with-shorter-max-len duplicate class that exact-content
    dedup (equality only) and near-dup (whole-array similarity) both miss.

    Contract (mirrored verbatim by the SQL oracle):
    - only prefixes of length >= PREFIX_K count (shorter shared prefixes
      are noise, and the anchor needs K tokens);
    - anchors (first-K token groups) shared by more than PREFIX_HOT_CAP
      rows are dropped entirely — pair enumeration is quadratic per anchor,
      so boilerplate prefixes (a fixed BOS template) must be capped, the
      ``doc_overlap_pairs`` / NGRAM_HOT_CAP precedent. The cap count is
      exact (computed in the dupfinder reduce); the 64-bit anchor-collision
      caveat of every candidate op applies to the cap as well.

    Shape: pass 1 streams one (anchor-hash) row per eligible sequence into
    the ``dupfinder`` hash-range reduce (``max_count`` applies the hot cap
    exactly); pass 2 recovers candidate rows only; verification groups
    candidates by anchor and, per distinct short length L, compares the
    cumsum-derived L-prefix hash of every longer row against the full
    content hash of the length-L rows — matched pairs get an exact
    vectorized token-slice comparison, so 64-bit collisions are filtered
    exactly. Output per verified pair: (short_id, long_id, short_source,
    long_source, short_len, long_len).

    Non-vacuity: the DUPSEQ canary families (lengths 4..8 of the same
    canary) are truncation duplicates of each other by construction, so the
    fixture always exercises the pair path across length groups.

    Reference analog: duplicate grouping (SURVEY G4/D1) extended to the
    containment case; Lee et al. substring dedup is the TEXT-side analog
    (``substring.py``), this is the token-side whole-prefix case.
    """
    aug = _aug(sf_dir, augment)
    seq = _seq_ds(sf_dir, columns=["doc_id", "source", "tokens"])

    def add_anchor(t: pa.Table) -> pa.Table:
        sfx = _suffix_i64(t.column("doc_id"))
        offs, vals = _tokens_parts(t.column("tokens"))
        tlen, h = _anchor_hashes(sfx, offs, vals, aug)
        keep = tlen >= PREFIX_K
        return pa.table({"h": pa.array(h[keep].view(np.int64))})

    from ..state.dupfinder import find_dup_hash_values

    hashed = seq.map_batches(
        add_anchor, batch_format="pyarrow", batch_size=None
    ).materialize()
    dup_h = find_dup_hash_values(hashed, "h", max_count=PREFIX_HOT_CAP)
    if dup_h.size == 0:
        return _PREFIXDUP_SCHEMA.empty_table()
    dup_sorted = np.sort(dup_h.view(_U64))

    def candidates(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "h": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.string()),
                "source": pa.array([], type=pa.string()),
                "ptok": pa.array([], type=pa.list_(pa.int32())),
            }
        )
        sfx = _suffix_i64(t.column("doc_id"))
        offs, vals = _tokens_parts(t.column("tokens"))
        tlen, h = _anchor_hashes(sfx, offs, vals, aug)
        pos = np.minimum(np.searchsorted(dup_sorted, h), dup_sorted.size - 1)
        mask = (tlen >= PREFIX_K) & (dup_sorted[pos] == h)
        if not mask.any():
            return empty
        idx = np.flatnonzero(mask)
        sel = t.take(pa.array(idx))
        rep = aug & (sfx[idx] >= 0) & (sfx[idx] % DUPSEQ_MOD == DUPSEQ_RES)
        ptok = []
        for j, i in enumerate(idx):
            if rep[j]:
                L = DUPSEQ_LEN_BASE + int(sfx[i] % DUPSEQ_LEN_CHOICES)
                ptok.append(_CANARY_NP[:L].tolist())
            else:
                ptok.append(vals[offs[i] : offs[i + 1]].tolist())
        return pa.table(
            {
                "h": pa.array(h[idx].view(np.int64)),
                "doc_id": sel.column("doc_id"),
                "source": sel.column("source"),
                "ptok": pa.array(ptok, type=pa.list_(pa.int32())),
            }
        )

    cand = _collect(seq.map_batches(candidates, batch_format="pyarrow", batch_size=None))
    if cand.num_rows == 0:
        return _PREFIXDUP_SCHEMA.empty_table()

    arr = cand.column("ptok").combine_chunks()
    offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = np.asarray(arr.values.to_numpy(zero_copy_only=False), dtype=np.int32)[
        : offs[-1]
    ]
    tlen = offs[1:] - offs[:-1]
    anch = np.ascontiguousarray(
        cand.column("h").combine_chunks().to_numpy(zero_copy_only=False)
    ).view(_U64)
    si_np, li_np = _verify_prefix_pairs(offs, vals, tlen, anch)
    if si_np.size == 0:
        return _PREFIXDUP_SCHEMA.empty_table()
    si = pa.array(si_np)
    li = pa.array(li_np)
    doc = cand.column("doc_id")
    src = cand.column("source")
    return pa.table(
        {
            "short_id": doc.take(si),
            "long_id": doc.take(li),
            "short_source": src.take(si),
            "long_source": src.take(li),
            "short_len": pa.array(tlen[si_np]),
            "long_len": pa.array(tlen[li_np]),
        }
    ).sort_by([(c, "ascending") for c in _PREFIXDUP_SCHEMA.names])


def _verify_prefix_pairs(
    offs: np.ndarray, vals: np.ndarray, tlen: np.ndarray, anch: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(short_idx, long_idx) for every candidate pair where row short's
    tokens are a STRICT prefix of row long's and their anchors are equal.

    Exact regardless of hash collisions: prefix hashes only nominate pairs,
    each nominated pair gets a vectorized token-slice comparison.
    """
    # cumsum prefix-hash infrastructure over the candidate set (same formula
    # as _content_hash, so phash(row, tlen[row]) == the row's content hash)
    with np.errstate(over="ignore"):
        seg = vals.astype(_U64)
        intra = (
            np.arange(seg.size, dtype=np.int64) - np.repeat(offs[:-1], tlen)
        ).astype(_U64)
        hv = splitmix64(seg + intra * _GOLD)
        csum = np.zeros(seg.size + 1, dtype=_U64)
        np.cumsum(hv, out=csum[1:])

    def phash(rows: np.ndarray, L: int) -> np.ndarray:
        with np.errstate(over="ignore"):
            s = csum[offs[rows] + L] - csum[offs[rows]]
            return splitmix64(s + splitmix64(np.full(1, L, _U64)))

    order = np.lexsort((tlen, anch))
    a_sorted = anch[order]
    run_starts = np.r_[0, np.flatnonzero(a_sorted[1:] != a_sorted[:-1]) + 1]
    run_ends = np.r_[run_starts[1:], order.size]
    out_s: list[np.ndarray] = []
    out_l: list[np.ndarray] = []
    for lo, hi in zip(run_starts, run_ends):
        rows = order[lo:hi]  # sorted by tlen ascending within the anchor
        ls = tlen[rows]
        for L in np.unique(ls)[:-1]:
            Li = int(L)
            shorts = rows[ls == L]
            longs = rows[ls > L]
            hs = phash(shorts, Li)
            hl = phash(longs, Li)
            so = np.argsort(hs, kind="stable")
            hss = hs[so]
            left = np.searchsorted(hss, hl, side="left")
            right = np.searchsorted(hss, hl, side="right")
            cnt = right - left
            lj = np.flatnonzero(cnt > 0)
            if lj.size == 0:
                continue
            cnt = cnt[lj]
            cs = np.cumsum(cnt)
            flat = (
                np.arange(cs[-1], dtype=np.int64)
                - np.repeat(cs - cnt, cnt)
                + np.repeat(left[lj], cnt)
            )
            short_rep = shorts[so[flat]]
            long_rep = np.repeat(longs[lj], cnt)
            # exact verify (64-bit collision filter), vectorized
            cols = np.arange(Li, dtype=np.int64)
            okm = (
                vals[offs[short_rep][:, None] + cols]
                == vals[offs[long_rep][:, None] + cols]
            ).all(axis=1)
            if okm.any():
                out_s.append(short_rep[okm])
                out_l.append(long_rep[okm])
    if not out_s:
        e = np.empty(0, dtype=np.int64)
        return e, e
    return np.concatenate(out_s), np.concatenate(out_l)


# ---------------------------------------------------------------------------
# Shard-level schema audit (footer metadata only)
# ---------------------------------------------------------------------------

_SCHEMA_AUDIT_SCHEMA = pa.schema(
    [
        ("fragment", pa.string()),
        ("num_rows", pa.int64()),
        ("n_row_groups", pa.int64()),
        ("n_leaf_columns", pa.int64()),
        ("schema_sig", pa.string()),
        ("n_sig_fragments", pa.int64()),
    ]
)


@ray.remote
def _scan_shard_footers(paths: list) -> list:
    """Footer-only metadata per fragment: (basename, num_rows, n_row_groups,
    n_leaf_columns, schema signature). Reads a few KB per file regardless of
    shard size — the whole audit touches no data pages."""
    import os

    import pyarrow.parquet as pq

    out = []
    for p in paths:
        f = pq.ParquetFile(p)
        md = f.metadata
        sch = f.schema
        leaves = sorted(
            (sch.column(i).name, sch.column(i).physical_type) for i in range(len(sch))
        )
        sig = ";".join(f"{n}:{t}" for n, t in leaves)
        out.append(
            (os.path.basename(p), md.num_rows, md.num_row_groups, len(leaves), sig)
        )
    return out


def seq_shard_schema_audit(sf_dir: str, files_per_task: int = 64) -> pa.Table:
    """Per-shard PHYSICAL schema audit: every fragment's footer metadata
    (row count, row-group count, leaf-column count, and a deterministic
    schema signature = sorted ``leaf_name:physical_type`` pairs), plus how
    many fragments share each signature — the instant "this shard was
    written by a different job" tripwire every multi-writer 100 TB corpus
    needs before any row-level validation is worth running.

    Shape: one Ray task per ``files_per_task`` fragments, each reading ONLY
    parquet footers (a few KB per file); results are #fragments tiny tuples
    — no data pages are ever read, so the audit costs seconds at any corpus
    size. The signature counting happens on the collected (fragment-count-
    sized) table.

    SQL oracle: DuckDB ``parquet_schema`` / ``parquet_file_metadata`` table
    functions over the same glob — leaf rows are ``num_children IS NULL``
    and DuckDB prints the same parquet physical type names pyarrow exposes
    (BYTE_ARRAY / INT32 / ...), so the signature is engine-independent.

    Reference analog: the input-column validation gate (`app.py` required-
    column check, SURVEY S2) lifted to per-shard physical schemas.
    """
    from ..datagen import resolve_sequences

    files = resolve_sequences(sf_dir)
    if not files:
        return _SCHEMA_AUDIT_SCHEMA.empty_table()
    refs = [
        _scan_shard_footers.remote(files[i : i + files_per_task])
        for i in range(0, len(files), files_per_task)
    ]
    rows = [r for part in ray.get(refs) for r in part]
    sig_counts: dict[str, int] = {}
    for r in rows:
        sig_counts[r[4]] = sig_counts.get(r[4], 0) + 1
    rows.sort(key=lambda r: r[0])
    return pa.table(
        {
            "fragment": pa.array([r[0] for r in rows], type=pa.string()),
            "num_rows": pa.array([r[1] for r in rows], type=pa.int64()),
            "n_row_groups": pa.array([r[2] for r in rows], type=pa.int64()),
            "n_leaf_columns": pa.array([r[3] for r in rows], type=pa.int64()),
            "schema_sig": pa.array([r[4] for r in rows], type=pa.string()),
            "n_sig_fragments": pa.array(
                [sig_counts[r[4]] for r in rows], type=pa.int64()
            ),
        }
    )


# ---------------------------------------------------------------------------
# Shard-level length-distribution audit
# ---------------------------------------------------------------------------

SHARD_NTOK_DRIFT_PCT = 10  # flag a (fragment, source) whose mean n_tok
                           # deviates >10% from the source's corpus mean

_SHARD_STATS_SCHEMA = pa.schema(
    [
        ("fragment", pa.string()),
        ("source", pa.string()),
        ("n_rows", pa.int64()),
        ("n_ntok", pa.int64()),
        ("sum_ntok", pa.int64()),
        ("min_ntok", pa.int64()),
        ("max_ntok", pa.int64()),
        ("length_outlier", pa.bool_()),
    ]
)


@ray.remote
def _scan_shard_stats(paths: list) -> list:
    """Per-(fragment, source) integer n_tok partials; reads ONLY the two
    needed columns per fragment (column pruning at the source)."""
    import os

    import pyarrow.parquet as pq

    out = []
    for p in paths:
        t = pq.read_table(p, columns=["source", "n_tok"])
        nt = t.column("n_tok").combine_chunks()
        valid = np.asarray(pc.is_valid(nt).to_numpy(zero_copy_only=False), dtype=bool)
        ntv = np.asarray(
            pc.fill_null(nt, 0).to_numpy(zero_copy_only=False), dtype=np.int64
        )
        # dictionary-encode the source column (vectorized; no per-row
        # Python) — null sources take code -1, the dictionary is tiny
        enc = pc.dictionary_encode(t.column("source").combine_chunks())
        codes = np.asarray(
            pc.fill_null(enc.indices, -1).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        dictionary = enc.dictionary.to_pylist()
        base = os.path.basename(p)
        for gi in np.unique(codes):
            m = codes == gi
            vm = m & valid
            has = bool(vm.any())
            vals = ntv[vm] if has else None
            out.append(
                (
                    base,
                    None if gi < 0 else str(dictionary[gi]),
                    int(m.sum()),
                    int(vm.sum()),
                    int(vals.sum()) if has else None,
                    int(vals.min()) if has else None,
                    int(vals.max()) if has else None,
                )
            )
    return out


def seq_shard_stats(sf_dir: str, files_per_task: int = 16) -> pa.Table:
    """Per-(fragment, source) length-distribution audit: exact integer
    n_tok stats per shard plus a ``length_outlier`` flag — TRUE when the
    shard's mean n_tok for that source deviates more than
    SHARD_NTOK_DRIFT_PCT percent from the source's corpus-wide mean. The
    shard-granular complement to the corpus-level drift verdicts: a
    re-crawled / wrongly-tokenized SHARD shows up here even when the
    corpus-level KS test still passes.

    Exactness contract: the flag is evaluated by integer cross-
    multiplication — |sum_f·N_s − S_s·n_f|·100 > PCT·S_s·n_f — so there is
    no float threshold to disagree across engines (Python arbitrary-
    precision ints here, HUGEINT casts in the DuckDB oracle; sums at
    10^12-sequence scale overflow int64 when crossed, not before).

    Shape: one Ray task per ``files_per_task`` fragments, each reading ONLY
    (source, n_tok) — two thin columns per shard; partials are
    (fragment × source) tiny tuples, the global per-source totals and the
    flag evaluate on the collected partials table. No row ever shuffles.

    Reference analog: per-batch progress/counter reporting (SURVEY G6/A7)
    lifted to per-shard distribution checks.
    """
    from ..datagen import resolve_sequences

    files = resolve_sequences(sf_dir)
    if not files:
        return _SHARD_STATS_SCHEMA.empty_table()
    refs = [
        _scan_shard_stats.remote(files[i : i + files_per_task])
        for i in range(0, len(files), files_per_task)
    ]
    rows = [r for part in ray.get(refs) for r in part]
    totals: dict = {}
    for r in rows:
        n_s, s_s = totals.get(r[1], (0, 0))
        totals[r[1]] = (n_s + r[3], s_s + (r[4] or 0))
    flags = []
    for r in rows:
        n_f, sum_f = r[3], r[4]
        n_s, s_s = totals[r[1]]
        flags.append(
            n_f > 0
            and n_s > 0
            and abs(sum_f * n_s - s_s * n_f) * 100 > SHARD_NTOK_DRIFT_PCT * s_s * n_f
        )
    order = sorted(range(len(rows)), key=lambda i: (rows[i][0], rows[i][1] or ""))
    return pa.table(
        {
            "fragment": pa.array([rows[i][0] for i in order], type=pa.string()),
            "source": pa.array([rows[i][1] for i in order], type=pa.string()),
            "n_rows": pa.array([rows[i][2] for i in order], type=pa.int64()),
            "n_ntok": pa.array([rows[i][3] for i in order], type=pa.int64()),
            "sum_ntok": pa.array([rows[i][4] for i in order], type=pa.int64()),
            "min_ntok": pa.array([rows[i][5] for i in order], type=pa.int64()),
            "max_ntok": pa.array([rows[i][6] for i in order], type=pa.int64()),
            "length_outlier": pa.array([flags[i] for i in order], type=pa.bool_()),
        }
    )


# --------------------------------------------------------------------------
# Token-budget domain-mixture sampling (corpus reweighting on the
# north-star table)
# --------------------------------------------------------------------------
#
# The doc-axis ``corpus_mixture_sample`` (textprep.py) applies FIXED
# per-source keep-rates. The training-data op a mixture actually needs is
# the inverse: given target token SHARES per domain (a DoReMi/Pile-style
# mixture spec), derive the keep-rates from the corpus's own per-source
# token totals so the sampled corpus hits the target mixture at the largest
# achievable size (the binding domain keeps ~100%). Reference analog: the
# prescreen→threshold shape (SURVEY M10/G8 bucketed scoring); the rate
# arithmetic is all-integer (ppm) so the SQL oracle reproduces it exactly
# with HUGEINT — no float thresholds that could disagree across engines.
#
# Scale shape: phase 1 is a per-batch groupby combiner on two thin columns
# (never more than n_sources rows per block) merged by a 12-key groupby;
# phase 2 is O(n_sources) driver arithmetic on Python bigints; phase 3 is
# one streaming filtered scan with the tiny rate dict in the closure. No
# all-to-all ever touches the token payload.

MIXSEQ_WEIGHTS_PPM: dict[str, int] = {
    "web": 400_000,
    "books": 200_000,
    "code": 200_000,
    "wiki": 150_000,
    "forums": 50_000,
}  # sources not listed (the fixture's spam-*) have weight 0 → dropped
MIXSEQ_MULT = 131          # bucket = (suffix * MULT) % PRIME % PPM
MIXSEQ_PRIME = 1_000_003   # prime > PPM keeps the ppm bucket near-uniform
MIXSEQ_PPM = 1_000_000


def seq_mixture_rates(
    sf_dir: str, weights_ppm: "dict[str, int] | None" = None
) -> "tuple[dict[str, int], dict[str, int]]":
    """Phase 1+2: per-source token totals (exact) and keep-rates (ppm).

    Returns ``(totals, rates_ppm)``. The achievable corpus size is
    ``C = min_s floor(T_s * PPM / W_s)`` over weighted sources PRESENT in
    the corpus; each source keeps ``r_s = floor(floor(C*W_s/PPM) * PPM /
    T_s)`` ppm of its rows. All arithmetic on Python ints (T_s*PPM exceeds
    int64 at 10^12-sequence scale; DuckDB mirrors with HUGEINT).
    """
    from ray.data.aggregate import Sum

    w = MIXSEQ_WEIGHTS_PPM if weights_ppm is None else weights_ppm
    ds = _seq_ds(sf_dir, columns=["doc_id", "source", "n_tok"])

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_kleene(
            pc.and_kleene(pc.is_valid(t.column("doc_id")), pc.is_valid(t.column("source"))),
            pc.and_kleene(pc.is_valid(t.column("n_tok")), pc.greater(t.column("n_tok"), 0)),
        )
        sel = t.filter(pc.fill_null(m, False)).select(["source", "n_tok"])
        g = sel.group_by("source").aggregate([("n_tok", "sum")])
        return pa.table(
            {
                "source": g.column("source"),
                "tok": pc.cast(g.column("n_tok_sum"), pa.int64()),
            }
        ).cast(pa.schema([("source", pa.string()), ("tok", pa.int64())]))

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .materialize()  # tiny combiner output (≤ n_sources rows per block)
        .groupby("source")
        .aggregate(Sum("tok", alias_name="tok"))
    )
    totals = {r["source"]: int(r["tok"]) for r in agg.take_all()}

    bind = [
        (int(totals[s]) * MIXSEQ_PPM) // int(wp)
        for s, wp in w.items()
        if wp > 0 and totals.get(s, 0) > 0
    ]
    if not bind:
        return totals, {}
    c = min(bind)
    rates = {
        s: ((c * int(wp)) // MIXSEQ_PPM) * MIXSEQ_PPM // int(totals[s])
        for s, wp in w.items()
        if wp > 0 and totals.get(s, 0) > 0
    }
    return totals, rates


def seq_mixture_sample(
    sf_dir: str, weights_ppm: "dict[str, int] | None" = None
) -> rd.Dataset:
    """Token-budget domain-mixture sampling over the sequences table:
    derive exact integer keep-rates from the corpus's per-source token
    totals (``seq_mixture_rates``), then keep a row iff its deterministic
    ppm bucket — pure int64 modular arithmetic on the doc_id key, the
    ``seq_split_assign`` re-shard-stable recipe — falls under its source's
    rate. Weighted-source rows only; the sample is reproducible across
    engines, cluster sizes and reruns, and the SQL oracle replays both the
    rate derivation (HUGEINT CTE) and the filter."""
    _, rates = seq_mixture_rates(sf_dir, weights_ppm)
    ds = _seq_ds(sf_dir, columns=["doc_id", "source", "n_tok"])
    out_schema = pa.schema(
        [("doc_id", pa.string()), ("source", pa.string()), ("n_tok", pa.int32())]
    )

    def pick(t: pa.Table) -> pa.Table:
        m = pc.and_kleene(
            pc.and_kleene(pc.is_valid(t.column("doc_id")), pc.is_valid(t.column("source"))),
            pc.and_kleene(pc.is_valid(t.column("n_tok")), pc.greater(t.column("n_tok"), 0)),
        )
        sel = t.filter(pc.fill_null(m, False))
        if sel.num_rows == 0:
            return out_schema.empty_table()
        num = _doc_num(sel.column("doc_id"))
        bucket = (num * MIXSEQ_MULT) % MIXSEQ_PRIME % MIXSEQ_PPM
        # dictionary-encode source → rate lookup touches each DISTINCT
        # value once, not each row (the seq_shard_stats vectorization)
        enc = pc.dictionary_encode(sel.column("source").combine_chunks())
        per_code = np.array(
            [rates.get(s, 0) for s in enc.dictionary.to_pylist()], dtype=np.int64
        )
        thr = per_code[enc.indices.to_numpy(zero_copy_only=False)]
        keep = sel.filter(pa.array(bucket < thr))
        return pa.table(
            {
                "doc_id": keep.column("doc_id"),
                "source": keep.column("source"),
                "n_tok": pc.cast(keep.column("n_tok"), pa.int32()),
            }
        )

    return ds.map_batches(pick, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Corpus content manifest + doc_id content-consistency audit
# ---------------------------------------------------------------------------
#
# Two validation ops the north rule's "per-partition lineage + metrics"
# language asks for but nothing above covers:
#
# * ``seq_corpus_manifest`` — a per-fragment ORDER-INSENSITIVE content
#   checksum (md5-derived 60-bit row hashes summed mod 2^61-1) plus exact
#   row/token counts. Two runs over byte-equal corpora produce identical
#   manifests even if shards were rewritten with different row order, so a
#   copy / re-shard / migration job can be audited by diffing two tiny
#   manifest tables instead of re-validating 10^12 rows; fragments sharing
#   a checksum triple are flagged (``n_twin_fragments`` > 1 = a duplicated
#   shard, the double-submitted-writer failure).
# * ``seq_dup_id_conflicts`` — splits duplicate doc_ids (seq_dup_doc_ids)
#   into benign exact-copy duplicates vs CONFLICTING-content collisions
#   (same primary key, different token payload — the failure mode where a
#   re-crawl silently overwrote half a shard). Reference analog: the
#   cross-row "seen" consistency checks (SURVEY D1/G4) lifted to
#   primary-key semantics.
#
# Exactness contract: the per-row hash is md5 over a canonical string both
# engines build identically — coalesce(doc_id,'~N~') || '|' || (tokens NULL
# -> '~N~'; else comma-joined elements with null elements -> -1, empty list
# -> '') — so the DuckDB oracle replays the checksum bit-for-bit. The
# manifest sum runs in HUGEINT / Python bigints and is reduced mod 2^61-1
# (fits BIGINT) only at the end.
#
# Scale shape: manifest = one task per fragment group reading only
# (doc_id, tokens); output is 4 tiny values per fragment, no row ever
# shuffles. Conflict audit = dupfinder hash-range reduce for the candidate
# ids (8+8 bytes/row), then a recover pass that hashes ONLY candidate rows'
# payloads; |duplicates| << |corpus| per the dupfinder module contract.

MANIFEST_MOD = 2305843009213693951  # 2^61 - 1; BIGINT-safe after the mod


def _tokens_canon(col: "pa.ChunkedArray | pa.Array") -> pa.Array:
    """Canonical comma-joined token string per row (see contract above).

    Vectorized: element cast + list rebuild + ``binary_join`` are Arrow
    kernels; no per-row Python until the md5 loop."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    vstr = pc.cast(pc.fill_null(arr.values, -1), pa.string())
    cls = pa.LargeListArray if isinstance(arr, pa.LargeListArray) else pa.ListArray
    if arr.null_count:
        lst = cls.from_arrays(arr.offsets, vstr, mask=pc.is_null(arr))
    else:
        lst = cls.from_arrays(arr.offsets, vstr)
    return pc.fill_null(pc.binary_join(lst, ","), "~N~")


def _md5_hexes(canon: "pa.Array | pa.ChunkedArray") -> "list[str]":
    """md5 hexdigest per row, hashing the utf-8 value buffer SLICES directly
    (a string array's data buffer IS each row's utf-8 bytes) — no Python
    string materialization or re-encode in the hot loop."""
    import hashlib

    v = canon.combine_chunks() if isinstance(canon, pa.ChunkedArray) else canon
    bufs = v.buffers()
    off_dtype = np.int64 if pa.types.is_large_string(v.type) else np.int32
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[v.offset : v.offset + len(v) + 1]
    data = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    md5 = hashlib.md5
    return [md5(data[offs[i] : offs[i + 1]]).hexdigest() for i in range(len(v))]


def _md5_60(canon: "pa.Array | pa.ChunkedArray") -> "list[int]":
    """First 15 hex digits of md5 as an int — SQL analog
    ``CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)``."""
    return [int(d[:15], 16) for d in _md5_hexes(canon)]


@ray.remote
def _scan_manifest(paths: list) -> list:
    """Per-fragment (name, n_rows, n_tokens, content_sum) — projected read
    of the two content columns only."""
    import os

    import pyarrow.parquet as pq

    out = []
    for p in paths:
        t = pq.read_table(p, columns=["doc_id", "tokens"])
        if t.num_rows == 0:
            out.append((os.path.basename(p), 0, 0, 0))
            continue
        canon = pc.binary_join_element_wise(
            pc.fill_null(t.column("doc_id").combine_chunks(), "~N~"),
            _tokens_canon(t.column("tokens")),
            "|",
        )
        ntk = pc.sum(
            pc.fill_null(
                pc.cast(pc.list_value_length(t.column("tokens")), pa.int64()), 0
            )
        ).as_py()
        total = sum(_md5_60(canon))
        out.append((os.path.basename(p), t.num_rows, int(ntk or 0), total % MANIFEST_MOD))
    return out


_MANIFEST_SCHEMA = pa.schema(
    [
        ("fragment", pa.string()),
        ("n_rows", pa.int64()),
        ("n_tokens", pa.int64()),
        ("content_sum", pa.int64()),
        ("n_twin_fragments", pa.int64()),
    ]
)


def _cpu_files_per_task(n_files: int) -> int:
    """Group size that keeps ~2 tasks per core in flight (md5 per-row work
    dominates these scans, so idle cores are pure wall-time loss)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # pragma: no cover - no cluster
        cpus = 8
    return max(1, n_files // max(1, cpus * 2))


def seq_corpus_manifest(sf_dir: str, files_per_task: "int | None" = None) -> pa.Table:
    """Per-fragment order-insensitive content checksum manifest (contract
    in the section comment above)."""
    from collections import Counter

    from ..datagen import resolve_sequences

    files = resolve_sequences(sf_dir)
    if not files:
        return _MANIFEST_SCHEMA.empty_table()
    if files_per_task is None:
        files_per_task = _cpu_files_per_task(len(files))
    refs = [
        _scan_manifest.remote(files[i : i + files_per_task])
        for i in range(0, len(files), files_per_task)
    ]
    rows = sorted(r for part in ray.get(refs) for r in part)
    twins = Counter((r[1], r[2], r[3]) for r in rows)
    return pa.table(
        {
            "fragment": pa.array([r[0] for r in rows], type=pa.string()),
            "n_rows": pa.array([r[1] for r in rows], type=pa.int64()),
            "n_tokens": pa.array([r[2] for r in rows], type=pa.int64()),
            "content_sum": pa.array([r[3] for r in rows], type=pa.int64()),
            "n_twin_fragments": pa.array(
                [twins[(r[1], r[2], r[3])] for r in rows], type=pa.int64()
            ),
        }
    )


@ray.remote
def _scan_dup_contents(paths: list, ids: pa.Array) -> list:
    """(doc_id, full md5 hex of the canonical token string) for rows whose
    doc_id is a duplicate candidate; everything else never leaves the task."""
    import pyarrow.parquet as pq

    out = []
    for p in paths:
        t = pq.read_table(p, columns=["doc_id", "tokens"])
        mask = pc.is_in(t.column("doc_id"), value_set=ids)
        if not pc.any(mask).as_py():
            continue
        sel = t.filter(mask)
        hexes = _md5_hexes(_tokens_canon(sel.column("tokens")))
        out.extend(zip(sel.column("doc_id").to_pylist(), hexes))
    return out


_DUPCONFLICT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("n_rows", pa.int64()),
        ("n_contents", pa.int64()),
        ("conflicting", pa.bool_()),
    ]
)


def seq_dup_id_conflicts(sf_dir: str, files_per_task: int = 16) -> pa.Table:
    """Primary-key consistency audit: duplicate doc_ids split into exact-copy
    duplicates (n_contents == 1) vs conflicting-content collisions
    (contract in the section comment above)."""
    from ..datagen import resolve_sequences
    from ..state.dupfinder import find_duplicates

    files = resolve_sequences(sf_dir)
    dups = find_duplicates(files)
    if not dups:
        return _DUPCONFLICT_SCHEMA.empty_table()
    ids_ref = ray.put(pa.array(sorted(dups), type=pa.string()))
    refs = [
        _scan_dup_contents.remote(files[i : i + files_per_task], ids_ref)
        for i in range(0, len(files), files_per_task)
    ]
    agg: dict = {}
    for part in ray.get(refs):
        for d, h in part:
            n, hs = agg.setdefault(d, [0, set()])
            agg[d][0] = n + 1
            hs.add(h)
    ids = sorted(d for d, (n, _) in agg.items() if n > 1)
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.string()),
            "n_rows": pa.array([agg[d][0] for d in ids], type=pa.int64()),
            "n_contents": pa.array([len(agg[d][1]) for d in ids], type=pa.int64()),
            "conflicting": pa.array([len(agg[d][1]) > 1 for d in ids], type=pa.bool_()),
        }
    )


_FD_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("n_rows", pa.int64()),
        ("n_sources", pa.int64()),
        ("sources", pa.string()),
    ]
)


@ray.remote
def _scan_id_sources(paths: list, ids: pa.Array) -> list:
    """(doc_id, source-or-sentinel) for rows whose doc_id is a duplicate
    candidate; only two thin columns are read, nothing else leaves the
    task."""
    import pyarrow.parquet as pq

    out = []
    for p in paths:
        t = pq.read_table(p, columns=["doc_id", "source"])
        mask = pc.is_in(t.column("doc_id"), value_set=ids)
        if not pc.any(mask).as_py():
            continue
        sel = t.filter(mask)
        srcs = pc.fill_null(sel.column("source"), "~null~").to_pylist()
        out.extend(zip(sel.column("doc_id").to_pylist(), srcs))
    return out


def seq_id_source_fd(sf_dir: str, files_per_task: int = 16) -> pa.Table:
    """Functional-dependency audit doc_id → source: doc_ids whose rows carry
    MORE THAN ONE distinct source (null folds into the ``~null~`` sentinel —
    a null source conflicting with a real one is an inconsistency, not a
    gap). A multi-writer corpus where two jobs claimed the same id under
    different domains fires here even when the payloads are byte-identical,
    which is exactly the case ``seq_dup_id_conflicts`` (content-keyed)
    cannot see.

    Scale shape: an FD violation requires a duplicate id, so the candidate
    set IS the dupfinder hash-range reduce's output (8 B/row shuffled, the
    shuffle-free range-pruned path applies when fragment key ranges are
    disjoint); the recover pass then reads only (doc_id, source) for
    candidate rows. Driver state is bounded by the duplicate-id set — the
    same contract as ``seq_dup_id_conflicts``. Output: one row per
    violating id with its row count and the sorted distinct source list.
    """
    from ..datagen import resolve_sequences
    from ..state.dupfinder import find_duplicates

    files = resolve_sequences(sf_dir)
    dups = find_duplicates(files)
    if not dups:
        return _FD_SCHEMA.empty_table()
    ids_ref = ray.put(pa.array(sorted(dups), type=pa.string()))
    refs = [
        _scan_id_sources.remote(files[i : i + files_per_task], ids_ref)
        for i in range(0, len(files), files_per_task)
    ]
    agg: dict = {}
    for part in ray.get(refs):
        for d, s in part:
            rec = agg.setdefault(d, [0, set()])
            rec[0] += 1
            rec[1].add(s)
    ids = sorted(d for d, (n, ss) in agg.items() if len(ss) > 1)
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.string()),
            "n_rows": pa.array([agg[d][0] for d in ids], type=pa.int64()),
            "n_sources": pa.array([len(agg[d][1]) for d in ids], type=pa.int64()),
            "sources": pa.array(
                [",".join(sorted(agg[d][1])) for d in ids], type=pa.string()
            ),
        }
    )


# ---------------------------------------------------------------------------
# Two-corpus migration diff
# ---------------------------------------------------------------------------
#
# ``seq_corpus_diff`` answers the migration-validation question the manifest
# can only answer fragment-wise: after a copy / re-shard / re-tokenization,
# WHICH doc_ids were added, removed, or changed? Per-id semantics compare
# the MULTISET of content md5s under each doc_id (duplicate ids compare as
# bags, so a dropped duplicate counts as a change).
#
# Scale shape (the dupfinder candidate→recover contract, two-sided):
#   map     one task per fragment group per side, projected (doc_id, tokens)
#           read → (id_hash u64, md5_hi u64, md5_lo u64) = 24 B/row, split
#           into hash ranges worker-side (num_returns plumbing — partials
#           never touch the driver).
#   reduce  per range: signed multiset sum (+1 for A, −1 for B) over the
#           exact (id_hash, md5) triples; any nonzero group marks its
#           id_hash as a candidate. Equal corpora produce ZERO candidates,
#           so the recover pass reads nothing.
#   recover candidate rows only are re-read for exact doc_id strings + full
#           md5s; per-id bag compare on the driver (|diff| << |corpus|).
# The screen is exact-by-md5 (full 128 bits through the reduce), so the
# only approximation anywhere is md5 itself. Null doc_ids are excluded on
# both sides (they fail validation upstream).

DIFF_SEED = 23


def _diff_row_keys(
    t: pa.Table,
) -> "tuple[pa.Table, pa.Array, np.ndarray, np.ndarray, np.ndarray]":
    """(null-id-filtered table, doc_id array, id_hash u64, md5_hi, md5_lo).

    The FILTERED table is returned so callers index tokens row-aligned with
    the hashes — indexing the unfiltered input would mis-align every row
    after a null doc_id."""
    from ..core.hashing import hash_strings

    mask = pc.is_valid(t.column("doc_id"))
    if not pc.all(mask).as_py():
        t = t.filter(mask)
    ids = t.column("doc_id").combine_chunks()
    idh = hash_strings(ids, seed=DIFF_SEED)
    hexes = _md5_hexes(_tokens_canon(t.column("tokens")))
    hi = np.empty(len(hexes), dtype=np.uint64)
    lo = np.empty(len(hexes), dtype=np.uint64)
    for i, d in enumerate(hexes):
        hi[i] = int(d[:16], 16)
        lo[i] = int(d[16:], 16)
    return t, ids, idh, hi, lo


@ray.remote
def _diff_map(paths: list, ranges: int) -> tuple:
    """Per hash range: (id_hash, md5_hi, md5_lo) arrays for this fragment
    group (one ObjectRef per range via num_returns)."""
    import pyarrow.parquet as pq

    from ..core.hashing import range_edges

    parts = [[] for _ in range(ranges)]
    for p in paths:
        t = pq.read_table(p, columns=["doc_id", "tokens"])
        _, _, idh, hi, lo = _diff_row_keys(t)
        order = np.argsort(idh, kind="stable")
        idh, hi, lo = idh[order], hi[order], lo[order]
        cuts = np.searchsorted(idh, range_edges(ranges))
        for r, (a, b) in enumerate(zip(np.r_[0, cuts], np.r_[cuts, idh.size])):
            parts[r].append((idh[a:b], hi[a:b], lo[a:b]))
    return tuple(
        tuple(np.concatenate(c) for c in zip(*part))
        if part
        else (np.empty(0, np.uint64),) * 3
        for part in parts
    )


@ray.remote
def _diff_reduce(n_a: int, *parts) -> np.ndarray:
    """Candidate id_hashes for one range: signed multiset sum over exact
    (id_hash, md5) triples; nonzero → the id differs between sides."""
    idh = np.concatenate([p[0] for p in parts])
    hi = np.concatenate([p[1] for p in parts])
    lo = np.concatenate([p[2] for p in parts])
    w = np.concatenate(
        [np.full(p[0].size, 1 if i < n_a else -1, dtype=np.int64) for i, p in enumerate(parts)]
    )
    if idh.size == 0:
        return np.empty(0, dtype=np.uint64)
    order = np.lexsort((lo, hi, idh))
    idh, hi, lo, w = idh[order], hi[order], lo[order], w[order]
    new = np.r_[True, (idh[1:] != idh[:-1]) | (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])]
    starts = np.flatnonzero(new)
    sums = np.add.reduceat(w, starts)
    return np.unique(idh[starts[sums != 0]])


@ray.remote
def _diff_recover(paths: list, cand: np.ndarray) -> list:
    """(doc_id, full md5 hex) for rows whose id_hash is a candidate."""
    import pyarrow.parquet as pq

    from ..core.hashing import hash_strings

    out = []
    for p in paths:
        t = pq.read_table(p, columns=["doc_id", "tokens"])
        t = t.filter(pc.is_valid(t.column("doc_id")))
        idh = hash_strings(t.column("doc_id").combine_chunks(), seed=DIFF_SEED)
        m = cand[np.searchsorted(cand, idh, side="left").clip(max=cand.size - 1)] == idh
        if not m.any():
            continue
        sel = t.filter(pa.array(m))
        hexes = _md5_hexes(_tokens_canon(sel.column("tokens")))
        out.extend(zip(sel.column("doc_id").to_pylist(), hexes))
    return out


_DIFF_SCHEMA = pa.schema([("doc_id", pa.string()), ("status", pa.string())])


def seq_corpus_diff_files(
    files_a: list,
    files_b: list,
    *,
    ranges: "int | None" = None,
    files_per_task: "int | None" = None,
) -> pa.Table:
    """Diff two corpora: (doc_id, status ∈ added|removed|changed), sorted.

    Contract and scale shape in the section comment above."""
    from collections import Counter

    if ranges is None:
        try:
            ranges = max(8, int(ray.cluster_resources().get("CPU", 8)))
        except Exception:  # pragma: no cover - no cluster
            ranges = 8
    ranges = max(2, ranges)
    if files_per_task is None:
        # both sides scan concurrently, so size each side at ~1 task/core
        files_per_task = max(1, _cpu_files_per_task(max(len(files_a), len(files_b))) // 1)
    groups_a = [files_a[i : i + files_per_task] for i in range(0, len(files_a), files_per_task)]
    groups_b = [files_b[i : i + files_per_task] for i in range(0, len(files_b), files_per_task)]
    maps_a = [_diff_map.options(num_returns=ranges).remote(g, ranges) for g in groups_a]
    maps_b = [_diff_map.options(num_returns=ranges).remote(g, ranges) for g in groups_b]
    cand_refs = [
        _diff_reduce.remote(len(maps_a), *[m[r] for m in maps_a], *[m[r] for m in maps_b])
        for r in range(ranges)
    ]
    cand = np.unique(np.concatenate(ray.get(cand_refs)))
    if cand.size == 0:
        return _DIFF_SCHEMA.empty_table()
    cand_ref = ray.put(cand)
    rec_a = ray.get([_diff_recover.remote(g, cand_ref) for g in groups_a])
    rec_b = ray.get([_diff_recover.remote(g, cand_ref) for g in groups_b])
    bag_a: dict = {}
    bag_b: dict = {}
    for parts, bag in ((rec_a, bag_a), (rec_b, bag_b)):
        for part in parts:
            for d, h in part:
                bag.setdefault(d, Counter())[h] += 1
    rows = []
    for d in sorted(set(bag_a) | set(bag_b)):
        a, b = bag_a.get(d), bag_b.get(d)
        if a is None:
            rows.append((d, "added"))
        elif b is None:
            rows.append((d, "removed"))
        elif a != b:
            rows.append((d, "changed"))
        # equal bags = an id_hash collision neighbor swept in by the
        # candidate screen — correctly reported as unchanged (dropped)
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
            "status": pa.array([r[1] for r in rows], type=pa.string()),
        }
    )


def seq_corpus_diff(sf_dir: str) -> pa.Table:
    """Fixture entry: v1 corpus vs the deterministically derived v2
    (``datagen.ensure_sequences_v2``). For real two-corpus diffs call
    ``seq_corpus_diff_files`` (or the ``diff`` CLI) with both directories."""
    import glob as _g
    import os as _os

    from ..datagen import _is_fixture_tag, ensure_sequences_v2, resolve_sequences

    if not _is_fixture_tag(sf_dir):
        raise ValueError(
            "seq_corpus_diff(sf_dir) derives its second corpus only for "
            "fixture tags; diff real corpora with "
            "seq_corpus_diff_files(files_a, files_b)"
        )
    files_a = resolve_sequences(sf_dir)
    v2 = ensure_sequences_v2(sf_dir)
    files_b = sorted(_g.glob(_os.path.join(v2, "frag-*.parquet")))
    return seq_corpus_diff_files(files_a, files_b)


# ---------------------------------------------------------------------------
# Incremental-ingest content dedup (new batch vs existing corpus)
# ---------------------------------------------------------------------------

# second independent content-hash tweak: (h1, h2) = 128-bit content identity
# for the cross-corpus membership join — the seq_minhash_recall fp1/fp2
# convention (hash-level exactness without shipping token payloads)
_INC_TWEAK = _U64(0xD1B54A32D192ED03)

_INCDEDUP_SCHEMA = pa.schema(
    [("doc_id", pa.string()), ("source", pa.string()), ("n_tok", pa.int64())]
)


@ray.remote
def _inc_map_base(paths: list, ranges: int) -> tuple:
    """Per content-hash range: sorted (h1, h2) identity-pair arrays for
    this base fragment group (read in-task — base payloads never enter the
    object store)."""
    import pyarrow.parquet as pq

    from ..core.hashing import range_edges

    parts: list = [[] for _ in range(ranges)]
    for p in paths:
        t = pq.read_table(p, columns=["tokens"])
        offs, vals = _tokens_parts(t.column("tokens"))
        h1 = _content_hash(offs, vals)
        h2 = _content_hash(offs, vals, tweak=_INC_TWEAK)
        order = np.lexsort((h2, h1))
        h1, h2 = h1[order], h2[order]
        cuts = np.searchsorted(h1, range_edges(ranges))
        for r, (a, b) in enumerate(zip(np.r_[0, cuts], np.r_[cuts, h1.size])):
            parts[r].append((h1[a:b], h2[a:b]))
    return tuple(
        tuple(np.concatenate(c) for c in zip(*part))
        if part
        else (np.empty(0, _U64),) * 2
        for part in parts
    )


@ray.remote
def _inc_map_new(paths: list, ranges: int, cols: tuple) -> tuple:
    """Per content-hash range: this new fragment group's rows (selected
    columns) with (h1, h2) identity columns appended."""
    import pyarrow.parquet as pq

    from ..core.hashing import range_edges

    read_cols = list(dict.fromkeys(list(cols) + ["tokens"]))
    parts: list = [[] for _ in range(ranges)]
    schema = None
    for p in paths:
        t = pq.read_table(p, columns=read_cols).replace_schema_metadata(None)
        offs, vals = _tokens_parts(t.column("tokens"))
        h1 = _content_hash(offs, vals)
        h2 = _content_hash(offs, vals, tweak=_INC_TWEAK)
        sel = (
            t.select(list(cols))
            .append_column("__h1", pa.array(h1.view(np.int64)))
            .append_column("__h2", pa.array(h2.view(np.int64)))
        )
        schema = sel.schema
        order = np.argsort(h1, kind="stable")
        sel = sel.take(pa.array(order))
        hs = h1[order]
        cuts = np.searchsorted(hs, range_edges(ranges))
        for r, (a, b) in enumerate(zip(np.r_[0, cuts], np.r_[cuts, hs.size])):
            if b > a:
                parts[r].append(sel.slice(a, b - a))
    empty = schema.empty_table()
    return tuple(pa.concat_tables(part) if part else empty for part in parts)


@ray.remote
def _inc_reduce(n_base: int, *parts) -> pa.Table:
    """One content-hash range: membership test of new rows' (h1, h2) against
    the base pair set (structured-array searchsorted); returns the ADMITTED
    rows with the identity columns dropped."""
    h1 = np.concatenate([p[0] for p in parts[:n_base]])
    h2 = np.concatenate([p[1] for p in parts[:n_base]])
    key = np.empty(h1.size, dtype=[("a", "<u8"), ("b", "<u8")])
    key["a"], key["b"] = h1, h2
    key = np.sort(key)  # lexicographic by field order
    news = [p for p in parts[n_base:]]
    t = pa.concat_tables([p for p in news if p.num_rows] or news[:1])
    if t.num_rows == 0:
        return t.drop_columns(["__h1", "__h2"])
    q = np.empty(t.num_rows, dtype=key.dtype)
    q["a"] = t.column("__h1").to_numpy(zero_copy_only=False).view(_U64)
    q["b"] = t.column("__h2").to_numpy(zero_copy_only=False).view(_U64)
    found = np.zeros(len(q), dtype=bool)
    if key.size:
        pos = np.minimum(np.searchsorted(key, q), key.size - 1)
        found = key[pos] == q
    return t.filter(pa.array(~found)).drop_columns(["__h1", "__h2"])


def seq_incremental_dedup_files(
    files_base: list,
    files_new: list,
    *,
    payload: bool = False,
    cap: "int | None" = None,
    ranges: "int | None" = None,
) -> "pa.Table | rd.Dataset":
    """Incremental-ingest gate: rows of the NEW corpus whose token CONTENT
    appears nowhere in the BASE corpus — the rows an incremental ingest
    should actually admit.  ``seq_corpus_diff`` answers identity ("which
    doc_ids changed"); this answers CONTENT ("which payloads are genuinely
    new"): a re-crawled page re-ingested under a fresh doc_id is caught
    here and missed there.  Within-new duplicates are NOT collapsed (both
    copies are new relative to base — within-corpus dedup is
    ``seq_dup_token_arrays``' job); NULL token lists compare as ``[]`` and
    NULL elements as ``-1`` (the ``_tokens_parts`` sentinel view, the
    dup-family oracle convention).

    Output: (doc_id, source, n_tok) of the admitted new rows, doc_id-sorted;
    with ``payload=True`` instead a streaming ``Dataset`` of the admitted
    FULL rows (original schema incl. tokens, unsorted) for the caller to
    ``write_parquet`` — the ``ingest`` CLI's sink mode.  In payload mode
    above the broadcast cap the new side's rows (tokens included) flow
    through the distributed anti-join — O(new batch), never O(base); the
    summary mode keeps the join side down to 34 B/row.

    Scale shape: base rows ship ONLY a 16-byte content identity — two
    independent position-mixed 64-bit hashes; the removal policy is
    broadcast-or-range-reduce (the ``core/joins`` cap logic with the
    dupfinder exchange in place of ``Dataset.join``):

    - base identity set ≤ cap (2M) → ``ray.put`` once, vectorized ``is_in``
      per new batch — no shuffle at all;
    - above the cap → a file-fed hash-range reduce: base fragments are read
      IN-TASK and ship only per-range sorted (h1, h2) pair arrays, new rows
      ride the same ranges with their output columns, and each range task
      does one structured-array searchsorted membership test.  Measured at
      12.8M-vs-12.8M rows: 206.8 s through the Dataset hash anti-join →
      this path (the documented ~25× groupby-vs-tree-reduce gap).  At real
      scale the base NEVER fits the cap, so this IS the main path.

    The driver sees only the admitted rows (at production scale:
    ``write_parquet`` the returned Dataset instead of collecting).
    Reference analog: the durability resume skip — "rows already present
    in the results CSV are not re-processed" (utils/durability.py:20-26) —
    lifted from row ids to content identity; oracle: NOT EXISTS on the
    sentinel-coalesced token serialization (see __ray_entry__.oracle_sql)."""
    from ..core import joins as _joins

    cap = _joins.BROADCAST_KEY_CAP if cap is None else cap
    out_cols = (
        ("doc_id", "tokens", "n_tok", "source")
        if payload
        else ("doc_id", "source", "n_tok")
    )

    def _packed_keys(t: pa.Table) -> pa.Array:
        offs, vals = _tokens_parts(t.column("tokens"))
        h1 = _content_hash(offs, vals)
        h2 = _content_hash(offs, vals, tweak=_INC_TWEAK)
        m = np.empty((h1.size, 2), dtype=_U64)
        m[:, 0], m[:, 1] = h1, h2
        fsb = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(16), h1.size, [None, pa.py_buffer(np.ascontiguousarray(m))]
        )
        return pc.cast(fsb, pa.binary())

    def key_base(t: pa.Table) -> pa.Table:
        # per-batch distinct — shrinks the probe on dup-heavy bases
        return pa.table({"ck": pc.unique(_packed_keys(t))})

    base = rd.read_parquet(files_base, columns=["tokens"])
    keys = _joins.probe_keys(
        base.map_batches(key_base, batch_format="pyarrow"), "ck", cap
    )
    if keys is not None:
        ref = ray.put(keys.drop_null())

        def filt(t: pa.Table, _cache={}) -> pa.Table:
            ks = _cache.get("ks")
            if ks is None:
                ks = _cache["ks"] = ray.get(ref)
            mask = pc.fill_null(pc.is_in(_packed_keys(t), value_set=ks), False)
            return t.filter(pc.invert(mask)).select(list(out_cols)).replace_schema_metadata(None)

        admitted = rd.read_parquet(
            files_new, columns=list(dict.fromkeys(list(out_cols) + ["tokens"]))
        ).map_batches(filt, batch_format="pyarrow")
    else:
        if ranges is None:
            try:
                ranges = max(8, int(ray.cluster_resources().get("CPU", 8)))
            except Exception:  # pragma: no cover - no cluster
                ranges = 8
        ranges = max(2, ranges)
        fpt = max(1, _cpu_files_per_task(max(len(files_base), len(files_new))))
        groups_b = [files_base[i : i + fpt] for i in range(0, len(files_base), fpt)]
        groups_n = [files_new[i : i + fpt] for i in range(0, len(files_new), fpt)]
        maps_b = [
            _inc_map_base.options(num_returns=ranges).remote(g, ranges)
            for g in groups_b
        ]
        maps_n = [
            _inc_map_new.options(num_returns=ranges).remote(g, ranges, out_cols)
            for g in groups_n
        ]
        out_refs = [
            _inc_reduce.remote(
                len(maps_b), *[m[r] for m in maps_b], *[m[r] for m in maps_n]
            )
            for r in range(ranges)
        ]
        admitted = rd.from_arrow_refs(out_refs)
    if payload:
        return admitted
    out = _collect(admitted)
    if out.num_rows == 0:
        return _INCDEDUP_SCHEMA.empty_table()
    # all three keys: duplicate doc_ids (the planted dup family) would make
    # a single-key sort order path-dependent
    idx = pc.sort_indices(
        out,
        sort_keys=[
            ("doc_id", "ascending"),
            ("source", "ascending"),
            ("n_tok", "ascending"),
        ],
        null_placement="at_start",
    )
    return out.take(idx).cast(_INCDEDUP_SCHEMA)


def seq_incremental_dedup(sf_dir: str) -> pa.Table:
    """Fixture entry: the v2 corpus (``datagen.ensure_sequences_v2``) as the
    incoming batch deduped against the v1 base.  Real ingests call
    ``seq_incremental_dedup_files(files_base, files_new)``."""
    import glob as _g
    import os as _os

    from ..datagen import _is_fixture_tag, ensure_sequences_v2, resolve_sequences

    if not _is_fixture_tag(sf_dir):
        raise ValueError(
            "seq_incremental_dedup(sf_dir) derives its incoming batch only "
            "for fixture tags; gate real ingests with "
            "seq_incremental_dedup_files(files_base, files_new)"
        )
    files_base = resolve_sequences(sf_dir)
    v2 = ensure_sequences_v2(sf_dir)
    files_new = sorted(_g.glob(_os.path.join(v2, "frag-*.parquet")))
    return seq_incremental_dedup_files(files_base, files_new)


# ---------------------------------------------------------------------------
# Two-corpus distribution-drift audit
# ---------------------------------------------------------------------------
#
# ``seq_corpus_diff`` answers IDENTITY ("which rows changed"); this answers
# DISTRIBUTION ("did the copy / re-shard / re-tokenization shift per-source
# length distributions") — the migration-validation analog of the flagship's
# reference-histogram drift check, with the statistic made ENGINE-EXACT:
# KS = max_bin |cumA/nA - cumB/nB| evaluated by integer cross-multiplication
# (max |cumA*nB - cumB*nA| over the bin union, then one integer division to
# ppm), so no float threshold or summation order can disagree with the SQL
# oracle. Each corpus contributes one (source, bin) count table — a per-batch
# combiner over two thin columns reduced in-Dataset by a (source, bin)
# groupby Sum; no corpus row ever shuffles and the driver sees exactly
# sources × bins integers per side regardless of block count.

DRIFT2_KS_PPM = 2500  # flag when the max CDF gap exceeds 0.25% (ppm scale).
# The statistic is EXACT, not significance-tested: a 35-row source that
# loses one row to a remove-residue legitimately shows a ~3% CDF gap and
# flags (the sf0.01 fixture's spam-1/spam-2), while the big sources sit at
# 500–1000 ppm from the per-fragment v2 additions. Callers pick the
# threshold for their corpus; the default documents intent, the oracle
# replays the arithmetic bit-for-bit at any setting.


def _drift2_hist(files: list) -> "dict[tuple[str, int], int]":
    """(source-or-sentinel, bin) → rows. bin = -1 for null/negative n_tok
    (a negative value must not floor-divide into a real bin), else
    n_tok // HIST_BIN_WIDTH, uncapped."""
    from ..core.batches import arrow_out as _aout
    from ..core.schema import HIST_BIN_WIDTH

    w = HIST_BIN_WIDTH
    ds = rd.read_parquet(files, columns=["source", "n_tok"])

    def partial(t: pa.Table) -> pd.DataFrame:
        ntv = pc.fill_null(pc.cast(t.column("n_tok"), pa.int64()), -1).to_numpy(
            zero_copy_only=False
        )
        b = np.where(ntv < 0, -1, ntv // w).astype(np.int64)
        src = pc.fill_null(t.column("source"), "~null~").to_pandas().to_numpy()
        g = (
            pd.DataFrame({"source": src, "bin": b, "n": np.int64(1)})
            .groupby(["source", "bin"], as_index=False)
            .sum()
        )
        g["n"] = g["n"].astype(np.int64)
        return g

    return _hist_rollup(ds.map_batches(_aout(partial), batch_format="pyarrow"))


def _hist_rollup(partials: rd.Dataset) -> "dict[tuple[str, int], int]":
    """Reduce per-batch (source, bin, n) partials IN-DATASET before the
    driver sees them: materialize the tiny combiner output, then one
    groupby Sum — the driver receives sources × bins rows regardless of
    block count (VERDICT r4 weak mark: the previous per-batch take_all
    fold handed the driver O(blocks × sources × bins) partial rows, which
    grows with corpus block count at 100 TB)."""
    from ray.data.aggregate import Sum

    agg = (
        partials.materialize()  # tiny combiner output (≤ sources × bins rows per block)
        .groupby(["source", "bin"])
        .aggregate(Sum("n", alias_name="n"))
    )
    return {(r["source"], int(r["bin"])): int(r["n"]) for r in agg.take_all()}


def _ks_verdicts(
    ha: "dict[tuple[str, int], int]",
    hb: "dict[tuple[str, int], int]",
    ks_ppm: int,
    count_cols: tuple = ("rows_a", "rows_b"),
    key_col: str = "source",
) -> pa.Table:
    """Shared integer-KS core over two (source, bin) → count tables: per
    source, max |cumA*nB − cumB*nA| over the bin union (Python bigints),
    one integer division to ppm. A source present on only one side is
    maximal drift (the CDF gap supremum is 1): ks_ppm = 1,000,000."""
    per_src: dict[str, tuple[dict, dict]] = {}
    for (s, b), n in ha.items():
        per_src.setdefault(s, ({}, {}))[0][b] = n
    for (s, b), n in hb.items():
        per_src.setdefault(s, ({}, {}))[1][b] = n
    rows = []
    for s in sorted(per_src):
        ca, cb = per_src[s]
        na, nb = sum(ca.values()), sum(cb.values())
        if na == 0 or nb == 0:
            ks = 1_000_000
        else:
            cum_a = cum_b = 0
            m = 0
            for b in sorted(set(ca) | set(cb)):
                cum_a += ca.get(b, 0)
                cum_b += cb.get(b, 0)
                m = max(m, abs(cum_a * nb - cum_b * na))  # Python bigints
            ks = (m * 1_000_000) // (na * nb)
        rows.append(
            {
                key_col: s,
                count_cols[0]: na,
                count_cols[1]: nb,
                "ks_ppm": ks,
                "drifted": ks > ks_ppm,
            }
        )
    schema = pa.schema(
        [
            (key_col, pa.string()),
            (count_cols[0], pa.int64()),
            (count_cols[1], pa.int64()),
            ("ks_ppm", pa.int64()),
            ("drifted", pa.bool_()),
        ]
    )
    return pa.Table.from_pylist(rows, schema=schema)


def seq_corpus_drift_files(
    files_a: list, files_b: list, ks_ppm: int = DRIFT2_KS_PPM
) -> pa.Table:
    """Per-source two-corpus length-KS drift (exact integer ppm; contract
    in the section comment above)."""
    return _ks_verdicts(_drift2_hist(files_a), _drift2_hist(files_b), ks_ppm)


def seq_corpus_drift(sf_dir: str) -> pa.Table:
    """Fixture entry: v1 corpus vs the derived v2 (``seq_corpus_diff``
    precedent — real corpora go through ``seq_corpus_drift_files``)."""
    import glob as _g
    import os as _os

    from ..datagen import _is_fixture_tag, ensure_sequences_v2, resolve_sequences

    if not _is_fixture_tag(sf_dir):
        raise ValueError(
            "seq_corpus_drift(sf_dir) derives its second corpus only for "
            "fixture tags; compare real corpora with "
            "seq_corpus_drift_files(files_a, files_b)"
        )
    files_a = resolve_sequences(sf_dir)
    v2 = ensure_sequences_v2(sf_dir)
    files_b = sorted(_g.glob(_os.path.join(v2, "frag-*.parquet")))
    return seq_corpus_drift_files(files_a, files_b)


TOKDRIFT_BIN = 1024  # token-id bin width: 32 bins over the 32k vocab


def _tokdrift_hist(files: list) -> "dict[tuple[str, int], int]":
    """(source-or-sentinel, token-id bin) → TOKEN count. bin = -1 for
    null/negative token elements, else token // TOKDRIFT_BIN, uncapped.
    Null/empty token lists contribute nothing (they carry no tokens).

    Fully vectorized: per batch, dictionary-encoded sources are repeated to
    token positions via list offsets, and one bincount over the combined
    (source code, bin) index produces the partial — no (source, token) row
    ever shuffles."""
    from ..core.batches import arrow_out as _aout

    ds = rd.read_parquet(files, columns=["source", "tokens"])

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = t.column("tokens").combine_chunks()
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals_arr = toks.values
        if vals_arr.null_count:
            vals_arr = pc.fill_null(vals_arr, -1)
        vals = np.asarray(vals_arr.to_numpy(zero_copy_only=False), dtype=np.int64)
        vals = vals[: offs[-1]] if offs.size else vals[:0]
        src = pc.fill_null(t.column("source"), "~null~")
        d = pc.dictionary_encode(src)
        codes = np.asarray(
            d.combine_chunks().indices.to_numpy(zero_copy_only=False), dtype=np.int64
        )
        uniq = d.combine_chunks().dictionary.to_pylist()
        raw_lens = offs[1:] - offs[:-1]
        # a null LIST still spans offsets (undefined value region) — mask
        # its values out and give it zero repeat weight
        valid_list = pc.is_valid(toks).to_numpy(zero_copy_only=False)
        v = vals[np.repeat(valid_list, raw_lens)]
        tok_codes = np.repeat(codes, np.where(valid_list, raw_lens, 0))
        bins = np.where(v < 0, -1, v // TOKDRIFT_BIN)
        nb = (32768 // TOKDRIFT_BIN) + 2
        idx = tok_codes * nb + (bins + 1)
        counts = np.bincount(idx, minlength=len(uniq) * nb)
        rows = []
        for ci, s in enumerate(uniq):
            seg = counts[ci * nb : (ci + 1) * nb]
            for bi in np.flatnonzero(seg):
                rows.append({"source": s, "bin": int(bi) - 1, "n": int(seg[bi])})
        return pd.DataFrame(rows, columns=["source", "bin", "n"]).astype(
            {"bin": np.int64, "n": np.int64}
        )

    return _hist_rollup(ds.map_batches(_aout(partial), batch_format="pyarrow"))


def seq_corpus_token_drift(sf_dir: str, ks_ppm: int = DRIFT2_KS_PPM) -> pa.Table:
    """Two-corpus TOKEN-ID distribution drift per source (fixture v1 vs the
    derived v2): the re-tokenization detector — a tokenizer/vocab change
    shifts which token ids appear even when sequence LENGTHS stay identical,
    so this is the content complement of ``seq_corpus_drift``. Same exact
    integer-KS core (``_ks_verdicts``) over (source, token-id bin) counts
    weighted by TOKENS, not rows; null/negative elements fold into bin -1
    and null/empty lists contribute nothing."""
    import glob as _g
    import os as _os

    from ..datagen import _is_fixture_tag, ensure_sequences_v2, resolve_sequences

    if not _is_fixture_tag(sf_dir):
        raise ValueError(
            "seq_corpus_token_drift(sf_dir) derives its second corpus only "
            "for fixture tags; compare real corpora with "
            "seq_corpus_token_drift_files(files_a, files_b)"
        )
    files_a = resolve_sequences(sf_dir)
    v2 = ensure_sequences_v2(sf_dir)
    files_b = sorted(_g.glob(_os.path.join(v2, "frag-*.parquet")))
    return seq_corpus_token_drift_files(files_a, files_b, ks_ppm)


def seq_corpus_token_drift_files(
    files_a: list, files_b: list, ks_ppm: int = DRIFT2_KS_PPM
) -> pa.Table:
    return _ks_verdicts(
        _tokdrift_hist(files_a),
        _tokdrift_hist(files_b),
        ks_ppm,
        count_cols=("tokens_a", "tokens_b"),
    )


# ---------------------------------------------------------------------------
# Cross-split contamination audit
# ---------------------------------------------------------------------------

_SPLITLEAK_SCHEMA = pa.schema(
    [
        ("group_rep", pa.string()),
        ("n_rows", pa.int64()),
        ("n_splits", pa.int64()),
        ("splits", pa.string()),
    ]
)

_SPLIT_NAMES = np.array(["test", "val", "train"], dtype=object)


def _split_codes(doc_id: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """0=test, 1=val, 2=train — the seq_split_assign bucket formula."""
    num = _doc_num(doc_id)
    bucket = (num * SPLIT_MULT) % SPLIT_PRIME % 100
    return np.where(bucket < SPLIT_TEST_PCT, 0, np.where(bucket < SPLIT_VAL_PCT, 1, 2))


def seq_split_leakage(sf_dir: str, augment: bool | None = None) -> pa.Table:
    """Cross-split contamination audit: (augmented-view) token-array
    contents that appear in MORE THAN ONE of the deterministic
    train/val/test splits (``seq_split_assign``'s formula) — the leakage
    class where an eval example also trains, which no within-split dedup
    catches and which makes eval numbers lie. One output row per leaked
    content: (group_rep = min doc_id, n_rows, n_splits, splits as the
    sorted comma-joined split names).

    A cross-split duplicate content is in particular duplicated
    corpus-wide, so ``seq_dup_token_arrays``'s candidates form a strict
    superset: pass 1 is the same content-hash stream through the dupfinder
    hash-range reduce (8 B/row); pass 2 recovers candidate rows only and
    verifies the split SET on exact token arrays driver-side (64-bit
    collisions filtered exactly). Null doc_ids carry no split and are
    excluded, mirroring seq_split_assign.

    Reference analog: the decontamination/holdout discipline (SURVEY §2.7,
    Lee et al. dedup family) applied between a corpus's own splits.
    """
    aug = _aug(sf_dir, augment)
    seq = _seq_ds(sf_dir, columns=["doc_id", "tokens"])

    def add_hash(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("doc_id")))
        if t.num_rows == 0:
            return pa.table({"h": pa.array([], type=pa.int64())})
        _, _, _, h = _row_hashes(t, aug)
        return pa.table({"h": pa.array(h.view(np.int64))})

    from ..state.dupfinder import find_dup_hash_values

    hashed = seq.map_batches(add_hash, batch_format="pyarrow", batch_size=None).materialize()
    dup_h = find_dup_hash_values(hashed, "h")
    if dup_h.size == 0:
        return _SPLITLEAK_SCHEMA.empty_table()
    dup_sorted = np.sort(dup_h.view(_U64))

    def candidates(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column("doc_id")))
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.string()),
                "split": pa.array([], type=pa.int64()),
                "ptok": pa.array([], type=pa.list_(pa.int32())),
            }
        )
        if t.num_rows == 0:
            return empty
        sfx, offs, vals, h = _row_hashes(t, aug)
        pos = np.minimum(np.searchsorted(dup_sorted, h), dup_sorted.size - 1)
        mask = dup_sorted[pos] == h
        if not mask.any():
            return empty
        idx = np.flatnonzero(mask)
        sel = t.take(pa.array(idx))
        rep = aug & (sfx[idx] >= 0) & (sfx[idx] % DUPSEQ_MOD == DUPSEQ_RES)
        ptok = []
        for j, i in enumerate(idx):
            if rep[j]:
                L = DUPSEQ_LEN_BASE + int(sfx[i] % DUPSEQ_LEN_CHOICES)
                ptok.append(_CANARY_NP[:L].tolist())
            else:
                ptok.append(vals[offs[i] : offs[i + 1]].tolist())
        return pa.table(
            {
                "doc_id": sel.column("doc_id"),
                "split": pa.array(
                    _split_codes(sel.column("doc_id")).astype(np.int64)
                ),
                "ptok": pa.array(ptok, type=pa.list_(pa.int32())),
            }
        )

    cand = _collect(seq.map_batches(candidates, batch_format="pyarrow", batch_size=None))
    if cand.num_rows == 0:
        return _SPLITLEAK_SCHEMA.empty_table()
    keys = [
        np.asarray(x, dtype=np.int32).tobytes()
        for x in cand.column("ptok").to_pylist()
    ]
    groups: dict[bytes, list[int]] = {}
    for i, kb in enumerate(keys):
        groups.setdefault(kb, []).append(i)
    doc_ids = cand.column("doc_id").to_pylist()
    codes = cand.column("split").to_numpy(zero_copy_only=False)
    rows = []
    for members in groups.values():
        present = sorted({int(codes[i]) for i in members})
        if len(present) < 2:
            continue  # single-split duplicate (or 64-bit collision group)
        rows.append(
            (
                min(doc_ids[i] for i in members),
                len(members),
                len(present),
                ",".join(sorted(_SPLIT_NAMES[present])),
            )
        )
    rows.sort()
    return pa.table(
        {
            "group_rep": pa.array([r[0] for r in rows], type=pa.string()),
            "n_rows": pa.array([r[1] for r in rows], type=pa.int64()),
            "n_splits": pa.array([r[2] for r in rows], type=pa.int64()),
            "splits": pa.array([r[3] for r in rows], type=pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# Per-partition pass/fail verdicts
# ---------------------------------------------------------------------------

_PARTVERDICT_SCHEMA = pa.schema(
    [("fragment", pa.string()), ("n_rows", pa.int64())]
    + [(n, pa.int64()) for n in (
        "null_doc_id", "null_tokens", "ntok_mismatch", "token_oov",
        "token_neg", "bad_source", "ntok_range",
    )]
    + [("viol_rows", pa.int64()), ("passed", pa.bool_())]
)


@ray.remote
def _scan_partition_verdicts(paths: list) -> list:
    """Per-fragment row-check counts via the fused check kernel — one
    projected read per fragment, verdict tuples out, no row shuffles."""
    import os

    import pyarrow.parquet as pq

    from ..checks.row_checks import conform_schema, row_check_matrix
    from ..sources.dimensions import build_check_ctx

    ctx = build_check_ctx()
    out = []
    for p in paths:
        t = conform_schema(
            pq.read_table(p, columns=["doc_id", "tokens", "n_tok", "source"])
        )
        mat = row_check_matrix(t, ctx)
        out.append(
            (
                os.path.basename(p),
                t.num_rows,
                *(int(c) for c in mat.sum(axis=0)),
                int(mat.any(axis=1).sum()),
            )
        )
    return out


def seq_partition_verdicts(sf_dir: str, files_per_task: "int | None" = None) -> pa.Table:
    """Per-PARTITION pass/fail verdict table — the north rule's own output
    language ("per-partition pass/fail verdicts") as a first-class query:
    for every input fragment, the count each row check fired, the number of
    violating rows, and ``passed`` (no violations). This is the queryable
    face of what ``run_validation`` records in per-partition lineage.

    Shape: one task per fragment group, fused check kernel per fragment
    (``checks.row_checks.row_check_matrix``, the same matrix the flagship
    pipeline uses), a dozen integers out per fragment — the audit costs one
    projected read and no shuffle at any corpus size.
    """
    from ..datagen import resolve_sequences

    files = resolve_sequences(sf_dir)
    if not files:
        return _PARTVERDICT_SCHEMA.empty_table()
    if files_per_task is None:
        files_per_task = _cpu_files_per_task(len(files))
    refs = [
        _scan_partition_verdicts.remote(files[i : i + files_per_task])
        for i in range(0, len(files), files_per_task)
    ]
    rows = sorted(r for part in ray.get(refs) for r in part)
    cols: dict = {"fragment": pa.array([r[0] for r in rows], type=pa.string())}
    for j, name in enumerate(_PARTVERDICT_SCHEMA.names[1:-1], start=1):
        cols[name] = pa.array([r[j] for r in rows], type=pa.int64())
    cols["passed"] = pa.array([r[-1] == 0 for r in rows], type=pa.bool_())
    return pa.table(cols)


# ---------------------------------------------------------------------------
# Row-group sizing audit (footer-only)
# ---------------------------------------------------------------------------
#
# Row-group granularity IS the streaming read granularity: a shard written
# with one giant row group forces every reader to materialize it whole,
# breaking batch streaming and memory budgets at 100 TB. This audit reads
# ONLY parquet footers (KBs per file — same cost class as
# seq_shard_schema_audit) and flags fragments whose largest row group
# exceeds the row- or compressed-byte ceiling. Thresholds are integers and
# the flags are exact comparisons, so the DuckDB parquet_metadata() oracle
# reproduces them bit-for-bit.

RG_MAX_ROWS = 1_048_576          # rows per row group a streaming reader tolerates
RG_MAX_BYTES = 268_435_456       # 256 MiB compressed per row group


@ray.remote
def _scan_rowgroup_audit(paths: list) -> list:
    import os

    import pyarrow.parquet as pq

    out = []
    for p in paths:
        md = pq.ParquetFile(p).metadata
        base = os.path.basename(p)
        if md.num_row_groups == 0:
            out.append((base, 0, 0, 0, 0, 0))
            continue
        rows = []
        comps = []
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            rows.append(rg.num_rows)
            comps.append(
                sum(rg.column(j).total_compressed_size for j in range(rg.num_columns))
            )
        out.append(
            (base, md.num_row_groups, min(rows), max(rows), sum(comps), max(comps))
        )
    return out


_RGAUDIT_SCHEMA = pa.schema(
    [
        ("fragment", pa.string()),
        ("n_row_groups", pa.int64()),
        ("min_rg_rows", pa.int64()),
        ("max_rg_rows", pa.int64()),
        ("compressed_bytes", pa.int64()),
        ("max_rg_compressed", pa.int64()),
        ("oversized_rows", pa.bool_()),
        ("oversized_bytes", pa.bool_()),
    ]
)


def seq_rowgroup_audit(
    sf_dir: str,
    files_per_task: int = 64,
    max_rows: int = RG_MAX_ROWS,
    max_bytes: int = RG_MAX_BYTES,
) -> pa.Table:
    """Per-fragment row-group sizing audit (contract in the section comment
    above). 0-row-group fragments report zeros and never flag."""
    from ..datagen import resolve_sequences

    files = resolve_sequences(sf_dir)
    if not files:
        return _RGAUDIT_SCHEMA.empty_table()
    refs = [
        _scan_rowgroup_audit.remote(files[i : i + files_per_task])
        for i in range(0, len(files), files_per_task)
    ]
    rows = sorted(r for part in ray.get(refs) for r in part)
    return pa.table(
        {
            "fragment": pa.array([r[0] for r in rows], type=pa.string()),
            "n_row_groups": pa.array([r[1] for r in rows], type=pa.int64()),
            "min_rg_rows": pa.array([r[2] for r in rows], type=pa.int64()),
            "max_rg_rows": pa.array([r[3] for r in rows], type=pa.int64()),
            "compressed_bytes": pa.array([r[4] for r in rows], type=pa.int64()),
            "max_rg_compressed": pa.array([r[5] for r in rows], type=pa.int64()),
            "oversized_rows": pa.array([r[3] > max_rows for r in rows], type=pa.bool_()),
            "oversized_bytes": pa.array([r[5] > max_bytes for r in rows], type=pa.bool_()),
        }
    )


# ---------------------------------------------------------------------------
# Footer-statistics check prescreen
# ---------------------------------------------------------------------------
# Parquet column-chunk statistics (min / max / null_count) are enough to
# PROVE, per fragment, that some row checks cannot fire anywhere in it —
# without reading a single data page. At 100 TB that is the difference
# between paying a full row-level scan on every shard and paying it only on
# shards the footers cannot clear: a fragment whose token-element max stat
# is < VOCAB provably has no token_oov row, one whose n_tok stats sit inside
# [1, min-cap] with zero nulls provably has no ntok_range row, and so on.
# Every proof here is SOUND (TRUE means the check cannot fire; FALSE means
# "unknown", never "dirty") and conservative:
#
#   null_doc_id    — doc_id null_count == 0 across all non-empty row groups.
#   null_tokens    — tokens LEAF null_count == 0. The leaf counts null
#                    lists, null elements AND empty lists together (measured:
#                    a [null-list, [None,5], []] file reports 3), so this
#                    proof also implies no-null-elements below.
#   ntok_mismatch  — never provable from per-column stats (needs the row-wise
#                    n_tok == len(tokens) pairing); proven only vacuously
#                    (0-row fragment).
#   token_oov      — element max stat < VOCAB on every non-empty row group
#                    (null/empty lists never fire oov, and stats min/max
#                    ignore nulls, so max alone suffices).
#   token_neg      — element min stat >= 0 AND leaf null_count == 0 (a null
#                    ELEMENT is treated as -1 by the row kernel, so the min
#                    stat alone — which ignores nulls — is not sufficient).
#   bad_source     — source null_count == 0 AND min == max AND that single
#                    value is allowlisted. Parquet may truncate string
#                    stats, but truncated min is a lower bound and truncated
#                    max an upper bound, so min == max == s still proves
#                    every value equals s exactly.
#   ntok_range     — n_tok null_count == 0 AND min >= 1 AND max <= the
#                    GLOBAL minimum cap (min over every allowlisted source's
#                    cap and MAX_N_TOK_DEFAULT) — sound without knowing the
#                    per-row source pairing.
#
# A row group with 0 rows contributes nothing (pyarrow writes one empty row
# group for empty tables); a fragment with no non-empty row groups proves
# every check vacuously. Missing statistics on any contributing row group
# make that column's proofs FALSE.
#
# SQL oracle: DuckDB parquet_metadata() exposes the same footer fields
# (stats_min_value/stats_max_value/stats_null_count per column chunk; list
# leaves named 'tokens, list, element' vs pyarrow's 'tokens.list.element'),
# so the proofs replay bit-for-bit.
#
# Reference analog: the pre-flight required-column / wrong-file gate
# (app.py:478-481) lifted from "is the schema right" to "which row checks
# are already proven clean", per shard.

_PRESCREEN_CHECKS: tuple[str, ...] = tuple(f"prove_{n}" for n in (
    "null_doc_id",
    "null_tokens",
    "ntok_mismatch",
    "token_oov",
    "token_neg",
    "bad_source",
    "ntok_range",
))

_PRESCREEN_SCHEMA = pa.schema(
    [("fragment", pa.string()), ("n_rows", pa.int64())]
    + [(n, pa.bool_()) for n in _PRESCREEN_CHECKS]
    + [("n_proven", pa.int64())]
)


def _min_source_cap(allowlist_rows: "list[dict] | None" = None) -> int:
    from ..core.schema import MAX_N_TOK_DEFAULT, SOURCE_ALLOWLIST

    rows = SOURCE_ALLOWLIST if allowlist_rows is None else allowlist_rows
    return min([MAX_N_TOK_DEFAULT] + [int(r["max_n_tok"]) for r in rows])


@ray.remote
def _scan_stats_prescreen(paths: list, vocab: int, min_cap: int, allowed: frozenset) -> list:
    import os

    import pyarrow.parquet as pq

    out = []
    for p in paths:
        md = pq.ParquetFile(p).metadata
        base = os.path.basename(p)
        idx = {md.schema.column(i).path: i for i in range(md.num_columns)}

        # per-column aggregation over non-empty row groups:
        # nulls_known, nulls_sum, mm_known, vmin, vmax
        agg: dict[str, list] = {
            c: [True, 0, True, None, None]
            for c in ("doc_id", "tokens.list.element", "n_tok", "source")
        }
        n_contrib = 0
        for ri in range(md.num_row_groups):
            rg = md.row_group(ri)
            if rg.num_rows == 0:
                continue
            n_contrib += 1
            for c, a in agg.items():
                ci = idx.get(c)
                st = rg.column(ci).statistics if ci is not None else None
                if st is None or not st.has_null_count:
                    a[0] = False
                else:
                    a[1] += st.null_count
                if st is None or not st.has_min_max:
                    a[2] = False
                else:
                    a[3] = st.min if a[3] is None else min(a[3], st.min)
                    a[4] = st.max if a[4] is None else max(a[4], st.max)

        if n_contrib == 0:
            flags = (True,) * len(_PRESCREEN_CHECKS)
        else:
            did, tok, ntk, src = (
                agg["doc_id"], agg["tokens.list.element"], agg["n_tok"], agg["source"],
            )
            flags = (
                did[0] and did[1] == 0,                                   # null_doc_id
                tok[0] and tok[1] == 0,                                   # null_tokens
                False,                                                    # ntok_mismatch
                tok[2] and tok[4] < vocab,                                # token_oov
                tok[2] and tok[3] >= 0 and tok[0] and tok[1] == 0,        # token_neg
                src[0] and src[1] == 0 and src[2]
                and src[3] == src[4] and src[3] in allowed,               # bad_source
                ntk[0] and ntk[1] == 0 and ntk[2]
                and ntk[3] >= 1 and ntk[4] <= min_cap,                    # ntok_range
            )
        out.append((p, md.num_rows) + tuple(bool(f) for f in flags))
    return out


def stats_prescreen_files(
    files: list,
    *,
    files_per_task: int = 64,
    vocab: int = VOCAB,
    allowlist_rows: "list[dict] | None" = None,
) -> "dict[str, tuple[int, tuple[bool, ...]]]":
    """Footer-proof scan over an explicit fragment list → {full path:
    (n_rows, per-check proven flags in _PRESCREEN_CHECKS order)}. The
    building block ``run_validation(prescreen=True)`` uses with ITS
    dimension state (custom allowlist / caps), keyed by full path."""
    if not files:
        return {}
    allowed = frozenset(
        r["source"] for r in allowlist_rows
    ) if allowlist_rows is not None else _ALLOWED
    min_cap = _min_source_cap(allowlist_rows)
    refs = [
        _scan_stats_prescreen.remote(
            files[i : i + files_per_task], vocab, min_cap, allowed
        )
        for i in range(0, len(files), files_per_task)
    ]
    return {r[0]: (r[1], tuple(r[2:])) for part in ray.get(refs) for r in part}


def seq_stats_prescreen(sf_dir: str, files_per_task: int = 64) -> pa.Table:
    """Footer-statistics check prescreen (contract in the section comment
    above): per fragment, which row checks are PROVEN clean from parquet
    column-chunk statistics alone — no data pages read, so the prescreen
    costs seconds at any corpus size and tells a 100 TB validation run which
    shards (and which checks per shard) it can skip paying for."""
    import os

    from ..datagen import resolve_sequences

    files = resolve_sequences(sf_dir)
    if not files:
        return _PRESCREEN_SCHEMA.empty_table()
    scan = stats_prescreen_files(files, files_per_task=files_per_task)
    rows = sorted(
        (os.path.basename(p), n) + flags for p, (n, flags) in scan.items()
    )
    cols: dict[str, pa.Array] = {
        "fragment": pa.array([r[0] for r in rows], type=pa.string()),
        "n_rows": pa.array([r[1] for r in rows], type=pa.int64()),
    }
    for j, name in enumerate(_PRESCREEN_CHECKS):
        cols[name] = pa.array([r[2 + j] for r in rows], type=pa.bool_())
    cols["n_proven"] = pa.array(
        [sum(r[2:]) for r in rows], type=pa.int64()
    )
    return pa.table(cols)


# ---------------------------------------------------------------------------
# Fragment key-range audit (doc_id footer min/max + overlap flags)
# ---------------------------------------------------------------------------
# Whether a corpus's fragments carry pairwise-disjoint doc_id ranges decides
# the cost class of every id-keyed global operation: disjoint ranges (a
# sorted or id-partitioned writer) make uniqueness, diffing and resolve-back
# joins embarrassingly parallel — no hash exchange at all (see
# state/dupfinder.find_duplicates range_pruning) — while one overlapping
# shard forces the full shuffle. This audit reads ONLY footers (string
# min/max stats are sound bounds even when truncated: truncated min is a
# lower bound, truncated max an upper bound, so stats ranges CONTAIN true
# ranges) and reports each fragment's bounds plus whether it overlaps any
# other fragment. Reference analog: none (the reference is single-file);
# this is the Ray-native partitioning-contract check the north rule's
# "partitioning handled explicitly" asks for.

_KEYRANGE_SCHEMA = pa.schema(
    [
        ("fragment", pa.string()),
        ("id_min", pa.string()),
        ("id_max", pa.string()),
        ("stats_known", pa.bool_()),
        ("overlaps_other", pa.bool_()),
    ]
)


def seq_keyrange_audit(sf_dir: str, files_per_task: int = 64) -> pa.Table:
    """Per-fragment doc_id footer range + pairwise overlap flag (contract in
    the section comment above). ``overlaps_other`` is computed over the
    stats bounds of fragments with known, non-empty ranges; unknown-stats
    fragments report overlaps_other=false (their flag is ``stats_known`` —
    an unknown range already disables every range-pruned fast path)."""
    import os

    from ..datagen import resolve_sequences
    from ..state.dupfinder import fragment_id_ranges

    files = resolve_sequences(sf_dir)
    if not files:
        return _KEYRANGE_SCHEMA.empty_table()
    rows = sorted(
        (os.path.basename(p), lo, hi, known)
        for p, lo, hi, known in fragment_id_ranges(
            files, files_per_task=files_per_task
        )
    )
    # O(F log F) overlap detection over fragment-count-sized metadata,
    # equivalent to the SQL self-join EXISTS: after sorting by (lo, hi), a
    # span overlaps an EARLIER one iff prefix-max(hi) >= its lo (earlier
    # spans have lo <= its lo), and a LATER one iff suffix-min(lo) <= its hi
    spans = sorted(
        (lo, hi, i)
        for i, (_, lo, hi, known) in enumerate(rows)
        if known and lo is not None
    )
    overlaps = [False] * len(rows)
    pre_hi = None
    for j, (lo, hi, i) in enumerate(spans):
        if pre_hi is not None and pre_hi >= lo:
            overlaps[i] = True
        pre_hi = hi if pre_hi is None else max(pre_hi, hi)
    suf_lo = None
    for lo, hi, i in reversed(spans):
        if suf_lo is not None and suf_lo <= hi:
            overlaps[i] = True
        suf_lo = lo if suf_lo is None else min(suf_lo, lo)
    return pa.table(
        {
            "fragment": pa.array([r[0] for r in rows], type=pa.string()),
            "id_min": pa.array([r[1] for r in rows], type=pa.string()),
            "id_max": pa.array([r[2] for r in rows], type=pa.string()),
            "stats_known": pa.array([r[3] for r in rows], type=pa.bool_()),
            "overlaps_other": pa.array(overlaps, type=pa.bool_()),
        }
    )


@ray.remote
def _probe_footers(paths: list) -> list:
    """(path, error-string) for fragments whose FOOTER cannot be read —
    truncated uploads, zero-byte files, non-parquet garbage. Footer-only."""
    import pyarrow.parquet as pq

    out = []
    for p in paths:
        try:
            pq.ParquetFile(p).metadata
        except Exception as ex:  # noqa: BLE001 — any unreadable shard is the finding
            out.append((p, f"{type(ex).__name__}: {ex}"))
    return out


def probe_unreadable(files: list, files_per_task: int = 64) -> list:
    """[(path, error)] for every fragment with an unreadable footer. The
    cheapest possible corpus health gate: a truncated or garbage shard
    fails HERE with its name, not 40 minutes into a row-level run as an
    opaque Ray task error."""
    if not files:
        return []
    refs = [
        _probe_footers.remote(files[i : i + files_per_task])
        for i in range(0, len(files), files_per_task)
    ]
    return sorted(r for part in ray.get(refs) for r in part)


# ---------------------------------------------------------------------------
# Intra-fragment doc_id sortedness audit
# ---------------------------------------------------------------------------
# ``seq_keyrange_audit`` proves the CROSS-fragment half of the id-sorted
# writer contract (pairwise-disjoint footer ranges); this audit proves the
# WITHIN-fragment half: are rows physically ordered by doc_id inside each
# shard. Together they certify a globally id-sorted corpus — the layout that
# makes uniqueness / diff / resolve-back shuffle-free (dupfinder range
# pruning) and point lookups footer-prunable. Footer stats cannot see row
# ORDER, so this is a projected one-column scan (doc_id only — the token
# payload never leaves storage): per fragment, count adjacent descending
# steps over the file's physical row order, vectorized as one sliced Arrow
# ``less`` per fragment. Null ids fold to '' (sorts first on both engines;
# a null mid-file therefore registers as a descending step) and are counted
# separately for diagnosis. Both engines compare utf-8 bytes (Arrow string
# compare and DuckDB's default binary collation), so the oracle — a
# lag() window over read_parquet(file_row_number=true) — replays every step
# exactly. 0-row fragments emit nothing (matching the SQL group-by).
# Reference analog: none (single-file pandas keeps its frame order); this
# is a Ray-native writer-contract check in the spirit of SURVEY §2.7.

_SORTEDNESS_SCHEMA = pa.schema(
    [
        ("fragment", pa.string()),
        ("n_rows", pa.int64()),
        ("n_null_ids", pa.int64()),
        ("n_desc_steps", pa.int64()),
        ("sorted_asc", pa.bool_()),
    ]
)


@ray.remote
def _scan_sortedness(paths: list) -> list:
    """(fragment, n_rows, n_null_ids, n_desc_steps) per fragment — one
    projected read of doc_id only; order within a single-file read_table is
    the file's physical row order."""
    import os

    import pyarrow.parquet as pq

    out = []
    for p in paths:
        t = pq.read_table(p, columns=["doc_id"])
        n = t.num_rows
        if n == 0:
            continue
        col = t.column("doc_id")
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        nulls = arr.null_count
        ids = pc.fill_null(arr, "")
        desc = 0
        if n >= 2:
            desc = int(
                pc.sum(pc.less(ids.slice(1), ids.slice(0, n - 1))).as_py() or 0
            )
        out.append((os.path.basename(p), n, int(nulls), desc))
    return out


def seq_sortedness_audit(sf_dir: str, files_per_task: "int | None" = None) -> pa.Table:
    """Per-fragment doc_id physical-order audit (contract in the section
    comment above): adjacent descending-step count + sorted flag.

    Fragments are keyed by basename (same convention as seq_keyrange_audit /
    seq_locate_ids): flat ``frag-*.parquet`` corpora never collide; if
    nested corpora with duplicate basenames become supported, key by a
    corpus-relative path on both the engine and oracle sides."""
    from ..datagen import resolve_sequences

    files = resolve_sequences(sf_dir)
    if not files:
        return _SORTEDNESS_SCHEMA.empty_table()
    if files_per_task is None:
        files_per_task = _cpu_files_per_task(len(files))
    refs = [
        _scan_sortedness.remote(files[i : i + files_per_task])
        for i in range(0, len(files), files_per_task)
    ]
    rows = sorted(r for part in ray.get(refs) for r in part)
    return pa.table(
        {
            "fragment": pa.array([r[0] for r in rows], type=pa.string()),
            "n_rows": pa.array([r[1] for r in rows], type=pa.int64()),
            "n_null_ids": pa.array([r[2] for r in rows], type=pa.int64()),
            "n_desc_steps": pa.array([r[3] for r in rows], type=pa.int64()),
            "sorted_asc": pa.array([r[3] == 0 for r in rows], type=pa.bool_()),
        }
    )


# ---------------------------------------------------------------------------
# Footer-pruned point lookup (doc_id → owning fragments)
# ---------------------------------------------------------------------------
# The targeted-re-validation primitive: given a handful of doc_ids (a bug
# report, a takedown request, a failed downstream example), find the shards
# and row counts that hold them WITHOUT a full corpus scan. Fragment pruning
# uses the same footer min/max bounds as ``seq_keyrange_audit`` — string
# stats are sound CONTAINING bounds even when truncated (truncated min is a
# lower bound, truncated max an upper bound), so "no target inside a
# fragment's stats range" proves the fragment holds no target and it is
# never opened. On an id-sorted / id-partitioned corpus this reads O(hit)
# fragments out of 10^5; on an unsorted corpus it degrades to the full
# (still projected, doc_id-only) scan — correct either way, and the SQL
# oracle (a literal IN-list filter with filename=true) replays the result
# exactly regardless of how many fragments were pruned. Default target set
# is deterministic and synthesized from the allowlist source names ×  fixed
# numeric suffixes (present AND absent ids at every sf), so both engines
# agree on the targets without any scan.

LOCATE_DEFAULT_IDXS = (7, 123, 999, 4567, 12345, 31337, 65535, 7654321)

_LOCATE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("fragment", pa.string()),
        ("n_rows", pa.int64()),
    ]
)


def default_locate_ids() -> "list[str]":
    """Deterministic default lookup set: allowlist sources × fixed suffixes
    (some exist at any sf, some never do — absence must round-trip too)."""
    from ..datagen import SOURCES

    return sorted(f"{s}-{i:012d}" for s in SOURCES for i in LOCATE_DEFAULT_IDXS)


def locate_prune(files: "list[str]", targets: "list[str]") -> "tuple[list, list]":
    """(must_scan, provably_empty) fragment split from footer id ranges.

    Sound: stats bounds CONTAIN the true id range, so a fragment whose
    bounds exclude every target cannot hold one. Unknown-stats fragments
    are always scanned; known fragments with no non-null ids are skipped
    only for the id lookup itself (null ids are never lookup targets)."""
    import bisect

    from ..state.dupfinder import fragment_id_ranges

    ts = sorted(targets)
    scan, skip = [], []
    for p, lo, hi, known in fragment_id_ranges(files):
        if not known:
            scan.append(p)
            continue
        if lo is None:
            skip.append(p)
            continue
        j = bisect.bisect_left(ts, lo)
        (scan if j < len(ts) and ts[j] <= hi else skip).append(p)
    return sorted(scan), sorted(skip)


@ray.remote
def _scan_locate(paths: list, ids: pa.Array) -> list:
    """(doc_id, fragment, count) for target rows — doc_id column only."""
    import os

    import pyarrow.parquet as pq

    out = []
    for p in paths:
        t = pq.read_table(p, columns=["doc_id"])
        col = t.column("doc_id").combine_chunks()
        mask = pc.is_in(col, value_set=ids)
        if not pc.any(mask).as_py():
            continue
        vc = pc.value_counts(col.filter(mask))
        frag = os.path.basename(p)
        out.extend(
            (v, frag, int(c))
            for v, c in zip(
                vc.field("values").to_pylist(), vc.field("counts").to_pylist()
            )
        )
    return out


def seq_locate_ids(
    sf_dir: str,
    targets: "list[str] | None" = None,
    files_per_task: int = 64,
    prune: bool = True,
) -> pa.Table:
    """Footer-pruned doc_id point lookup (contract in the section comment
    above): one row per (found id, owning fragment) with the row count.
    ``prune=False`` scans every fragment — identical output by pruning
    soundness; kept as the measured A/B control (see BASELINE.md)."""
    from ..datagen import resolve_sequences

    files = resolve_sequences(sf_dir)
    if targets is None:
        targets = default_locate_ids()
    if not files or not targets:
        return _LOCATE_SCHEMA.empty_table()
    scan, _skip = locate_prune(files, targets) if prune else (sorted(files), [])
    if not scan:
        return _LOCATE_SCHEMA.empty_table()
    ids = ray.put(pa.array(sorted(set(targets)), type=pa.string()))
    refs = [
        _scan_locate.remote(scan[i : i + files_per_task], ids)
        for i in range(0, len(scan), files_per_task)
    ]
    rows = sorted(r for part in ray.get(refs) for r in part)
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
            "fragment": pa.array([r[1] for r in rows], type=pa.string()),
            "n_rows": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )

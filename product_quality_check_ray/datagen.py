"""Deterministic synthetic `sequences` corpus (FIXTURES.md §1-§4).

The engine's primary input table has the exact shape mandated by
``BASELINE.json: input_hint``::

    doc_id: string, tokens: list<int32>, n_tok: int32, source: string

The driver's testdata (`/root/testdata/sf*/`) carries TPC-H-ish tables but no
sequences table, so per the round instructions we synthesise one
deterministically (seeded numpy, no external data) at a scale tied to the
testdata scale factor. A deterministic fraction of rows is corrupted
post-generation (FIXTURES.md §2) and the injection log is written next to the
data so golden tests can hand-compute expected verdicts.

Generation is fragment-parallel-deterministic: per-row metadata (source,
lengths, corruption plan) is derived globally from `seed`, token payloads per
fragment from `[seed, fragment]` child seeds — so any fragment can be
regenerated independently (the property a 10^12-row generator on a real
cluster would need).
"""

from __future__ import annotations

import json
import os
import re
import shutil
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .core.schema import (
    DRIFT_MEAN_FACTOR,
    DRIFTED_SOURCE,
    MAX_N_TOK_DEFAULT,
    SEQUENCE_SCHEMA,
    SOURCE_MEAN_NTOK,
    SOURCE_WEIGHTS,
    SOURCES,
    VOCAB,
    HIST_BIN_WIDTH,
    HIST_NUM_BINS,
)

GEN_VERSION = 3  # bump to invalidate cached generated datasets

DATA_ROOT = os.environ.get("PQCRAY_DATA_ROOT", "/tmp/pqcray_data")

# rows per scale-factor directory basename (matched against sf_dir basename)
SF_ROWS: dict[str, int] = {
    "sf0.001": 8_000,
    "sf0.01": 80_000,
    "sf0.1": 800_000,
}
DEFAULT_ROWS = 20_000
# 2 fragments per CPU at the 32-CPU bench size: fragment count bounds map
# parallelism (one row group per fragment, so reads cannot split further) —
# 16 fragments left half the box idle in every token-payload map stage
NUM_FRAGMENTS = 32

# corruption rates (FIXTURES.md §2); disjoint row sets, assigned in this order
CORRUPTION_RATES: dict[str, float] = {
    "null_doc_id": 0.002,
    "empty_tokens": 0.002,
    "ntok_mismatch": 0.005,
    "oov_token": 0.003,
    "neg_token": 0.001,
    "dup_doc_id": 0.004,
    "bad_source": 0.003,
}


@dataclass
class GenPlan:
    """Global per-row metadata + corruption plan (cheap arrays, no tokens)."""

    n_rows: int
    seed: int
    source: np.ndarray          # object array of str (post bad_source corruption)
    true_len: np.ndarray        # int32: actual token list length (0 for empty_tokens)
    n_tok: np.ndarray           # int32 column value (post ntok_mismatch corruption)
    doc_id: list                # str | None per row (post null/dup corruption)
    injections: dict[str, np.ndarray] = field(default_factory=dict)
    oov_value: np.ndarray | None = None  # per-row oov token value (only for oov rows)


def _base_lengths(rng: np.random.Generator, source_idx: np.ndarray, drift: bool) -> np.ndarray:
    means = np.array(
        [
            SOURCE_MEAN_NTOK[s] * (DRIFT_MEAN_FACTOR if (drift and s == DRIFTED_SOURCE) else 1.0)
            for s in SOURCES
        ]
    )
    shape = 4.0
    lens = rng.gamma(shape, means[source_idx] / shape)
    return np.clip(lens, 1, MAX_N_TOK_DEFAULT).astype(np.int32)


def make_plan(n_rows: int, seed: int = 42, *, corrupt: bool = True, drift: bool = True) -> GenPlan:
    rng = np.random.default_rng(seed)
    source_idx = rng.choice(len(SOURCES), size=n_rows, p=np.array(SOURCE_WEIGHTS))
    true_len = _base_lengths(rng, source_idx, drift)
    n_tok = true_len.copy()
    src_names = np.array(SOURCES, dtype=object)
    source = src_names[source_idx].copy()
    doc_id: list = [f"{source[i]}-{i:012d}" for i in range(n_rows)]

    injections: dict[str, np.ndarray] = {}
    oov_value = np.zeros(n_rows, dtype=np.int32)
    if corrupt and n_rows >= 200:
        perm = rng.permutation(n_rows)
        pos = 0
        for kind, rate in CORRUPTION_RATES.items():
            k = max(1, int(round(n_rows * rate)))
            rows = np.sort(perm[pos : pos + k])
            pos += k
            injections[kind] = rows
        clean_mask = np.ones(n_rows, dtype=bool)
        for rows in injections.values():
            clean_mask[rows] = False
        clean_rows = np.flatnonzero(clean_mask)

        for i in injections["null_doc_id"]:
            doc_id[i] = None
        true_len[injections["empty_tokens"]] = 0
        delta = rng.integers(1, 4, size=len(injections["ntok_mismatch"])) * rng.choice(
            [-1, 1], size=len(injections["ntok_mismatch"])
        )
        n_tok[injections["ntok_mismatch"]] = n_tok[injections["ntok_mismatch"]] + delta.astype(
            np.int32
        )
        oov_value[injections["oov_token"]] = VOCAB + rng.integers(
            0, 100, size=len(injections["oov_token"]), dtype=np.int32
        )
        # duplicates: donors drawn from clean rows; source skew comes for free
        # from the skewed source distribution (hot key: "web")
        donors = rng.choice(clean_rows, size=len(injections["dup_doc_id"]), replace=True)
        for tgt, don in zip(injections["dup_doc_id"], donors):
            doc_id[tgt] = doc_id[don]
        for j, i in enumerate(injections["bad_source"]):
            source[i] = f"spam-{j % 7}"

    return GenPlan(
        n_rows=n_rows,
        seed=seed,
        source=source,
        true_len=true_len,
        n_tok=n_tok,
        doc_id=doc_id,
        injections=injections,
        oov_value=oov_value,
    )


def fragment_bounds(n_rows: int, num_fragments: int = NUM_FRAGMENTS) -> list[tuple[int, int]]:
    edges = np.linspace(0, n_rows, num_fragments + 1).astype(int)
    return [(int(edges[i]), int(edges[i + 1])) for i in range(num_fragments)]


def fragment_table(plan: GenPlan, lo: int, hi: int, frag_idx: int) -> pa.Table:
    """Materialize rows [lo, hi) of the plan as an Arrow table.

    Token payloads come from a per-fragment child seed, so fragments are
    independently regenerable.
    """
    rng = np.random.default_rng([plan.seed, 7919, frag_idx])
    lens = plan.true_len[lo:hi].astype(np.int64)
    total = int(lens.sum())
    flat = rng.integers(0, VOCAB, size=total, dtype=np.int32)
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])

    # token-level corruptions for rows inside this fragment (first token)
    for kind in ("oov_token", "neg_token"):
        rows = plan.injections.get(kind)
        if rows is None:
            continue
        local = rows[(rows >= lo) & (rows < hi)] - lo
        for r in local:
            if lens[r] == 0:
                continue
            off = int(offsets[r])
            flat[off] = plan.oov_value[r + lo] if kind == "oov_token" else -1

    tokens = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(flat, type=pa.int32())
    )
    return pa.Table.from_arrays(
        [
            pa.array(plan.doc_id[lo:hi], type=pa.string()),
            tokens,
            pa.array(plan.n_tok[lo:hi], type=pa.int32()),
            pa.array(list(plan.source[lo:hi]), type=pa.string()),
        ],
        schema=SEQUENCE_SCHEMA,
    )


def write_sequences(
    out_dir: str,
    n_rows: int,
    seed: int = 42,
    *,
    corrupt: bool = True,
    drift: bool = True,
    num_fragments: int = NUM_FRAGMENTS,
) -> str:
    """Write the corpus as `num_fragments` parquet files + injection log.

    Atomic: writes to `<out_dir>.tmp` then renames, so concurrent callers and
    killed runs never observe a half-written dataset.
    """
    marker = os.path.join(out_dir, "_COMPLETE.json")
    spec = {
        "n_rows": n_rows,
        "seed": seed,
        "corrupt": corrupt,
        "drift": drift,
        "num_fragments": num_fragments,
        "gen_version": GEN_VERSION,
    }
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                if json.load(f) == spec:
                    return out_dir
        except (json.JSONDecodeError, OSError):
            pass
        shutil.rmtree(out_dir, ignore_errors=True)

    tmp = out_dir + f".tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    plan = make_plan(n_rows, seed, corrupt=corrupt, drift=drift)
    for frag_idx, (lo, hi) in enumerate(fragment_bounds(n_rows, num_fragments)):
        tbl = fragment_table(plan, lo, hi, frag_idx)
        pq.write_table(tbl, os.path.join(tmp, f"frag-{frag_idx:05d}.parquet"))
    with open(os.path.join(tmp, "_injections.json"), "w") as f:
        json.dump({k: v.tolist() for k, v in plan.injections.items()}, f)
    with open(os.path.join(tmp, "_COMPLETE.json"), "w") as f:
        json.dump(spec, f)
    try:
        os.rename(tmp, out_dir)
    except OSError:
        # lost a race with a concurrent generator — its output is equivalent
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.exists(marker):
            raise
    return out_dir


def sf_tag(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def rows_for_sf(sf_dir: str) -> int:
    return SF_ROWS.get(sf_tag(sf_dir), DEFAULT_ROWS)


def sequences_dir_for(sf_dir: str) -> str:
    return os.path.join(DATA_ROOT, sf_tag(sf_dir), "sequences")


def ensure_sequences(sf_dir: str) -> str:
    """Idempotently materialize the sequences corpus for a testdata sf dir.

    Returns the directory of parquet fragments. The DuckDB oracle SQL reads
    the same files via ``read_parquet('<dir>/frag-*.parquet')``.
    """
    return write_sequences(sequences_dir_for(sf_dir), rows_for_sf(sf_dir))


def sequences_glob(sf_dir: str) -> str:
    return os.path.join(sequences_dir_for(sf_dir), "frag-*.parquet")


def load_injections(seq_dir: str) -> dict[str, np.ndarray]:
    with open(os.path.join(seq_dir, "_injections.json")) as f:
        return {k: np.asarray(v, dtype=np.int64) for k, v in json.load(f).items()}


# ---------------------------------------------------------------------------
# Reference histograms dimension (FIXTURES.md §4): expected per-source n_tok
# distribution from an uncorrupted, undrifted seed-0 pass. Deterministic and
# cheap (lengths only, no token payloads).
# ---------------------------------------------------------------------------

_REF_SAMPLE_ROWS = 400_000


def reference_histograms(seed: int = 0) -> dict[str, np.ndarray]:
    """source → int64 counts over HIST_NUM_BINS+1 bins (last = overflow)."""
    rng = np.random.default_rng(seed)
    source_idx = rng.choice(len(SOURCES), size=_REF_SAMPLE_ROWS, p=np.array(SOURCE_WEIGHTS))
    lens = _base_lengths(rng, source_idx, drift=False)
    out: dict[str, np.ndarray] = {}
    bins = np.minimum(lens // HIST_BIN_WIDTH, HIST_NUM_BINS)
    for i, s in enumerate(SOURCES):
        m = source_idx == i
        out[s] = np.bincount(bins[m], minlength=HIST_NUM_BINS + 1).astype(np.int64)
    return out


# basenames accepted as fixture tags even when absent from SF_ROWS (rows
# fall back to DEFAULT_ROWS); anything else must be a real corpus directory
_TAG_PATTERN = re.compile(r"^sf[0-9][0-9._-]*$")


def _is_fixture_tag(sf_dir: str) -> bool:
    tag = sf_tag(sf_dir)
    return tag in SF_ROWS or bool(_TAG_PATTERN.match(tag))


def resolve_sequences(sf_dir: str) -> list[str]:
    """Input resolution for every sequences-table op: a directory that
    already CONTAINS ``frag-*.parquet`` files is used directly (the
    user-facing path — any corpus in the north-star shape works); otherwise
    ``sf_dir`` must be a testdata sf tag (``SF_ROWS`` key or ``sf*``
    basename), for which the deterministic fixture corpus is materialized
    under DATA_ROOT (the driver/test path).

    An EXISTING directory that holds no ``frag-*.parquet`` and is not a
    known tag raises instead of silently generating a synthetic corpus —
    ``prep --input /typo/dir`` must fail loudly, never pack fake data.
    """
    import glob as _g

    direct = sorted(_g.glob(os.path.join(sf_dir, "frag-*.parquet")))
    if direct:
        return direct
    if not _is_fixture_tag(sf_dir):
        raise FileNotFoundError(
            f"{sf_dir!r} contains no frag-*.parquet fragments and its basename "
            f"is not a known fixture tag ({sorted(SF_ROWS)} or sf<digits>); "
            "point --input at a directory of frag-*.parquet files in the "
            "north-star shape (doc_id, tokens, n_tok, source)"
        )
    ensure_sequences(sf_dir)
    return sorted(_g.glob(sequences_glob(sf_dir)))


def is_fixture_corpus(sf_dir: str) -> bool:
    """Provenance gate for the deterministic fixture AUGMENTATIONS (canary
    splices, benchmark-holdout slice, near-dup families): True only when the
    corpus resolves to the synthetic fixture generator's output — an sf-tag
    path, or a direct directory carrying the generator's ``_injections.json``
    marker. User corpora (any other frag-*.parquet directory) run PLAIN."""
    import glob as _g

    if _g.glob(os.path.join(sf_dir, "frag-*.parquet")):
        return os.path.exists(os.path.join(sf_dir, "_injections.json"))
    return _is_fixture_tag(sf_dir)


# ---------------------------------------------------------------------------
# Deterministic "migrated" corpus variant for the corpus-diff op
# ---------------------------------------------------------------------------
#
# ``seq_corpus_diff`` validates a copy / re-shard / migration by diffing two
# corpora. Its fixture needs a deterministic second corpus with KNOWN
# added / removed / changed rows; this derives one from the v1 fragments:
# rows whose 12-digit doc_id suffix hits suffix % 101 == 7 are dropped
# (removed), rows hitting suffix % 103 == 11 get token 17 appended
# (changed — skipped when the tokens list is NULL, appending to nothing is
# undefined), and each fragment gains one fresh ``addv2-*`` row (added).

DIFF_V2_REMOVE_MOD, DIFF_V2_REMOVE_RES = 101, 7
DIFF_V2_CHANGE_MOD, DIFF_V2_CHANGE_RES = 103, 11
DIFF_V2_TOKEN = 17


def sequences_v2_dir_for(sf_dir: str) -> str:
    return os.path.join(DATA_ROOT, sf_tag(sf_dir), "sequences_v2")


def sequences_v2_glob(sf_dir: str) -> str:
    return os.path.join(sequences_v2_dir_for(sf_dir), "frag-*.parquet")


def ensure_sequences_v2(sf_dir: str) -> str:
    """Idempotently derive the v2 corpus from the v1 fixture fragments."""
    import glob as _g

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    out_dir = sequences_v2_dir_for(sf_dir)
    marker = os.path.join(out_dir, "_COMPLETE.json")
    spec = {"gen_version": GEN_VERSION, "kind": "diff_v2"}
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                if json.load(f) == spec:
                    return out_dir
        except (json.JSONDecodeError, OSError):
            pass
        shutil.rmtree(out_dir, ignore_errors=True)

    ensure_sequences(sf_dir)
    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    for fi, p in enumerate(sorted(_g.glob(sequences_glob(sf_dir)))):
        t = pq.read_table(p)
        sl = pc.utf8_slice_codeunits(t.column("doc_id"), start=-12, stop=2**31 - 1)
        ok = pc.fill_null(pc.match_substring_regex(sl, r"^\d{12}$"), False)
        sfx = pc.fill_null(
            pc.cast(pc.if_else(ok, sl, pa.scalar(None, pa.string())), pa.int64()), -1
        ).to_numpy(zero_copy_only=False)
        keep = ~((sfx >= 0) & (sfx % DIFF_V2_REMOVE_MOD == DIFF_V2_REMOVE_RES))
        t = t.filter(pa.array(keep))
        sfx = sfx[keep]
        change = (sfx >= 0) & (sfx % DIFF_V2_CHANGE_MOD == DIFF_V2_CHANGE_RES)
        toks = t.column("tokens").combine_chunks()
        change &= pc.is_valid(toks).to_numpy(zero_copy_only=False)
        if change.any():
            py = toks.to_pylist()
            for i in np.flatnonzero(change):
                py[i] = py[i] + [DIFF_V2_TOKEN]
            toks = pa.array(py, type=toks.type)
            n_tok = pc.cast(
                pc.if_else(
                    pa.array(change),
                    pc.add(pc.cast(t.column("n_tok"), pa.int64()), 1),
                    pc.cast(t.column("n_tok"), pa.int64()),
                ),
                pa.int32(),
            )
            t = t.set_column(t.schema.get_field_index("tokens"), "tokens", toks)
            t = t.set_column(t.schema.get_field_index("n_tok"), "n_tok", n_tok)
        added = pa.table(
            {
                "doc_id": pa.array([f"addv2-{fi:012d}"], type=pa.string()),
                "tokens": pa.array([[fi % 100, 7, 42]], type=pa.list_(pa.int32())),
                "n_tok": pa.array([3], type=pa.int32()),
                "source": pa.array(["web"], type=pa.string()),
            }
        )
        t = pa.concat_tables([t.select(added.column_names), added])
        pq.write_table(t, os.path.join(tmp, os.path.basename(p)))
    with open(os.path.join(tmp, "_COMPLETE.json"), "w") as f:
        json.dump(spec, f)
    if os.path.exists(out_dir):  # pragma: no cover - concurrent creator won
        shutil.rmtree(tmp, ignore_errors=True)
        return out_dir
    os.rename(tmp, out_dir)
    return out_dir

"""Flagship pipeline: streaming validation of a sequences Parquet corpus.

Dataflow (SURVEY.md §3.1 "our engine's equivalent plan")::

    read_parquet(fragments, include_paths)            # blocks = Arrow tables
      └ map_batches(RowCheckStage, concurrency=pool)  # ONE fused pass:
           • schema conformance + all row checks (vectorized, zero-copy)
           • violation rows → partition-local parquet (side sink, no shuffle)
           • per-(partition, source) partials: counts, n_tok histogram,
             t-digest + HLL sketch bytes     ← the ONLY data leaving the stage
      └ driver merge of tiny partials → per-partition lineage + verdicts
    uniqueness phase: read doc_id column only → per-batch combiner →
      groupby(doc_id) shuffle of (doc_id, n) pairs → dup set → broadcast →
      filtered re-read materializes duplicate violation rows
    drift phase: merged per-source histograms vs reference dimension (no rows)

Scale notes (100 TB / 256 nodes):
- The full-row pass never shuffles: token payloads stay inside their input
  partition; only O(batches × sources) partial rows (a few KB each) move.
- The uniqueness shuffle ships ONLY (doc_id, n) pairs — never tokens
  (SURVEY.md §7.4). Per-batch pre-aggregation is the combiner; Ray's hash
  shuffle handles the skewed key volume because hot *sources* do not make hot
  *doc_ids* (each doc_id is globally rare), and the final dup set is tiny.
- Duplicate-row materialization re-reads with a doc_id predicate (row-group
  statistics pushdown when the dup set is small; broadcast-set filter
  otherwise) — the assumption is |duplicates| ≪ |corpus|, which holds for
  training-data QA; if it ever doesn't, the dup set itself should become a
  Dataset and the materialization a hash join on doc_id.
- Waves of input files bound the checkpoint granularity: lineage records are
  published per wave, so a killed job re-validates at most one wave.

Reference analogs: candidate→verdict per-row loop (``app.py:986-1448``),
failed-rows CSV (``app.py:1516-1521``), durability/resume
(``utils/durability.py:5-31``) — re-architected as above, not ported.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import time
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

# pre-resolve lazy imports that Ray's read path triggers; two Datasets
# planned concurrently (row-check wave + uniqueness thread) otherwise race
# the module import and fail with a partially-initialized fsspec
try:  # pragma: no cover
    import fsspec.implementations.http  # noqa: F401
except Exception:
    pass

from ..checks.drift import drift_verdicts
from ..checks.row_checks import ROW_CHECK_NAMES, annotate_batch, conform_schema
from ..core.schema import HIST_BIN_WIDTH, HIST_NUM_BINS, SOURCE_ALLOWLIST
from ..sources.dimensions import build_check_ctx, reference_histograms_dim
from ..state import dupfinder
from ..state import lineage as lin
from ..state.sketches import HyperLogLog, TDigest

_SENTINEL_MIN = 2**62


def _table_digest(pid: str, t: pa.Table) -> str:
    """Content digest over the FULL serialized table for side-sink filenames.

    Task retries rewrite byte-identical content to the same name (idempotent
    overwrite, never append-duplicates); two DIFFERENT batches collide only
    if their entire violation tables are byte-identical — impossible for
    rows with distinct token payloads. (A doc_id-only digest was measured
    collision-prone: two batches each holding one null-doc_id row hashed
    identically and silently overwrote each other.)"""
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, t.schema) as w:
        w.write_table(t)
    h = hashlib.sha1(pid.encode())
    h.update(sink.getvalue().to_pybytes())
    return h.hexdigest()[:16]


def _phase_log(name: str, t0: float) -> None:
    """Per-phase wall-time telemetry (stderr) when PQCRAY_TIMING is set."""
    if os.environ.get("PQCRAY_TIMING"):
        import sys

        print(f"[pqcray] {name}: {time.time() - t0:.2f}s", file=sys.stderr, flush=True)


def _default_pool() -> tuple[int, int]:
    """Actor pool sized to HALF the CPUs (autoscaling up to that cap).

    The other half stays free for the parquet read tasks feeding the pool —
    measured: a pool of cpus-2 actors starves the reads and a fully
    pre-started pool competes with them during startup; cpus/2 with
    autoscaling was fastest at both 8 and 32 CPUs."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return (1, max(2, cpus // 2))


class RowCheckStage:
    """Actor-pool stage: fused row checks + violation side-sink + partials.

    Dimension state (allowlist, caps, vocab) is built ONCE per actor in
    ``__init__`` from constructor kwargs — the Ray-native version of the
    reference's module-global dictionary indexes (``banningredients.py:25``).
    """

    def __init__(
        self,
        allowlist_rows: list[dict] | None = None,
        out_dir: str | None = None,
        write_violations: bool = True,
        sketch_delta: int = 100,
        enabled_checks: list[str] | None = None,
        write_clean: bool = False,
        schema_repair: bool = False,
        prescreen_ref: Any = None,
        warn_checks: list[str] | None = None,
    ):
        self.ctx = build_check_ctx(
            allowlist_rows,
            enabled_checks=enabled_checks,
            schema_repair=schema_repair,
            warn_checks=warn_checks,
        )
        self.out_dir = out_dir
        self.write_violations = write_violations and out_dir is not None
        self.write_clean = write_clean and out_dir is not None
        self.sketch_delta = sketch_delta
        # footer-statistics prescreen: {full path: frozenset of check names
        # PROVEN clean for that fragment} — shipped once per worker as an
        # object-store ref (broadcast, not per-batch kwargs)
        self.prescreen: dict[str, frozenset] = {}
        if prescreen_ref is not None:
            self.prescreen = ray.get(prescreen_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        paths = batch.column("path")
        data = batch.drop_columns(["path"])
        # a block almost always comes from ONE file: skip the equal+filter
        # there — the filter copies the whole token payload per batch and
        # was the stage's single biggest non-kernel cost when profiled
        uniq = pc.unique(paths)
        if len(uniq) == 1:
            out_rows = self._process_group(uniq[0].as_py(), data)
        else:
            out_rows = []
            for path in uniq.to_pylist():
                sel = data.filter(pc.equal(paths, path))
                out_rows.extend(self._process_group(path, sel))
        return pa.Table.from_pylist(out_rows, schema=_PARTIAL_SCHEMA)

    def _process_group(self, path: str, t: pa.Table) -> list[dict]:
        ctx = self.ctx
        proven = self.prescreen.get(os.path.abspath(path)) if self.prescreen else None
        if proven:
            # drop footer-proven checks for this fragment; proofs are SOUND
            # (a proven check cannot fire on any row here), so the output is
            # bit-identical to the full pass — the kernels just never run
            base = ctx.get("enabled_checks")
            base_set = set(ROW_CHECK_NAMES) if base is None else set(base)
            ctx = dict(ctx)
            ctx["enabled_checks"] = frozenset(base_set - proven)
        annotated, mat = annotate_batch(t, ctx)
        ok = np.asarray(annotated.column("ok").to_numpy(zero_copy_only=False), dtype=bool)
        pid = lin.part_id_for(path)
        n_viol = int((~ok).sum())
        if n_viol and self.write_violations:
            viol = annotated.filter(pa.array(~ok))
            self._write_violations(pid, viol)
        if self.write_clean:
            # validated-corpus sink: passing rows, ORIGINAL columns only,
            # partition-local content-addressed parquet (same idempotent
            # layout/reset semantics as violations — row-check dedup checks
            # never hide here; only doc_id uniqueness is a later global pass)
            clean = t.filter(pa.array(ok))
            if clean.num_rows:
                d = os.path.join(self.out_dir, "clean", f"part={pid}")
                os.makedirs(d, exist_ok=True)
                pq.write_table(
                    clean, os.path.join(d, f"ok-{_table_digest(pid, clean)}.parquet")
                )

        src = annotated.column("source").to_pandas()
        src_filled = src.fillna("\x00null")
        n_tok = np.asarray(
            pc.fill_null(annotated.column("n_tok"), -1).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        doc_ids = annotated.column("doc_id")
        rows_out = []
        for s, idx in src_filled.groupby(src_filled).groups.items():
            ii = np.asarray(idx)
            nt = n_tok[ii]
            valid = nt >= 0
            ntv = nt[valid]
            hist = np.bincount(
                np.minimum(ntv // HIST_BIN_WIDTH, HIST_NUM_BINS),
                minlength=HIST_NUM_BINS + 1,
            ).astype(np.int64)
            # n_tok domain is small-integer: feed the digest weighted uniques
            # so add/compress cost is O(distinct values), not O(rows)
            uv, uc = np.unique(ntv, return_counts=True)
            td = TDigest(self.sketch_delta).add(uv.astype(np.float64), uc.astype(np.float64))
            ids = doc_ids.take(pa.array(ii)).combine_chunks()
            hll = HyperLogLog()
            if len(ids) - ids.null_count > 0:
                hll.add_strings(ids.drop_null())
            counts = mat[ii].sum(axis=0)
            rows_out.append(
                {
                    "path": path,
                    "source": None if s == "\x00null" else s,
                    "rows": int(len(ii)),
                    "ok_rows": int(ok[ii].sum()),
                    "viol_rows": int((~ok[ii]).sum()),
                    **{f"c_{n}": int(counts[j]) for j, n in enumerate(ROW_CHECK_NAMES)},
                    "hist": hist.tolist(),
                    "sum_n_tok": int(ntv.sum()),
                    "min_n_tok": int(ntv.min()) if ntv.size else _SENTINEL_MIN,
                    "max_n_tok": int(ntv.max()) if ntv.size else -1,
                    "td": td.to_bytes(),
                    "hll": hll.to_bytes(),
                }
            )
        return rows_out

    def _write_violations(self, pid: str, viol: pa.Table) -> None:
        d = lin.violations_dir(self.out_dir, pid)
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            viol, os.path.join(d, f"rc-{_table_digest(pid, viol)}.parquet")
        )


# per-worker-process stage cache for the task-based path: Ray reuses worker
# processes across map_batches tasks, so the stage (dimension index, compiled
# state) is built once per worker — same amortization as an actor pool, but
# on the pre-warmed default pool (no per-stage actor startup latency)
_STAGE_CACHE: dict[str, RowCheckStage] = {}


def _row_check_task(batch: pa.Table, **stage_kwargs) -> pa.Table:
    import json

    key = json.dumps(stage_kwargs, sort_keys=True, default=str)
    stage = _STAGE_CACHE.get(key)
    if stage is None:
        _STAGE_CACHE.clear()
        stage = _STAGE_CACHE[key] = RowCheckStage(**stage_kwargs)
    return stage(batch)


_PARTIAL_SCHEMA = pa.schema(
    [
        ("path", pa.string()),
        ("source", pa.string()),
        ("rows", pa.int64()),
        ("ok_rows", pa.int64()),
        ("viol_rows", pa.int64()),
        *[(f"c_{n}", pa.int64()) for n in ROW_CHECK_NAMES],
        ("hist", pa.list_(pa.int64())),
        ("sum_n_tok", pa.int64()),
        ("min_n_tok", pa.int64()),
        ("max_n_tok", pa.int64()),
        ("td", pa.binary()),
        ("hll", pa.binary()),
    ]
)


@dataclass
class ValidationReport:
    partitions: dict[str, dict] = field(default_factory=dict)
    per_source: dict[str, dict] = field(default_factory=dict)
    drift: dict[str, dict] = field(default_factory=dict)
    duplicates: dict[str, int] = field(default_factory=dict)  # doc_id → count
    global_stats: dict[str, Any] = field(default_factory=dict)
    # observed per-source n_tok histograms (drift's left-hand side) — save
    # via sources.dimensions.save_reference_histograms to make THIS corpus
    # the drift reference for the next run (validate --export-hist)
    observed_hists: dict[str, Any] = field(default_factory=dict)

    @property
    def total_rows(self) -> int:
        return sum(p["processed_rows"] for p in self.partitions.values())

    def check_counts(self) -> dict[str, int]:
        out = {n: 0 for n in ROW_CHECK_NAMES}
        for p in self.partitions.values():
            for n in ROW_CHECK_NAMES:
                out[n] += p["check_counts"][n]
        out["dup_doc_id"] = self.global_stats.get("dup_rows", 0)
        return out


class FailFastExceeded(RuntimeError):
    """Raised by ``run_validation(fail_fast_violations=N)`` when recorded
    row violations exceed the budget. The run stops between waves with all
    completed partitions' lineage intact and NO run-success record, so a
    later resume (without the budget, or with a higher one) finishes the
    remaining partitions instead of restarting."""

    def __init__(self, viol_rows: int, budget: int, partitions_done: int):
        self.viol_rows = viol_rows
        self.budget = budget
        self.partitions_done = partitions_done
        super().__init__(
            f"fail-fast: {viol_rows} violation rows recorded > budget {budget} "
            f"after {partitions_done} partitions"
        )


def input_fragments(input_path: str) -> list[str]:
    if os.path.isdir(input_path):
        return sorted(glob.glob(os.path.join(input_path, "*.parquet")))
    return sorted(glob.glob(input_path))


def _chunks(xs: list, k: int):
    for i in range(0, len(xs), k):
        yield xs[i : i + k]


def run_validation(
    input_path: str,
    out_dir: str,
    *,
    allowlist_rows: list[dict] | None = None,
    resume: bool = True,
    wave_files: int = 128,
    batch_size: int | None = None,
    concurrency: tuple[int, int] | int | None = None,
    write_violations: bool = True,
    uniqueness: bool = True,
    use_actor_pool: bool = False,
    enabled_checks: list[str] | None = None,
    write_clean: bool = False,
    schema_repair: bool = False,
    prescreen: bool = False,
    fail_fast_violations: int | None = None,
    warn_checks: list[str] | None = None,
    reference_hists: "dict[str, np.ndarray] | None" = None,
) -> ValidationReport:
    """Run the full validation suite; resumable at wave granularity.

    ``prescreen=True`` first runs the footer-statistics proof scan
    (``tokens.stats_prescreen_files`` — KBs of footer per fragment, no data
    pages) against THIS run's dimension state and skips every proven check
    per fragment. Proofs are sound, so the report, violation rows and
    lineage are bit-identical to a full run; on a mostly-clean corpus (the
    steady state at 100 TB) the row pass drops the token min/max kernel —
    its single biggest cost — on every proven-clean shard.

    ``fail_fast_violations=N`` aborts the run (``FailFastExceeded``) as soon
    as recorded row violations exceed N — between waves, with completed
    partitions' lineage intact and no run-success record, so a 100 TB run
    on a systematically-broken corpus stops after one wave instead of
    burning the full pass, and a later resume finishes the remainder. A
    resumed run seeds the budget with the violations already recorded for
    the partitions it keeps. (Duplicate-id violations are global and
    counted only by the final uniqueness phase — the budget covers row
    checks.)

    ``warn_checks=[...]`` demotes named row checks to WARN severity
    (reference analog: advisory vs blocking verdicts in the reviewer UI):
    they still run, still count per check in ``check_counts()`` and still
    appear in ``checks_failed`` evidence, but a warn-only row passes — it
    stays out of the violations sink, out of ``viol_rows`` / per-partition
    pass-fail / the fail-fast budget, and goes INTO the clean sink. With
    ``warn_checks=None`` (default) behavior is bit-identical to before.

    ``reference_hists={source: bin_counts}`` drifts against a CUSTOM
    reference instead of the built-in dimension (load a saved one with
    ``sources.dimensions.load_reference_histograms``). The report exposes
    ``observed_hists`` — save them with ``save_reference_histograms`` to
    make THIS corpus the reference for the next run, closing the
    corpus-evolution loop (CLI: ``--ref-hist`` / ``--export-hist``).

    ``use_actor_pool=False`` (default) runs the fused row checks as tasks on
    Ray's shared worker pool with a per-worker stage cache — measured faster
    than a dedicated actor pool because the stage state is tiny and actor
    startup dominated wave latency. Set True for stages whose state is
    genuinely expensive to rebuild per worker (big models, large indexes).

    ``batch_size=None`` processes whole read blocks zero-copy (no re-slice);
    the vectorized kernel is size-insensitive, and input fragments bound the
    block size. Set an explicit batch size only if fragments are huge.
    """
    files = input_fragments(input_path)
    if not files:
        raise FileNotFoundError(f"no parquet fragments under {input_path}")
    os.makedirs(out_dir, exist_ok=True)
    lin.clear_run_record(out_dir)
    # the out_dir must describe THIS corpus exactly: drop ghost state for
    # fragments removed/renamed since a prior run against the same out_dir
    # (resume + input fingerprints already cover modified/added fragments,
    # making a rerun a true incremental re-validation of an evolved corpus)
    lin.gc_stale_partitions(out_dir, files)
    allow = allowlist_rows if allowlist_rows is not None else SOURCE_ALLOWLIST
    # validate dimension + check-name config EAGERLY on the driver: a typo'd
    # check name or malformed allowlist fails here as a bare ValueError, not
    # minutes later wrapped in a RayTaskError from inside the first wave
    build_check_ctx(
        allow,
        enabled_checks=enabled_checks,
        schema_repair=schema_repair,
        warn_checks=warn_checks,
    )
    pool = concurrency if concurrency is not None else _default_pool()
    cfg_digest = _config_digest(
        allow, enabled_checks, warn_checks, schema_repair,
        write_violations, write_clean,
    )

    todo = []
    for f in files:
        if resume and lin.partition_complete(out_dir, f, config_digest=cfg_digest):
            continue
        lin.reset_partition(out_dir, lin.part_id_for(f))
        todo.append(f)

    # fail-fast budget: seed with violations already recorded for the
    # completed partitions a resume is keeping — the budget is a statement
    # about the corpus, not about this process's share of the work
    viol_so_far = 0
    parts_done = len(files) - len(todo)
    if fail_fast_violations is not None and parts_done:
        recs = lin.all_lineage(out_dir)
        todo_set = set(todo)  # hoisted: rebuilding this per file is O(n²)
        viol_so_far = sum(
            recs[pid]["viol_rows"]
            for pid in (lin.part_id_for(f) for f in files if f not in todo_set)
            if pid in recs
        )
        if viol_so_far > fail_fast_violations:
            raise FailFastExceeded(viol_so_far, fail_fast_violations, parts_done)

    prescreen_ref = None
    if prescreen and todo:
        from .tokens import _PRESCREEN_CHECKS, stats_prescreen_files

        t0 = time.time()
        scan = stats_prescreen_files(todo, allowlist_rows=allow)
        # keys normalized to absolute paths: Ray's include_paths yields
        # resolved paths, so a RELATIVE input_path would otherwise never
        # match and the footer scan would be paid for zero benefit
        proven_map = {
            os.path.abspath(p): frozenset(
                name[len("prove_") :]
                for name, flag in zip(_PRESCREEN_CHECKS, flags)
                if flag
            )
            for p, (_, flags) in scan.items()
        }
        proven_map = {p: s for p, s in proven_map.items() if s}
        prescreen_ref = ray.put(proven_map)
        _phase_log(f"stats prescreen ({len(proven_map)} provable fragments)", t0)

    for wave in _chunks(todo, max(1, wave_files)):
        t0 = time.time()
        ds = rd.read_parquet(wave, include_paths=True)
        stage_kwargs = {
            "allowlist_rows": allow,
            "out_dir": out_dir,
            "write_violations": write_violations,
            "enabled_checks": enabled_checks,
            "write_clean": write_clean,
            "schema_repair": schema_repair,
            "prescreen_ref": prescreen_ref,
            "warn_checks": warn_checks,
        }
        if use_actor_pool:
            staged = ds.map_batches(
                RowCheckStage,
                fn_constructor_kwargs=stage_kwargs,
                batch_format="pyarrow",
                batch_size=batch_size,
                concurrency=pool,
                num_cpus=1,
            )
        else:
            task_kwargs: dict[str, Any] = {}
            if concurrency is not None:
                # honor an explicit caller cap on the task path too (tasks
                # take a single max-concurrency int)
                task_kwargs["concurrency"] = (
                    concurrency[1] if isinstance(concurrency, tuple) else concurrency
                )
            staged = ds.map_batches(
                _row_check_task,
                fn_kwargs=stage_kwargs,
                batch_format="pyarrow",
                batch_size=batch_size,
                **task_kwargs,
            )
        partials = staged.take_all()
        _phase_log(f"rowcheck wave({len(wave)} files)", t0)
        t1 = time.time()
        wave_viol, wave_parts = _publish_wave(
            out_dir, wave, partials, time.time() - t0, config_digest=cfg_digest
        )
        lin.heartbeat(out_dir)
        _phase_log("publish wave", t1)
        if fail_fast_violations is not None:
            viol_so_far += wave_viol
            parts_done += wave_parts
            if viol_so_far > fail_fast_violations:
                raise FailFastExceeded(viol_so_far, fail_fast_violations, parts_done)

    t0 = time.time()
    report = _assemble_report(out_dir, files, reference_hists=reference_hists)
    _phase_log("assemble report", t0)
    if uniqueness:
        t0 = time.time()
        # hash-range tree reduce over a projected doc_id read (always covers
        # ALL files, so resume semantics are automatically global); see
        # state/dupfinder.py for why this beats a Dataset groupby here
        dups = dupfinder.find_duplicates(files)
        _phase_log("uniqueness reduce", t0)
        t0 = time.time()
        dup_rows = 0
        if write_violations:
            # the duplicate phase is GLOBAL and recomputed from scratch each
            # run, but its files live in per-partition dirs that resume
            # keeps — clear every dup-* sink first or a kept partition would
            # resurface duplicate rows that no longer exist in the corpus
            # (and re-runs with different block splits would accumulate
            # differently-digested dup files alongside the old ones)
            for p in glob.glob(
                os.path.join(lin.violations_dir(out_dir), "part=*", "dup-*.parquet")
            ):
                os.remove(p)
        if dups:
            dup_rows = materialize_duplicates(
                files, dups, out_dir, write_violations=write_violations
            )
        _phase_log("materialize duplicates", t0)
        report.duplicates = dups
        report.global_stats["dup_doc_ids"] = len(dups)
        report.global_stats["dup_rows"] = dup_rows
    lin.write_run_record(
        out_dir,
        {
            "engine_version": lin.ENGINE_VERSION,
            "input": input_path,
            "partitions": len(files),
            "rows": report.total_rows,
            "check_counts": report.check_counts(),
            "drift": report.drift,
            "global": {
                k: v for k, v in report.global_stats.items() if not isinstance(v, bytes)
            },
        },
    )
    return report


def _config_digest(
    allow: list[dict],
    enabled_checks: "list[str] | None",
    warn_checks: "list[str] | None",
    schema_repair: bool,
    write_violations: bool,
    write_clean: bool,
) -> str:
    """Stable digest of everything that shapes a partition's recorded
    verdicts and side outputs. Stamped into each lineage record and
    required to match on resume — so a rerun with a different check
    config / severity map / allowlist / sink set re-validates instead of
    silently mixing old-config partitions into the new run's report.
    (Prescreen is excluded: its proofs are sound, output bit-identical.)"""
    canon = json.dumps(
        {
            "allow": sorted(
                ({k: r[k] for k in sorted(r)} for r in allow),
                key=lambda r: str(r.get("source")),
            ),
            "enabled": sorted(enabled_checks) if enabled_checks is not None else None,
            "warn": sorted(warn_checks) if warn_checks else [],
            "schema_repair": bool(schema_repair),
            "write_violations": bool(write_violations),
            "write_clean": bool(write_clean),
        },
        sort_keys=True,
        default=str,
    )
    return hashlib.sha1(canon.encode()).hexdigest()


def _publish_wave(
    out_dir: str,
    wave: list[str],
    partials: list[dict],
    wall_s: float,
    config_digest: "str | None" = None,
) -> tuple[int, int]:
    """Publish lineage for every fully-covered partition of this wave;
    returns (published violation rows, published partitions) so the caller
    can enforce a fail-fast budget."""
    by_pid: dict[str, list[dict]] = {}
    for r in partials:
        by_pid.setdefault(lin.part_id_for(r["path"]), []).append(r)
    pub_viol = pub_parts = 0
    expected = {lin.part_id_for(f): (f, pq.read_metadata(f).num_rows) for f in wave}
    for pid, (fpath, file_rows) in expected.items():
        rows = by_pid.get(pid, [])
        processed = sum(r["rows"] for r in rows)
        if processed != file_rows:
            # incomplete coverage — do not publish lineage; rerun will redo it
            continue
        per_source: dict[str, dict] = {}
        # deterministic merge order for sketches (SURVEY.md §7.4)
        for r in sorted(rows, key=lambda r: (r["source"] or "", r["rows"], r["sum_n_tok"], r["td"])):
            s = r["source"] if r["source"] is not None else "\x00null"
            agg = per_source.setdefault(
                s,
                {
                    "rows": 0,
                    "ok_rows": 0,
                    "viol_rows": 0,
                    "check_counts": {n: 0 for n in ROW_CHECK_NAMES},
                    "hist": np.zeros(HIST_NUM_BINS + 1, dtype=np.int64),
                    "sum_n_tok": 0,
                    "min_n_tok": _SENTINEL_MIN,
                    "max_n_tok": -1,
                    "_td": TDigest(),
                    "_hll": HyperLogLog(),
                },
            )
            agg["rows"] += r["rows"]
            agg["ok_rows"] += r["ok_rows"]
            agg["viol_rows"] += r["viol_rows"]
            for n in ROW_CHECK_NAMES:
                agg["check_counts"][n] += r[f"c_{n}"]
            agg["hist"] += np.asarray(r["hist"], dtype=np.int64)
            agg["sum_n_tok"] += r["sum_n_tok"]
            agg["min_n_tok"] = min(agg["min_n_tok"], r["min_n_tok"])
            agg["max_n_tok"] = max(agg["max_n_tok"], r["max_n_tok"])
            agg["_td"].merge(TDigest.from_bytes(r["td"]))
            agg["_hll"].merge(HyperLogLog.from_bytes(r["hll"]))
        record = {
            "engine_version": lin.ENGINE_VERSION,
            "part_id": pid,
            "input_path": fpath,
            "input_fingerprint": lin.file_fingerprint(fpath),
            "file_rows": file_rows,
            "processed_rows": processed,
            "ok_rows": sum(a["ok_rows"] for a in per_source.values()),
            "viol_rows": sum(a["viol_rows"] for a in per_source.values()),
            "check_counts": {
                n: sum(a["check_counts"][n] for a in per_source.values())
                for n in ROW_CHECK_NAMES
            },
            "per_source": {
                s: {
                    "rows": a["rows"],
                    "ok_rows": a["ok_rows"],
                    "viol_rows": a["viol_rows"],
                    "check_counts": a["check_counts"],
                    "hist": a["hist"].tolist(),
                    "sum_n_tok": a["sum_n_tok"],
                    "min_n_tok": a["min_n_tok"],
                    "max_n_tok": a["max_n_tok"],
                    "td": lin.b64(a["_td"].to_bytes()),
                    "hll": lin.b64(a["_hll"].to_bytes()),
                }
                for s, a in per_source.items()
            },
            "wall_s": round(wall_s, 3),
            "config_digest": config_digest,
        }
        lin.write_lineage(out_dir, pid, record)
        pub_viol += record["viol_rows"]
        pub_parts += 1
    return pub_viol, pub_parts


def _assemble_report(
    out_dir: str,
    files: list[str],
    reference_hists: "dict[str, np.ndarray] | None" = None,
) -> ValidationReport:
    report = ValidationReport()
    records = lin.all_lineage(out_dir)
    expected_pids = {lin.part_id_for(f) for f in files}
    missing = expected_pids - set(records)
    if missing:
        raise RuntimeError(f"partitions incomplete after run: {sorted(missing)[:5]} ...")
    per_source: dict[str, dict] = {}
    g_td = TDigest()
    g_hll = HyperLogLog()
    for pid in sorted(expected_pids):
        rec = records[pid]
        report.partitions[pid] = {
            k: rec[k]
            for k in (
                "input_path",
                "file_rows",
                "processed_rows",
                "ok_rows",
                "viol_rows",
                "check_counts",
                "wall_s",
            )
        }
        report.partitions[pid]["pass"] = rec["viol_rows"] == 0
        for s, a in rec["per_source"].items():
            agg = per_source.setdefault(
                s,
                {
                    "rows": 0,
                    "viol_rows": 0,
                    "hist": np.zeros(HIST_NUM_BINS + 1, dtype=np.int64),
                    "sum_n_tok": 0,
                    "min_n_tok": _SENTINEL_MIN,
                    "max_n_tok": -1,
                    "_td": TDigest(),
                    "_hll": HyperLogLog(),
                },
            )
            agg["rows"] += a["rows"]
            agg["viol_rows"] += a["viol_rows"]
            agg["hist"] += np.asarray(a["hist"], dtype=np.int64)
            agg["sum_n_tok"] += a["sum_n_tok"]
            agg["min_n_tok"] = min(agg["min_n_tok"], a["min_n_tok"])
            agg["max_n_tok"] = max(agg["max_n_tok"], a["max_n_tok"])
            agg["_td"].merge(TDigest.from_bytes(lin.unb64(a["td"])))
            agg["_hll"].merge(HyperLogLog.from_bytes(lin.unb64(a["hll"])))
    for s, a in per_source.items():
        g_td.merge(TDigest.from_bytes(a["_td"].to_bytes()))
        g_hll.merge(HyperLogLog.from_bytes(a["_hll"].to_bytes()))
        report.per_source[s] = {
            "rows": a["rows"],
            "viol_rows": a["viol_rows"],
            "mean_n_tok": a["sum_n_tok"] / max(a["rows"], 1),
            "min_n_tok": None if a["min_n_tok"] == _SENTINEL_MIN else a["min_n_tok"],
            "max_n_tok": None if a["max_n_tok"] < 0 else a["max_n_tok"],
            "p50_n_tok": a["_td"].quantile(0.5),
            "p99_n_tok": a["_td"].quantile(0.99),
            "distinct_doc_est": a["_hll"].estimate(),
            "hist": a["hist"],
        }
    observed = {s: a["hist"] for s, a in per_source.items() if not s.startswith("\x00")}
    report.observed_hists = {s: np.asarray(h, dtype=np.int64) for s, h in observed.items()}
    report.drift = drift_verdicts(
        observed,
        reference_hists if reference_hists is not None else reference_histograms_dim(),
    )
    report.global_stats = {
        "rows": report.total_rows,
        "ok_rows": sum(p["ok_rows"] for p in report.partitions.values()),
        "viol_rows": sum(p["viol_rows"] for p in report.partitions.values()),
        "p50_n_tok": g_td.quantile(0.5),
        "p90_n_tok": g_td.quantile(0.9),
        "p99_n_tok": g_td.quantile(0.99),
        "distinct_doc_est": g_hll.estimate(),
        "sources_observed": sorted(s for s in per_source if not s.startswith("\x00")),
    }
    return report


# ---------------------------------------------------------------------------
# Uniqueness phase (SURVEY.md §7.2 step 5)
# ---------------------------------------------------------------------------


def plan_duplicate_doc_ids(files: list[str]) -> rd.Dataset:
    """Build (lazily) the global doc_id duplicate-detection plan.

    Projected read (doc_id only) → per-batch value_counts combiner →
    groupby(doc_id) sum of (doc_id, n) pairs → dups = n > 1. The shuffle
    never carries token payloads.

    Planning happens on the caller's thread (Ray's read planning resolves
    filesystems via lazy imports that are not thread-safe to race); only
    execution may run concurrently with other pipelines.
    """
    ds = rd.read_parquet(files, columns=["doc_id"])

    from ..core.batches import doc_id_partial_counts as partial_counts

    agg = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("doc_id")
        .sum("n")
    )
    return agg.map_batches(
        lambda t: t.filter(pc.greater(t.column("sum(n)"), 1)),
        batch_format="pyarrow",
    )


def execute_duplicate_doc_ids(dup: rd.Dataset) -> dict[str, int]:
    out: dict[str, int] = {}
    for b in dup.iter_batches(batch_format="pyarrow"):
        for d, n in zip(b.column("doc_id").to_pylist(), b.column("sum(n)").to_pylist()):
            out[d] = int(n)
    return out


def find_duplicate_doc_ids(files: list[str]) -> dict[str, int]:
    """Global doc_id duplicate detection; returns {doc_id: total_count}."""
    return execute_duplicate_doc_ids(plan_duplicate_doc_ids(files))


def materialize_duplicates(
    files: list[str],
    dups: dict[str, int],
    out_dir: str,
    *,
    write_violations: bool = True,
    pushdown_limit: int = 0,
) -> int:
    """Materialize the original rows of duplicated doc_ids as violation rows.

    The dup-id set is broadcast once via ``ray.put`` and filtered inside
    ``map_batches`` (broadcast semi-join — never a row shuffle). A row-group
    statistics pushdown (``pushdown_limit`` > 0) only pays off when doc_ids
    are clustered/sorted within files so whole row groups can be skipped;
    for uniformly distributed ids the scanner-side isin is measurably slower
    than the broadcast filter, so it is off by default.
    Rows keep their input columns byte-identical (token-array invariant)
    modulo the same declared-schema cast the rc- sink applies
    (``conform_schema``) — so every file under ``violations/`` shares ONE
    schema and ``violations_dataset()`` always reads.
    """
    if not write_violations:
        # no rows to materialize — the exact counts are already known
        return int(sum(dups.values()))
    dup_ids = sorted(dups)
    use_pushdown = 0 < len(dup_ids) <= pushdown_limit
    read_kwargs: dict[str, Any] = {"include_paths": True}
    if use_pushdown:
        read_kwargs["filter"] = pc.field("doc_id").isin(dup_ids)
    ds = rd.read_parquet(files, **read_kwargs)
    # the prepared Arrow value_set is broadcast once (ray.put); each task
    # fetches it a single time in its closure scope — NOT rebuilt per batch
    dup_ref = ray.put(pa.array(dup_ids, type=pa.string()))
    _set_cache: dict[str, pa.Array] = {}

    def mark(batch: pa.Table) -> pa.Table:
        key = dup_ref.hex()
        value_set = _set_cache.get(key)
        if value_set is None:
            _set_cache.clear()
            value_set = _set_cache[key] = ray.get(dup_ref)
        mask = pc.is_in(batch.column("doc_id"), value_set=value_set)
        sel = batch.filter(pc.fill_null(mask, False))
        if sel.num_rows == 0:
            return pa.Table.from_pylist([], schema=pa.schema([("part_id", pa.string()), ("n", pa.int64())]))
        out_rows = []
        for path in pc.unique(sel.column("path")).to_pylist():
            g = sel.filter(pc.equal(sel.column("path"), path))
            pid = lin.part_id_for(path)
            # conform like the rc- sink: without the cast, a corpus stored
            # with (say) int64 n_tok would mix schemas inside violations/
            # and make violations_dataset() unreadable
            t = conform_schema(g.drop_columns(["path"]))
            n = t.num_rows
            t = t.append_column("ok", pa.array([False] * n))
            t = t.append_column(
                "checks_failed",
                pa.array([["dup_doc_id"]] * n, type=pa.list_(pa.string())),
            )
            if write_violations:
                d = lin.violations_dir(out_dir, pid)
                os.makedirs(d, exist_ok=True)
                pq.write_table(
                    t, os.path.join(d, f"dup-{_table_digest(pid, t)}.parquet")
                )
            out_rows.append({"part_id": pid, "n": n})
        return pa.Table.from_pylist(
            out_rows, schema=pa.schema([("part_id", pa.string()), ("n", pa.int64())])
        )

    marked = ds.map_batches(mark, batch_format="pyarrow").take_all()
    return int(sum(r["n"] for r in marked))


def violations_dataset(out_dir: str) -> "rd.Dataset | None":
    """All materialized violation rows (row checks + duplicates) as a Dataset."""
    files = sorted(glob.glob(os.path.join(lin.violations_dir(out_dir), "part=*", "*.parquet")))
    if not files:
        return None
    return rd.read_parquet(files)


def clean_dataset(out_dir: str) -> "rd.Dataset | None":
    """The validated corpus (rows passing every row check, original columns)
    written by ``run_validation(..., write_clean=True)`` — partitioned per
    input fragment, so downstream consumers inherit the resume layout."""
    files = sorted(glob.glob(os.path.join(lin.clean_dir(out_dir), "part=*", "*.parquet")))
    if not files:
        return None
    ds = rd.read_parquet(files)
    # the hive-style part=<pid> layout makes Ray infer a 'part' column —
    # drop it so consumers see exactly the input schema
    if "part" in ds.schema().names:
        ds = ds.drop_columns(["part"])
    return ds

"""Cross-round bench comparison: aligned per-pipeline walls with deltas.

Usage: python tools/bench_compare.py BENCH_r01.json BENCH_r02.json [...]

Reads each round's driver bench record (or any bench.py output line) and
prints one row per pipeline with the wall from every file plus the delta
between the last two — the r{N-1}-vs-r{N} table VERDICT builds by hand.
Prefers ``isolated_queries`` when present (BASELINE.md documents up to 2×
in-suite noise on this box; isolated walls are the comparable ones) and
says which kind each column is.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> tuple[str, dict]:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]  # driver BENCH_r{N}.json wraps bench.py's line
    if "isolated_queries" in d:
        return "isolated", d["isolated_queries"]
    return "suite", d.get("queries", {})


def main() -> int:
    paths = sys.argv[1:]
    if len(paths) < 2:
        print(__doc__)
        return 2
    cols = [(p, *load(p)) for p in paths]
    names: list[str] = []
    seen = set()
    for _, _, q in cols:
        for k in q:
            if k not in seen:
                seen.add(k)
                names.append(k)
    w = max(len(n) for n in names) + 2
    header = "pipeline".ljust(w) + "".join(
        f"{p.split('/')[-1]}({kind})".rjust(24) for p, kind, _ in cols
    ) + "      delta"
    print(header)
    print("-" * len(header))
    prev, last = cols[-2][2], cols[-1][2]
    for n in names:
        row = n.ljust(w)
        for _, _, q in cols:
            row += (f"{q[n]:.2f}s" if n in q else "—").rjust(24)
        if n in prev and n in last and prev[n] > 0:
            pct = (last[n] - prev[n]) / prev[n] * 100
            row += f"{pct:+10.0f}%"
        print(row)
    both = [n for n in names if n in prev and n in last]
    if both:
        tp = sum(prev[n] for n in both)
        tl = sum(last[n] for n in both)
        print("-" * len(header))
        print(
            f"shared pipelines: {len(both)}  total {tp:.1f}s -> {tl:.1f}s "
            f"({(tl - tp) / tp * 100:+.0f}%)"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

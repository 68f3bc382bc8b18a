"""Per-source distribution-drift checks (chi-square + KS) over n_tok
histograms.

Reference analog: threshold-gated distributional screens (fuzzy-threshold
sliders gating match acceptance, ``app.py:453-460``; NPM bucketed scoring
tables, ``prompts/hfss.py:51-107``). The engine compares each source's
*observed* n_tok histogram (merged from per-partition partials — no row
shuffle, SURVEY.md §7.3) against the `reference_histograms` dimension
(FIXTURES.md §4).

No scipy in the sandbox, so critical values use the Wilson–Hilferty
chi-square approximation and the asymptotic two-sample KS threshold — both
textbook-public formulas. Verdicts depend only on exact integer histograms →
identical across parallelism levels (SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np

# z for 99.9% one-sided normal quantile; drift alarms should be rare enough
# that a whole-source shift (the injected +40% mean) fires but sampling noise
# at bench scale does not.
_Z_999 = 3.0902
_KS_ALPHA_C = 1.949  # c(alpha) for alpha=0.001 in the two-sample KS bound

# Minimum-effect floor: at corpus scale (tested at 25.6M rows) pure
# significance tests flag EVERY source — they detect the reference sample's
# own ~1/sqrt(m) noise, not real drift. A drift verdict therefore requires
# statistical significance AND a material KS distance. The injected +40%
# mean shift produces KS ≈ 0.15; same-distribution sampling noise stays
# < 0.005 at every scale tested.
KS_MIN_EFFECT = 0.01


def chi2_critical(df: int, z: float = _Z_999) -> float:
    """Wilson–Hilferty approximation to the chi-square quantile."""
    if df <= 0:
        return 0.0
    a = 2.0 / (9.0 * df)
    return df * (1.0 - a + z * np.sqrt(a)) ** 3


def chi2_stat(observed: np.ndarray, expected_probs: np.ndarray) -> tuple[float, int]:
    """Pearson chi-square of observed counts vs expected probabilities.

    Bins with expected count < 5 are pooled into their neighbor (standard
    practice) to keep the statistic stable; returns (stat, dof).
    """
    n = observed.sum()
    if n == 0:
        return 0.0, 0
    exp = expected_probs * n
    # pool tiny-expectation bins left-to-right, accumulating each pool's
    # chi-square term AS THE POOL CLOSES — the same float-op order as the
    # SQL oracle's recursive CTE (drift_oracle_sql), so parity is
    # structural rather than sum-order luck
    npools = 0
    stat = 0.0
    last_o = last_e = 0.0  # last closed pool, for the tail-merge case
    acc_o = acc_e = 0.0
    for o, e in zip(observed, exp):
        acc_o += o
        acc_e += e
        if acc_e >= 5.0:
            stat += (acc_o - acc_e) * (acc_o - acc_e) / acc_e
            npools += 1
            last_o, last_e = acc_o, acc_e
            acc_o = acc_e = 0.0
    if npools and acc_o > 0:
        # observed mass left in (near-)zero-expectation tail bins is the
        # strongest drift evidence: give it its OWN bin with a half-count
        # expectation floor so the statistic registers it instead of
        # diluting it into the last pooled bin
        e_tail = max(acc_e, 0.5)
        stat += (acc_o - e_tail) * (acc_o - e_tail) / e_tail
        npools += 1
    elif npools and acc_e > 0:
        # merge the remainder into the last closed pool: replace its term
        stat -= (last_o - last_e) * (last_o - last_e) / last_e
        mo, me = last_o + acc_o, last_e + acc_e
        stat += (mo - me) * (mo - me) / me
    if npools < 2:
        return 0.0, 0
    return stat, npools - 1


def ks_stat_binned(observed: np.ndarray, expected_probs: np.ndarray) -> float:
    """KS distance between the binned observed CDF and the expected CDF."""
    n = observed.sum()
    if n == 0:
        return 0.0
    cdf_o = np.cumsum(observed) / n
    cdf_e = np.cumsum(expected_probs)
    return float(np.abs(cdf_o - cdf_e).max())


def ks_threshold(n: int, m: int, c: float = _KS_ALPHA_C) -> float:
    if n == 0 or m == 0:
        return 1.0
    return c * np.sqrt((n + m) / (n * m))


def drift_verdicts(
    observed: dict[str, np.ndarray], reference: dict[str, np.ndarray]
) -> dict[str, dict]:
    """Per-source drift verdict from exact merged histograms.

    Returns {source: {rows, chi2, chi2_crit, ks, ks_thresh, drifted}}.
    Sources absent from the reference dimension are skipped (they are already
    flagged by the referential check).
    """
    out: dict[str, dict] = {}
    for src, ref_counts in reference.items():
        obs = observed.get(src)
        if obs is None:
            obs = np.zeros_like(ref_counts)
        ref_n = ref_counts.sum()
        probs = ref_counts / max(ref_n, 1)
        stat, dof = chi2_stat(obs.astype(np.float64), probs)
        crit = chi2_critical(dof)
        ks = ks_stat_binned(obs.astype(np.float64), probs)
        ks_t = ks_threshold(int(obs.sum()), int(ref_n))
        out[src] = {
            "rows": int(obs.sum()),
            "chi2": round(stat, 4),
            "chi2_crit": round(float(crit), 4),
            "ks": round(ks, 6),
            "ks_thresh": round(float(ks_t), 6),
            "drifted": bool(
                obs.sum() > 0
                and (stat > crit or ks > ks_t)
                and ks >= KS_MIN_EFFECT
            ),
        }
    return out


def drift_oracle_sql(seq_glob: str) -> str:
    """DuckDB oracle for ``seq_drift_verdicts``: the full verdict math —
    histogram build, chi-square with sequential 5-count bin pooling (as a
    recursive CTE, mirroring ``chi2_stat``'s accumulate-and-reset loop
    including both tail cases), binned-CDF KS, Wilson–Hilferty critical
    value, asymptotic KS threshold, and the minimum-effect floor — in SQL.

    The reference histogram is an input *dimension* (datagen-deterministic,
    FIXTURES.md §4), embedded as literal VALUES the same way the allowlist
    is embedded in the row-check oracles. Float parity: verified EXACT
    (bit-equal after rounding) against the engine on the sf0.01 corpus;
    the engine's Python ``round`` is banker's vs DuckDB's half-away, but
    the statistics sit ~1e-12 from any rounding boundary on this fixture.
    """
    from ..core.schema import HIST_BIN_WIDTH, HIST_NUM_BINS
    from ..datagen import reference_histograms

    ref = reference_histograms()
    ref_values = ",".join(
        f"('{src}',{b},{int(c)})"
        for src, counts in sorted(ref.items())
        for b, c in enumerate(counts)
        if c > 0
    )
    srcs = ",".join(f"'{s}'" for s in sorted(ref))
    nb = HIST_NUM_BINS  # overflow bin index; the grid covers bins 0..nb
    crit = (
        f"CASE WHEN dof <= 0 THEN 0.0 ELSE dof * pow(1.0 - 2.0/(9.0*dof) "
        f"+ {_Z_999} * sqrt(2.0/(9.0*dof)), 3) END"
    )
    ks_t = f"CASE WHEN n = 0 OR m = 0 THEN 1.0 ELSE {_KS_ALPHA_C} * sqrt((n + m) / (n * m)) END"
    return f"""
WITH RECURSIVE
ref(source, bin, ref_n) AS (VALUES {ref_values}),
ref_tot AS (SELECT source, sum(ref_n)::DOUBLE AS m FROM ref GROUP BY source),
obs AS (
  SELECT source, least(n_tok // {HIST_BIN_WIDTH}, {nb}) AS bin, count(*)::DOUBLE AS o
  FROM read_parquet('{seq_glob}')
  WHERE source IN ({srcs}) AND n_tok IS NOT NULL AND n_tok >= 0
  GROUP BY 1, 2
),
grid AS (
  SELECT s.source, g.bin,
         coalesce(o.o, 0.0) AS o,
         coalesce(r.ref_n, 0) / t.m AS p
  FROM (SELECT DISTINCT source FROM ref) s
  CROSS JOIN (SELECT unnest(range({nb + 1})) AS bin) g
  LEFT JOIN obs o ON o.source = s.source AND o.bin = g.bin
  LEFT JOIN ref r ON r.source = s.source AND r.bin = g.bin
  JOIN ref_tot t ON t.source = s.source
),
n_src AS (SELECT source, sum(o) AS n FROM grid GROUP BY source),
grid2 AS (
  SELECT g.source, g.bin, g.o, g.p, g.p * n.n AS e, n.n
  FROM grid g JOIN n_src n ON n.source = g.source
),
ks AS (
  SELECT source,
         CASE WHEN any_value(n) = 0 THEN 0.0
              ELSE max(abs(cum_o / n - cum_p)) END AS ks
  FROM (
    SELECT source, n,
           sum(o) OVER (PARTITION BY source ORDER BY bin) AS cum_o,
           sum(p) OVER (PARTITION BY source ORDER BY bin) AS cum_p
    FROM grid2
  ) GROUP BY source
),
chi(source, i, acc_o, acc_e, npools, chi2, lo, le) AS (
  SELECT source, -1, 0.0::DOUBLE, 0.0::DOUBLE, 0, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE
  FROM (SELECT DISTINCT source FROM ref)
  UNION ALL
  SELECT c.source, c.i + 1,
    CASE WHEN c.acc_e + g.e >= 5.0 THEN 0.0 ELSE c.acc_o + g.o END,
    CASE WHEN c.acc_e + g.e >= 5.0 THEN 0.0 ELSE c.acc_e + g.e END,
    c.npools + CASE WHEN c.acc_e + g.e >= 5.0 THEN 1 ELSE 0 END,
    c.chi2 + CASE WHEN c.acc_e + g.e >= 5.0
                  THEN (c.acc_o + g.o - (c.acc_e + g.e)) * (c.acc_o + g.o - (c.acc_e + g.e)) / (c.acc_e + g.e)
                  ELSE 0.0 END,
    CASE WHEN c.acc_e + g.e >= 5.0 THEN c.acc_o + g.o ELSE c.lo END,
    CASE WHEN c.acc_e + g.e >= 5.0 THEN c.acc_e + g.e ELSE c.le END
  FROM chi c JOIN grid2 g ON g.source = c.source AND g.bin = c.i + 1
  WHERE c.i < {nb}
),
fin AS (SELECT * FROM chi WHERE i = {nb}),
chi2f AS (
  SELECT f.source,
    CASE WHEN n.n = 0 THEN 0
         WHEN f.npools > 0 AND f.acc_o > 0 THEN f.npools + 1
         ELSE f.npools END AS npools,
    CASE WHEN n.n = 0 THEN 0.0
         WHEN f.npools > 0 AND f.acc_o > 0
           THEN f.chi2 + (f.acc_o - greatest(f.acc_e, 0.5)) * (f.acc_o - greatest(f.acc_e, 0.5)) / greatest(f.acc_e, 0.5)
         WHEN f.npools > 0 AND f.acc_e > 0
           THEN f.chi2 - (f.lo - f.le) * (f.lo - f.le) / f.le
                + ((f.lo + f.acc_o) - (f.le + f.acc_e)) * ((f.lo + f.acc_o) - (f.le + f.acc_e)) / (f.le + f.acc_e)
         ELSE f.chi2 END AS chi2
  FROM fin f JOIN n_src n ON n.source = f.source
),
verd AS (
  SELECT c.source,
    CASE WHEN c.npools < 2 THEN 0.0 ELSE c.chi2 END AS stat,
    CASE WHEN c.npools < 2 THEN 0 ELSE c.npools - 1 END AS dof,
    k.ks, n.n, t.m
  FROM chi2f c JOIN ks k ON k.source = c.source
  JOIN n_src n ON n.source = c.source JOIN ref_tot t ON t.source = c.source
)
SELECT source,
  n::BIGINT AS rows,
  round(stat, 4) AS chi2,
  round({crit}, 4) AS chi2_crit,
  round(ks, 6) AS ks,
  round({ks_t}, 6) AS ks_thresh,
  (n > 0 AND (stat > ({crit}) OR ks > ({ks_t})) AND ks >= {KS_MIN_EFFECT}) AS drifted
FROM verd
ORDER BY source
"""

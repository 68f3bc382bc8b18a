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
    # pool tiny-expectation bins left-to-right
    obs_p: list[float] = []
    exp_p: list[float] = []
    acc_o = acc_e = 0.0
    for o, e in zip(observed, exp):
        acc_o += o
        acc_e += e
        if acc_e >= 5.0:
            obs_p.append(acc_o)
            exp_p.append(acc_e)
            acc_o = acc_e = 0.0
    if exp_p and acc_o > 0:
        # observed mass left in (near-)zero-expectation tail bins is the
        # strongest drift evidence: give it its OWN bin with a half-count
        # expectation floor so the statistic registers it instead of
        # diluting it into the last pooled bin
        obs_p.append(acc_o)
        exp_p.append(max(acc_e, 0.5))
    elif exp_p and acc_e > 0:
        obs_p[-1] += acc_o
        exp_p[-1] += acc_e
    if len(exp_p) < 2:
        return 0.0, 0
    o = np.asarray(obs_p)
    e = np.asarray(exp_p)
    stat = float(((o - e) ** 2 / e).sum())
    return stat, len(exp_p) - 1


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

"""Single-process pure-pandas differential oracle (FIXTURES.md §5).

Mirrors the reference's per-row ``iterrows`` semantics (``app.py:986-1448``)
and its bulk-vs-single differential pair (``banningredients.py:283-358`` vs
``:146-276``): the same checks as the Ray engine, written in the most naive
possible way. This is the executable spec — keep it brutally simple and
audited (SURVEY.md §7.4). Used only in tests on small inputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..core.schema import SOURCE_ALLOWLIST, VOCAB


def oracle_row_checks(df: pd.DataFrame, vocab: int = VOCAB) -> pd.DataFrame:
    """df columns: doc_id (object), tokens (object: list/ndarray), n_tok,
    source. Returns one bool column per check + ok, row-aligned."""
    allowed = {r["source"] for r in SOURCE_ALLOWLIST}
    caps = {r["source"]: r["max_n_tok"] for r in SOURCE_ALLOWLIST}
    out = {
        "null_doc_id": [],
        "null_tokens": [],
        "ntok_mismatch": [],
        "token_oov": [],
        "token_neg": [],
        "bad_source": [],
        "ntok_range": [],
    }
    for _, row in df.iterrows():  # intentionally per-row (the reference's shape)
        doc_id, tokens, n_tok, source = (
            row["doc_id"],
            row["tokens"],
            row["n_tok"],
            row["source"],
        )
        tokens_null = tokens is None or (isinstance(tokens, float) and pd.isna(tokens))
        toks = [] if tokens_null else list(tokens)
        n_tok_null = n_tok is None or pd.isna(n_tok)
        out["null_doc_id"].append(doc_id is None or (isinstance(doc_id, float) and pd.isna(doc_id)))
        out["null_tokens"].append(tokens_null)
        out["ntok_mismatch"].append(
            (not tokens_null) and (n_tok_null or len(toks) != int(n_tok))
        )
        out["token_oov"].append(any(t >= vocab for t in toks))
        out["token_neg"].append(any(t < 0 for t in toks))
        out["bad_source"].append(source not in allowed)
        if n_tok_null:
            out["ntok_range"].append(True)
        else:
            cap = caps.get(source, 2048)
            out["ntok_range"].append(int(n_tok) < 1 or int(n_tok) > cap)
    res = pd.DataFrame(out, index=df.index)
    res["ok"] = ~res.any(axis=1)
    return res


def oracle_duplicates(df: pd.DataFrame) -> dict[str, int]:
    ids = df["doc_id"].dropna()
    vc = ids.value_counts()
    return {k: int(v) for k, v in vc[vc > 1].items()}


def oracle_source_hist(
    df: pd.DataFrame, bin_width: int, num_bins: int
) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for src, g in df.groupby("source"):
        nt = g["n_tok"].dropna().astype(int).to_numpy()
        nt = nt[nt >= 0]
        out[src] = np.bincount(
            np.minimum(nt // bin_width, num_bins), minlength=num_bins + 1
        ).astype(np.int64)
    return out

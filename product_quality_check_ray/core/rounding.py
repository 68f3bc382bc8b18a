"""Rounding that matches DuckDB's ROUND on DOUBLE (half away from zero).

numpy/pandas ``round`` is banker's (half-to-even); DuckDB rounds half away
from zero via the scaled-floor construction below. Oracle-compared pipelines
must use this helper for every emitted float so both engines produce
bit-identical values (verified against DuckDB 1.0 on boundary cases
including round(1.005, 2) == 1.0 and round(2.675, 2) == 2.68).
"""

from __future__ import annotations

import numpy as np


def round_half_away(x, decimals: int):
    """Element-wise round-half-away-from-zero, DuckDB-compatible."""
    a = np.asarray(x, dtype=np.float64)
    scale = 10.0**decimals
    return np.copysign(np.floor(np.abs(a) * scale + 0.5), a) / scale

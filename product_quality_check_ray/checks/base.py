"""Check protocol + registry.

Reference analog: the ``PROMPT_OPTIONS`` registry of 44 named checks
(``prompts/prompts.py:4``) with per-check parameters (sliders,
``app.py:453-505``) and pipeline composition ("Run ALL", ``app.py:607-679``).
Here a check is a named, parameterized, *vectorized* predicate over an Arrow
batch; row-level checks are fused into one zero-copy ``map_batches`` pass by
the pipeline, and global checks (uniqueness, drift) declare their own stages.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np
import pyarrow as pa


@dataclass(frozen=True)
class RowCheck:
    """A vectorized per-row check: batch → boolean violation mask (ndarray).

    ``fn(batch, ctx) -> np.ndarray[bool]`` must be stateless and deterministic
    (SURVEY.md §4.2: Ray task retries must preserve the per-row invariant).
    ``ctx`` carries broadcast dimension state built once per worker.
    """

    name: str
    required_columns: tuple[str, ...]
    fn: Callable[[pa.Table, dict], np.ndarray]
    params: dict = field(default_factory=dict)


ROW_CHECK_REGISTRY: dict[str, RowCheck] = {}


def register(check: RowCheck) -> RowCheck:
    ROW_CHECK_REGISTRY[check.name] = check
    return check

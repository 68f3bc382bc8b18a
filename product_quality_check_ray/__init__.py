"""product_quality_check_ray — a Ray-Data-native schema + constraint
validation engine for pre-tokenized training-sequence Parquet tables.

Built from scratch per SURVEY.md: the *semantics* (candidate → adjudicate →
verdict → violation-rows dataflow, dictionary semi-joins, best-per-group
reduces, per-row pass/fail + evidence output, durability/resume) come from the
reference repo NathanShenton/product-quality-check; the *architecture* is
idiomatic Ray Data — streaming ``map_batches`` over zero-copy Arrow batches,
actor pools for stateful stages, partial-aggregation-before-groupby shuffles,
partition-addressed resumable output.

Primary input table (BASELINE.json input_hint)::

    doc_id: string, tokens: list<int32>, n_tok: int32, source: string

Nothing in this package calls ``ray.init()``/``ray.shutdown()``; sessions are
owned by ``bench.py``, CLI entry points, and the test fixture.
"""

__version__ = "0.1.0"

"""seq_source_entropy: planted direct-path corpus pinning the edge cases
(NULL source group, NULL token lists, NULL elements → oov sentinel, OOV ids,
top-token tie → smallest id, all-oov source) plus a closed-form entropy check."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from product_quality_check_ray.core.rounding import round_half_away as _rha
from product_quality_check_ray.core.schema import VOCAB
from product_quality_check_ray.pipelines.tokens import seq_source_entropy


def _write(tmp_path, rows):
    t = pa.table(
        {
            "doc_id": [r[0] for r in rows],
            "tokens": pa.array([r[2] for r in rows], type=pa.list_(pa.int32())),
            "n_tok": pa.array(
                [len(r[2]) if r[2] is not None else None for r in rows], type=pa.int32()
            ),
            "source": [r[1] for r in rows],
        }
    )
    d = tmp_path / "corpus"
    d.mkdir()
    pq.write_table(t, d / "frag-000.parquet")
    return str(d)


def test_entropy_edges(tmp_path, ray_session):
    rows = [
        # 'a': tokens 5×3, 7×3 (tie at count 3 → top_token must be 5),
        # plus one OOV (VOCAB) and one null element (oov sentinel)
        ("a1", "a", [5, 5, 7, VOCAB]),
        ("a2", "a", [5, 7, 7, None]),
        # NULL source: uniform over {1,2} → exactly 1 bit/tok
        ("n1", None, [1, 2, 1, 2]),
        # null token LIST contributes nothing anywhere
        ("a3", "a", None),
        # all-oov source: n_tokens 0, no entropy
        ("z1", "z", [-3, VOCAB + 9]),
    ]
    out = seq_source_entropy(_write(tmp_path, rows)).to_pandas()
    by = {(r.source if isinstance(r.source, str) else None): r for r in out.itertuples()}
    assert set(by) == {"a", None, "z"}

    a = by["a"]
    assert (a.n_tokens, a.n_oov, a.distinct_tokens) == (6, 2, 2)
    assert (a.top_token, a.top_count) == (5, 3)
    mb = int(_rha(np.array([-np.log2(3 / 6) * 1000]), 0)[0])  # both values c=3
    assert a.total_millibits == 6 * mb
    assert a.bits_per_tok == float(_rha(np.array([6 * mb / 6000.0]), 6)[0])

    n = by[None]
    assert (n.n_tokens, n.n_oov, n.distinct_tokens) == (4, 0, 2)
    assert n.total_millibits == 4000 and n.bits_per_tok == 1.0

    z = by["z"]
    assert (z.n_tokens, z.n_oov, z.distinct_tokens) == (0, 2, 0)
    assert z.total_millibits == 0
    assert np.isnan(z.bits_per_tok) and np.isnan(z.top_token)

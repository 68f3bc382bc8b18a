"""Exact-parity tests for the round-2 SQL oracles (drift, adjudication) at
sf0.001 — a DIFFERENT scale from the driver's sf0.01 gate, so the oracle SQL
is exercised on a second fixture (guards against constants accidentally
tuned to one corpus)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def seq_glob(ray_session):
    from product_quality_check_ray.datagen import ensure_sequences, sequences_glob

    ensure_sequences(SF)
    return sequences_glob(SF)


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort", na_position="first").reset_index(
        drop=True
    )


def _assert_frames_exact(mine: pd.DataFrame, oracle: pd.DataFrame):
    a, b = _sorted(mine), _sorted(oracle)
    assert len(a) == len(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if a[c].dtype.kind == "f":
            ok = (av == bv) | (pd.isna(av) & pd.isna(bv))
        else:
            ok = pd.Series(av).astype(str).to_numpy() == pd.Series(bv).astype(str).to_numpy()
        assert ok.all(), (c, av[~ok][:3], bv[~ok][:3])


def test_drift_oracle_sql_exact_parity(seq_glob):
    from product_quality_check_ray.checks.drift import drift_oracle_sql
    from product_quality_check_ray.pipelines.seq_queries import seq_drift_verdicts

    mine = seq_drift_verdicts(SF).to_pandas()
    con = duckdb.connect()
    oracle = con.sql(drift_oracle_sql(seq_glob)).df()
    assert list(np.sort(mine["source"].unique())) == list(np.sort(oracle["source"].unique()))
    _assert_frames_exact(mine, oracle)
    # the fixture injects drift into exactly one source
    assert mine.loc[mine["drifted"], "source"].tolist() == ["forums"]


def test_adjudicated_oracle_sql_exact_parity(seq_glob):
    import __ray_entry__ as e

    mine = e.queries()["seq_adjudicated"](SF).to_pandas()
    sql = e.oracle_sql()["seq_adjudicated"].replace("sf0.01", "sf0.001")
    con = duckdb.connect()
    oracle = con.sql(sql).df()
    _assert_frames_exact(mine, oracle)
    # severity split is non-trivial on the fixture
    assert set(mine["severity"].unique()) == {"severe", "minor"}

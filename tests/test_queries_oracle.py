"""Every registered query vs its DuckDB oracle at sf0.001 (driver replica)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from batch_pipeline_via_lakehouse_spark.plans.queries import ORACLES, QUERIES
from oracle_harness import compare

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    ok, msg = compare(df, ORACLES[name], SF_DIR)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert df.schema.fieldNames()


def test_entry_smoke(spark):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"source", "n_docs", "n_tokens", "content_hash"}
    # queries()/oracle_sql() contract: every oracle key is a query key
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 25


def test_ema_features_match_pandas(spark):
    """ema/rsi (no SQL oracle) vs a driver-side pandas groupby oracle."""
    import pandas as pd

    from batch_pipeline_via_lakehouse_spark.plans.features import _ema_fn

    got = (
        QUERIES["ema_features"](spark, SF_DIR)
        .toPandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    src = pd.read_parquet(f"{SF_DIR}/events.parquet")
    exp = (
        src.groupby("user_id", group_keys=False)[src.columns.tolist()]
        .apply(_ema_fn)
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)[got.columns.tolist()]
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=1e-9)

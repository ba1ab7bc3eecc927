"""The bucketed grouped-map kernel must be float-identical, per user, to the
reference per-user kernel (_feature_fn) it replaces — including the edge
cases: prev==0 (inf masked to NA), single-row users, and duplicate
timestamps broken by event_id."""

import numpy as np
import pandas as pd
import pytest

from batch_pipeline_via_lakehouse_spark.plans.features import (
    _ema_bucket_fn,
    _ema_fn,
    _feature_bucket_fn,
    _feature_fn,
)


def _mixed_frame(seed: int = 7, n_users: int = 40, rows: int = 2000) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    user = rng.integers(0, n_users, rows)
    value = np.round(rng.normal(50, 20, rows), 2)
    value[rng.random(rows) < 0.03] = 0.0  # prev==0 cases downstream
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(rows, dtype=np.int64),
            "user_id": user.astype(np.int64),
            "ts": rng.integers(0, 500, rows).astype(np.int64),  # many duplicate ts
            "value": value,
        }
    )
    # a single-row user and a two-row user
    extra = pd.DataFrame(
        {
            "event_id": [rows, rows + 1, rows + 2],
            "user_id": [n_users + 1, n_users + 2, n_users + 2],
            "ts": [1, 1, 2],
            "value": [3.5, 0.0, 7.25],
        }
    )
    return pd.concat([pdf, extra], ignore_index=True)


def test_bucket_kernel_matches_per_user_kernel():
    pdf = _mixed_frame()
    ref = (
        pdf.groupby("user_id", group_keys=False)
        .apply(_feature_fn)
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    got = (
        _feature_bucket_fn(pdf)
        .sort_values("event_id")
        .reset_index(drop=True)[ref.columns]
    )
    pd.testing.assert_frame_equal(ref, got)


def test_bucket_kernel_rolling_sum_exact_at_large_magnitudes():
    # integer-cents prefix sums stay exact below 2^53: values near 1e7 with
    # 1e5 rows keep csum < 1e14 << 9e15, so the cumsum-difference rolling
    # sum must still equal the windowed sum bit-for-bit
    rng = np.random.default_rng(11)
    rows = 20_000
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(rows, dtype=np.int64),
            "user_id": rng.integers(0, 5, rows).astype(np.int64),
            "ts": np.arange(rows, dtype=np.int64),
            "value": np.round(rng.uniform(1e6, 1e7, rows), 2),
        }
    )
    ref = (
        pdf.groupby("user_id", group_keys=False)
        .apply(_feature_fn)
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    got = (
        _feature_bucket_fn(pdf)
        .sort_values("event_id")
        .reset_index(drop=True)[ref.columns]
    )
    pd.testing.assert_frame_equal(ref, got)


def test_ema_bucket_kernel_matches_per_user_kernel():
    # groupby.ewm / groupby.rolling run the SAME Cython kernels as the
    # per-user Series calls, so the recurrences must be bit-identical —
    # including warmup NaNs (rn < 15), loss==0 -> inf -> RSI 100 limit,
    # and single-row users (ema == value, rsi NA)
    pdf = _mixed_frame(seed=5)
    ref = (
        pdf.groupby("user_id", group_keys=False)[pdf.columns.tolist()]
        .apply(_ema_fn)
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    got = (
        _ema_bucket_fn(pdf)
        .sort_values("event_id")
        .reset_index(drop=True)[ref.columns]
    )
    pd.testing.assert_frame_equal(ref, got)


@pytest.mark.parametrize("n_bkt", [1, 7])
def test_bucketing_is_a_partition_of_users(n_bkt, spark):
    # hash-bucket partitioning must keep every user whole in one bucket —
    # splitting a user across buckets would corrupt shift/rolling state.
    # Asserted on the REAL Spark-side column the queries build
    # (pmod(hash(user_id), n)), not a pandas stand-in hash.
    from pyspark.sql import functions as F

    pdf = _mixed_frame(seed=3)
    sdf = spark.createDataFrame(pdf[["user_id", "event_id"]])
    per_user = (
        sdf.withColumn("_bkt", F.pmod(F.hash("user_id"), F.lit(n_bkt)))
        .groupBy("user_id")
        .agg(F.countDistinct("_bkt").alias("nb"), F.min("_bkt").alias("b0"))
        .collect()
    )
    assert all(r.nb == 1 for r in per_user)
    assert all(0 <= r.b0 < n_bkt for r in per_user)

"""Skew stress: the scale claims must hold when one source dominates.

Every other perf-shape test runs on the uniform 5-source synthetic; a real
web-dominated corpus puts ~90% of rows in one source. These tests assert the
two machinery pieces that could silently collapse to one task under skew —
the packing prefix-sum buckets and the clustering range cells — stay
balanced (max/mean <= 2) on a 90/10 input.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F


def _skewed_docs(n: int):
    """~90% of rows in source 'web', the rest across 4 minor sources."""
    rows = []
    for i in range(n):
        src = "web" if i % 10 != 0 else ("books", "code", "wiki", "chat")[i % 4]
        rows.append((i, list(range(i % 7)), i % 7, src))
    return rows


def test_packing_buckets_balanced_under_skew(spark, monkeypatch):
    """The bucketed prefix sum's parallelism unit is (source, bucket): the
    dominant source must split across ~n_buckets balanced buckets (its
    percentile cuts adapt to its own doc_id distribution), never collapse
    into one window task. Forces the bucketed path (at this row count the
    size-adaptive switch would legitimately take the single-window form)."""
    from batch_pipeline_via_lakehouse_spark.plans import packing
    from batch_pipeline_via_lakehouse_spark.plans.packing import _with_start_offsets

    monkeypatch.setattr(packing, "_SINGLE_WINDOW_MAX_ROWS", 0)
    n, buckets = 8000, 8
    df = spark.createDataFrame(
        _skewed_docs(n), "doc_id long, tokens array<int>, n_tok int, source string"
    )
    pos = _with_start_offsets(df, n_buckets=buckets)
    hist = {
        (r.source, r._bkt): r.cnt
        for r in pos.groupBy("source", "_bkt").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    web = [c for (s, _), c in hist.items() if s == "web"]
    assert len(web) >= buckets - 1, f"dominant source under-split: {len(web)} buckets"
    assert max(web) / (sum(web) / len(web)) <= 2.0, f"unbalanced: {sorted(web)}"
    # offsets still exact under skew
    got = {r.doc_id: r._start for r in pos.collect()}
    legacy = df.withColumn(
        "_start",
        F.sum("n_tok").over(Window.partitionBy("source").orderBy("doc_id"))
        - F.col("n_tok"),
    )
    exp = {r.doc_id: r._start for r in legacy.collect()}
    assert got == exp


def test_clustering_cells_balanced_under_skew(spark, tmp_path):
    """Range-cell clustering on a 90/10 source-partitioned table: the
    dominant partition's per-partition quantile bounds must split it into
    multiple byte-balanced cells (files), max/mean rows per file <= 2."""
    from batch_pipeline_via_lakehouse_spark.datagen import TOKEN_SCHEMA
    from batch_pipeline_via_lakehouse_spark.operators.clustering import cluster
    from batch_pipeline_via_lakehouse_spark.table import Table

    rows = [
        (
            f"{i:06d}",
            [(i * 31 + j) % 50257 for j in range(64)],
            64,
            "web" if i % 10 != 0 else ("books", "code")[i % 2],
        )
        for i in range(6000)
    ]
    t = Table.create(str(tmp_path / "tok"), TOKEN_SCHEMA, partition_by=["source"])
    df = spark.createDataFrame(rows, TOKEN_SCHEMA).repartition(16)
    t.append(df)
    cluster(spark, t, mode="zorder", target_bytes=96 * 1024)
    per_file = {}
    for f in t.live_files():
        src = f.partition.get("source", f.stat("source", "min"))
        per_file.setdefault(src, []).append(f.rows)
    web = per_file["web"]
    assert len(web) >= 4, f"dominant source under-split: {len(web)} files"
    assert max(web) / (sum(web) / len(web)) <= 2.0, f"unbalanced: {sorted(web)}"
    # minor sources exist and were not starved into the web cells
    assert set(per_file) > {"web"}

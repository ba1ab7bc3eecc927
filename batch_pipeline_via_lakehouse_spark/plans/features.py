"""Grouped-map feature engineering, SCD2 query form, multimodal plumbing,
and the engine-native maintenance flagship.

`grouped_features` replicates the reference's single UDF — the grouped-map
pandas pipeline at `src/elt/gold/fact_daily_ohlcv.py:93-147` applied via
`df.groupby(...).apply(...)` (`:170`) — against a SQL oracle, proving the
Arrow group-map path computes exactly what the declarative form does.
`ema_features` keeps the reference's pandas-only pieces (ewm; Spark SQL has
no EMA) — oracled in pytest against pandas, rows-only here.
"""

from __future__ import annotations

import datetime
import os
import tempfile
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .registry import load, query

_FEATURE_SCHEMA = (
    "event_id long, user_id long, value_return_m long, ma5_c long, cummax_c long"
)


def _feature_fn(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["ts", "event_id"])
    v = pdf["value"]
    # prev==0 -> pct_change yields ±inf; mask to NA (oracle NULLIFs the divisor)
    ret = v.pct_change().replace([np.inf, -np.inf], np.nan)
    # rolling mean in exact integer cents: float sliding-window accumulation
    # orders differ between pandas and SQL windows, integers do not
    cents = (v * 100).round()
    ma5 = cents.rolling(5, min_periods=1).sum() / cents.rolling(5, min_periods=1).count()
    cm = v.cummax()
    out = pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "user_id": pdf["user_id"],
            "value_return_m": np.floor(1000.0 * ret).astype("Int64"),
            "ma5_c": np.floor(ma5).astype("Int64"),
            "cummax_c": np.floor(100.0 * cm).astype("Int64"),
        }
    )
    return out


@query(
    "grouped_features",
    oracle="""
    SELECT event_id, user_id,
           CAST(floor(1000.0 * (value / NULLIF(lag(value) OVER w, 0) - 1.0)) AS BIGINT) AS value_return_m,
           CAST(floor(sum(CAST(round(value * 100) AS BIGINT)) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                      * 1.0 / count(*) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS BIGINT) AS ma5_c,
           CAST(floor(100.0 * max(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS BIGINT) AS cummax_c
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def grouped_features(spark, sf_dir) -> DataFrame:
    """Per-group pandas feature pipeline (A4) via applyInPandas — one Arrow
    batch per user group, vectorized inside; oracled against the equivalent
    SQL windows."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("user_id").applyInPandas(_feature_fn, schema=_FEATURE_SCHEMA)


def _ema_fn(pdf: pd.DataFrame) -> pd.DataFrame:
    # reference-exact pieces Spark SQL cannot express: ewm + RSI
    # (`src/elt/gold/fact_daily_ohlcv.py:112-133`)
    pdf = pdf.sort_values(["ts", "event_id"])
    v = pdf["value"]
    ema10 = v.ewm(span=10, adjust=False).mean()
    delta = v.diff()
    gain = delta.clip(lower=0).rolling(14).mean()
    loss = (-delta.clip(upper=0)).rolling(14).mean()
    rs = gain / loss
    rsi = 100 - (100 / (1 + rs))
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "user_id": pdf["user_id"],
            "ema10": ema10.round(6),
            "rsi14": rsi.round(6),
        }
    )


@query("ema_features")  # no SQL oracle: ewm/RSI are pandas-only (rows-only check)
def ema_features(spark, sf_dir) -> DataFrame:
    """EMA + RSI per user (reference-exact pandas pieces, W5) — validated
    against a driver-side pandas oracle in tests/test_queries_oracle.py."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("user_id").applyInPandas(
        _ema_fn, schema="event_id long, user_id long, ema10 double, rsi14 double"
    )


@query(
    "scd2_versions",
    oracle="""
    WITH target AS (
      SELECT o_orderkey, round(o_totalprice, 4) AS price, true AS is_current,
             epoch_us(TIMESTAMP '2026-01-01') AS start_us
      FROM orders WHERE o_orderkey % 3 = 0
    ),
    source AS (
      SELECT o_orderkey, round(o_totalprice * 1.2, 4) AS price
      FROM orders WHERE o_orderkey % 6 = 0
      UNION ALL
      SELECT o_orderkey + 1, round(o_totalprice, 4)
      FROM orders WHERE o_orderkey % 3 = 1 AND (o_orderkey + 1) % 3 <> 0
    ),
    closed AS (
      SELECT t.o_orderkey, t.price,
             CASE WHEN s.o_orderkey IS NOT NULL AND s.price <> t.price THEN false ELSE true END AS is_current,
             t.start_us,
             CASE WHEN s.o_orderkey IS NOT NULL AND s.price <> t.price
                  THEN epoch_us(TIMESTAMP '2026-02-01') END AS end_us
      FROM target t LEFT JOIN source s ON t.o_orderkey = s.o_orderkey
    ),
    inserts AS (
      SELECT s.o_orderkey, s.price, true AS is_current,
             epoch_us(TIMESTAMP '2026-02-01') AS start_us, CAST(NULL AS BIGINT) AS end_us
      FROM source s LEFT JOIN target t ON t.o_orderkey = s.o_orderkey
      WHERE t.o_orderkey IS NULL OR s.price <> t.price
    )
    SELECT * FROM closed UNION ALL SELECT * FROM inserts
    """,
)
def scd2_versions(spark, sf_dir) -> DataFrame:
    """SCD2 MERGE classification (J6; `src/elt/silver/_silver_handler.py:156-192`)
    as a pure query: close changed current rows, insert new versions —
    the same plan operators/merge.py:merge_scd2 executes copy-on-write."""
    ts0 = datetime.datetime(2026, 1, 1)
    ts1 = datetime.datetime(2026, 2, 1)
    o = load(spark, sf_dir, "orders")
    target = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        F.round("o_totalprice", 4).alias("price"),
        F.lit(True).alias("is_current"),
        F.unix_micros(F.lit(ts0).cast("timestamp")).alias("start_us"),
    )
    source = (
        o.filter(F.col("o_orderkey") % 6 == 0)
        .select("o_orderkey", F.round(F.col("o_totalprice") * 1.2, 4).alias("price"))
        .unionByName(
            o.filter(
                (F.col("o_orderkey") % 3 == 1) & ((F.col("o_orderkey") + 1) % 3 != 0)
            ).select(
                (F.col("o_orderkey") + 1).alias("o_orderkey"),
                F.round("o_totalprice", 4).alias("price"),
            )
        )
    )
    t, s = target.alias("t"), source.alias("s")
    matched_changed = F.col("s.o_orderkey").isNotNull() & (F.col("s.price") != F.col("t.price"))
    end_us = F.unix_micros(F.lit(ts1).cast("timestamp"))
    closed = t.join(s, F.col("t.o_orderkey") == F.col("s.o_orderkey"), "left_outer").select(
        F.col("t.o_orderkey").alias("o_orderkey"),
        F.col("t.price").alias("price"),
        F.when(matched_changed, F.lit(False)).otherwise(F.lit(True)).alias("is_current"),
        F.col("t.start_us").alias("start_us"),
        F.when(matched_changed, end_us).cast("long").alias("end_us"),
    )
    inserts = s.join(t, F.col("t.o_orderkey") == F.col("s.o_orderkey"), "left_outer").filter(
        F.col("t.o_orderkey").isNull() | (F.col("s.price") != F.col("t.price"))
    ).select(
        F.col("s.o_orderkey").alias("o_orderkey"),
        F.col("s.price").alias("price"),
        F.lit(True).alias("is_current"),
        end_us.alias("start_us"),
        F.lit(None).cast("long").alias("end_us"),
    )
    return closed.unionByName(inserts)


# --------------------------------------------------------------------------
# Multimodal plumbing (binary payloads through Arrow batches)


@query("multimodal_stub")  # rows-only: decode is stubbed (no image libs in env)
def multimodal_stub(spark, sf_dir) -> DataFrame:
    """Multimodal column plumbing: payloads as opaque binary + typed metadata,
    batch-processed with mapInPandas. The decode step is a STUB (deterministic
    fake header parse — the container has no image/audio codecs); the Spark
    plumbing (binary column, Arrow batching, schema, partitioning) is real."""
    d = load(spark, sf_dir, "documents")
    with_blob = d.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )

    def fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            blobs = b["payload"]
            n = blobs.str.len()
            # STUB: a real pipeline would decode image/audio here
            # (PIL/torchaudio); we parse a deterministic fake header instead.
            magic = blobs.str[:4].apply(lambda x: x.hex())
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "n_bytes": n.astype("int64"),
                    "magic": magic,
                    "fake_width": (n % 640).astype("int64"),
                    "fake_height": (n % 480).astype("int64"),
                }
            )

    return with_blob.mapInPandas(
        fake_decode,
        schema="doc_id long, n_bytes long, magic string, fake_width long, fake_height long",
    )


# --------------------------------------------------------------------------
# Engine-native flagship: tokenize -> fragmented table -> compact+Z-order


@query("maintenance_compact_zorder")  # engine-native: no SQL-expressible oracle
def maintenance_compact_zorder(spark, sf_dir) -> DataFrame:
    """End-to-end maintenance flagship: tokenize `documents` into the token
    table shape, write it fragmented, run bin-packing compaction + Z-order
    clustering, and return the post-maintenance per-source rollup. The
    invariant (content preserved exactly) is asserted by the engine test
    suite; here the driver sees the operators run end-to-end."""
    from ..datagen import TOKEN_SCHEMA
    from ..operators.clustering import cluster
    from ..operators.compaction import compact
    from ..table import Table

    d = load(spark, sf_dir, "documents")
    # deterministic 'tokenization': word -> md5-int % 50257 (vectorized, JVM)
    tok = d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.expr(
            "transform(split(trim(text), '\\\\s+'),"
            " w -> cast(conv(substring(md5(w), 1, 7), 16, 10) % 50257 AS int))"
        ).alias("tokens"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("int").alias("n_tok"),
        F.col("source").cast("string").alias("source"),
    )
    root = os.path.join(tempfile.mkdtemp(prefix="maint-"), "tok")
    t = Table.create(root, TOKEN_SCHEMA, partition_by=["source"])
    t.append(tok, num_files=4)
    compact(spark, t, target_bytes=16 * 1024 * 1024)
    cluster(spark, t, mode="zorder", target_bytes=16 * 1024 * 1024)
    return (
        t.scan(spark)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_tok").cast("long")).alias("n_tokens"),
            F.expr("bit_xor(xxhash64(doc_id, tokens, n_tok))").alias("content_hash"),
        )
    )

"""Deterministic synthetic token table (doc_id, tokens, n_tok, source).

Shape per BASELINE.json input_hint / FIXTURES.md F-1. The generator is
*scale-free*: rows come from ``spark.range(N)`` (distributed, no driver data)
and every cell is a pure arithmetic function of the row index — splitmix64
counter hashing — so a row's content is reproducible independent of
partitioning, executor count, or generation order. The same code path that
makes 1e3 rows in a unit test would make 1e12 rows on a cluster.

Distributions (chosen to exercise the maintenance engine):
- ``n_tok``: Zipf-ish over [16, 8192] (cube-law: most docs short, heavy tail)
  -> the Z-order clustering dimension has real spread.
- ``source``: ~20 categories, 'web' ~60% -> hot-key skew for salting /
  AQE-skew-join evidence.
- ``tokens``: length n_tok, values in [0, 50257), splitmix64(i, j) — an
  opaque payload whose exact preservation is the correctness invariant.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

TOKEN_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("tokens", ArrayType(IntegerType(), False), False),
        StructField("n_tok", IntegerType(), False),
        StructField("source", StringType(), False),
    ]
)

VOCAB = 50257
MIN_TOK, MAX_TOK = 16, 8192

_SOURCES = [
    "web", "wiki", "books", "code", "news", "social", "forums", "papers",
    "patents", "legal", "medical", "recipes", "reviews", "qa", "chat",
    "docs", "mail", "subs", "lyrics", "misc",
]
# web ~60%, geometric-ish tail over the other 19.
_WEIGHTS = np.array([0.60] + [0.40 * (0.82 ** k) for k in range(19)])
_WEIGHTS /= _WEIGHTS.sum()
_CUM = np.cumsum(_WEIGHTS)

_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant mix)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _M64
    z = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9) & _M64
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB) & _M64
    return z ^ (z >> np.uint64(31))


def _u01(h: np.ndarray) -> np.ndarray:
    return h.astype(np.float64) / 2.0**64


def _gen_batch(ids: np.ndarray, seed: int) -> pd.DataFrame:
    n = len(ids)
    s = np.uint64(seed)
    h1 = _splitmix64(ids * np.uint64(0x9E3779B97F4A7C15) + s)
    h2 = _splitmix64(ids * np.uint64(0xC2B2AE3D27D4EB4F) + s + np.uint64(1))

    # Zipf-ish lengths: cube of uniform concentrates mass near MIN_TOK.
    n_tok = (MIN_TOK + np.floor((MAX_TOK - MIN_TOK + 1) * _u01(h1) ** 3)).astype(np.int64)
    n_tok = np.minimum(n_tok, MAX_TOK)
    source_idx = np.searchsorted(_CUM, _u01(h2), side="right")
    source_idx = np.minimum(source_idx, len(_SOURCES) - 1)

    # tokens[i][j] = splitmix64(rowkey_i + j) % VOCAB — flat, then re-listed.
    total = int(n_tok.sum())
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    rowkey = _splitmix64(ids + np.uint64(0xA076_1D64_78BD_642F))
    flat_key = np.repeat(rowkey, n_tok) + (
        np.arange(total, dtype=np.uint64) - np.repeat(offsets[:-1], n_tok).astype(np.uint64)
    )
    flat_tok = (_splitmix64(flat_key) % np.uint64(VOCAB)).astype(np.int32)

    tokens = [flat_tok[offsets[k]: offsets[k + 1]] for k in range(n)]
    return pd.DataFrame(
        {
            "doc_id": [f"doc-{int(i):012d}" for i in ids],
            "tokens": tokens,
            "n_tok": n_tok.astype(np.int32),
            "source": np.array(_SOURCES, dtype=object)[source_idx],
        }
    )


def token_table_df(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    num_partitions: int | None = None,
    start: int = 0,
) -> DataFrame:
    """Distributed deterministic token table of rows [start, start+n_rows)."""
    base = spark.range(start, start + n_rows, numPartitions=num_partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b):
                yield _gen_batch(b["id"].to_numpy(dtype=np.uint64), seed)

    return base.mapInPandas(gen, schema=TOKEN_SCHEMA)


def token_pdf(n_rows: int, seed: int = 42) -> pd.DataFrame:
    """Driver-side reference copy (tests only) — same bytes as the Spark path."""
    return _gen_batch(np.arange(n_rows, dtype=np.uint64), seed)

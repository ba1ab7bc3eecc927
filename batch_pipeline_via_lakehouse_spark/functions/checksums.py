"""Order-insensitive content digests for invariant checking.

The engine's correctness gate (BASELINE.json north_rule) is that every
maintenance pass preserves table content exactly — including byte-exact
``tokens`` arrays. Comparing sorted collect()s doesn't scale; an
order-insensitive digest does: xxhash64 every row (JVM-side, codegen'd),
bit_xor-fold the hashes. Commutative, so file order / partitioning is
irrelevant; overflow-free under ANSI mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_checksum(df: DataFrame, cols: list[str] | None = None) -> tuple[int, int]:
    """(row_count, xor-of-row-hashes) over ``cols`` (default: all columns)."""
    cols = cols or df.columns
    row = (
        df.select(F.xxhash64(*cols).alias("h"))
        .agg(F.count("h").alias("n"), F.expr("bit_xor(h)").alias("x"))
        .collect()[0]
    )
    return row["n"], row["x"] if row["x"] is not None else 0

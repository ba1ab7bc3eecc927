"""Hot-key salting for skewed equi-joins.

AQE's skew-join splitting handles most skew at runtime; explicit salting is
the structural fallback when one side has pathological key multiplicity
(e.g. an SCD2 target with millions of versions of one hot key, or a
'source'-keyed join where 'web' is 60% of rows — north_rule). The skewed
side gets a uniform random salt in [0, buckets); the other side is exploded
across all salt values, turning one hot shuffle partition into ``buckets``
balanced ones at the cost of replicating the small side ``buckets``×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def salted_equi_join(
    skewed: DataFrame,
    replicated: DataFrame,
    keys: list[str],
    how: str = "inner",
    buckets: int = 16,
) -> DataFrame:
    """Join ``skewed`` ⋈ ``replicated`` on ``keys`` with the skewed side
    salted and the other side replicated across salts. Result columns follow
    Spark's usual equi-join layout (keys deduplicated).

    Valid for ``inner`` and ``left`` (skewed side preserved): each skewed row
    carries exactly one salt and the replicated side covers every salt, so
    match semantics are unchanged. NOT valid for right/full outer — an
    unmatched replicated row would surface ``buckets`` times."""
    salted = skewed.withColumn(_SALT, F.floor(F.rand(seed=7) * buckets).cast("int"))
    repl = replicated.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return salted.join(repl, [*keys, _SALT], how).drop(_SALT)

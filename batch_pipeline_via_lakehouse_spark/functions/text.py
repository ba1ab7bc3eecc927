"""Text-analysis kernels shared by the query suite (all JVM-side built-ins).

Cross-engine determinism trick used throughout: the only hash both Spark and
DuckDB share bit-for-bit is md5 (lowercase hex), so every sketch (minhash,
simhash) derives integers from md5 hex prefixes — 15 hex chars = 60 bits,
safely inside int64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# stopword sets for the language-ID heuristic (tiny on purpose; the corpus is
# synthetic — what matters is that the heuristic is deterministic and the
# Spark and SQL forms agree)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "y", "una", "por"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}
LANG_PRIORITY = ["en", "de", "fr", "es", "zh"]


def words_col(text: str | Column = "text") -> Column:
    """Whitespace tokenization (after trim) — matches
    regexp_split_to_array(trim(text), '\\s+') in DuckDB."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def md5_int(c: Column) -> Column:
    """First 60 bits of md5 as int64 — identical in DuckDB via
    ('0x' || substr(md5(x),1,15))::BIGINT."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def word_3grams_all_expr(words_col_name: str) -> Column:
    """Word trigrams WITH multiplicity from an array column (SQL-lambda,
    JVM-side). Docs with fewer than 3 words yield an empty array — the
    unguarded form would evaluate sequence(0, -1) == [0, -1] (descending)
    and index past the array, which under Spark 4's default ANSI mode
    aborts the job with INVALID_ARRAY_INDEX on the first short document."""
    w = words_col_name
    return F.expr(
        f"CASE WHEN size({w}) < 3 THEN array() ELSE"
        f" transform(sequence(0, size({w}) - 3),"
        f" i -> concat({w}[i], ' ', {w}[i+1], ' ', {w}[i+2])) END"
    )


def word_3grams_expr(words_col_name: str) -> Column:
    """Distinct word trigrams from an array column (short-doc-safe)."""
    return F.array_distinct(word_3grams_all_expr(words_col_name))

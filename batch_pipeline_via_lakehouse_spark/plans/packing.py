"""Training-sequence packing + dataset curation operators.

The ops a pre-tokenized training pipeline runs between maintenance and the
trainer: pack documents into fixed-length context windows, draw
deterministic stratified samples per source, and summarize the length
distribution. All JVM-side (window cumsum + groupBy + hash arithmetic — no
UDFs), each with an exact DuckDB oracle.

Tokenization for the packing ops reuses the flagship's deterministic
word -> md5 % 50257 scheme (`plans/features.py:maintenance_compact_zorder`)
so `documents` rows become the token-table shape without external data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .registry import load, query

_CTX = 512  # context window length (tokens) for packing

# deterministic doc -> n_tok, matching the flagship tokenizer's count
_NTOK_SQL = r"len(regexp_split_to_array(trim(text), '\s+'))"


def _ntok_col() -> F.Column:
    return F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")


@query(
    "pack_sequences",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, CAST(source AS VARCHAR) AS source,
             CAST({_NTOK_SQL} AS BIGINT) AS n_tok
      FROM documents
    ), pos AS (
      SELECT doc_id, source, n_tok,
             sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id) - n_tok AS start_off
      FROM tok
    )
    SELECT source, CAST(start_off // {_CTX} AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           bit_xor(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT) AS doc_set_hash
    FROM pos GROUP BY source, start_off // {_CTX}
    """,
)
def pack_sequences(spark, sf_dir) -> DataFrame:
    """Concatenate-then-chunk packing plan (the standard LLM pretraining
    layout): per source, documents are laid end to end in deterministic
    (doc_id) order and every document is assigned to the {_CTX}-token context
    window its first token lands in. One window-cumsum + one groupBy — both
    partitioned by source, so packing parallelizes across sources and the
    cumsum never crosses a shuffle boundary twice. Output is the per-bin
    roster (doc count, token count, order-insensitive md5-xor of doc ids),
    which pins the packing decision exactly without materializing token
    arrays."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("source").cast("string").alias("source"), _ntok_col().alias("n_tok")
    )
    w = Window.partitionBy("source").orderBy("doc_id")
    pos = d.withColumn("start_off", F.sum("n_tok").over(w) - F.col("n_tok"))
    return (
        pos.groupBy("source", (F.col("start_off") / _CTX).cast("long").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.expr(
                "bit_xor(cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10)"
                " as bigint))"
            ).alias("doc_set_hash"),
        )
    )


def pack_token_windows(df: DataFrame, ctx_len: int = _CTX, drop_partial: bool = True) -> DataFrame:
    """Materialize the packed examples themselves: per source, lay the token
    arrays end to end in doc_id order and emit one row per ``ctx_len``-token
    context window — `(source, bin, tokens array<int>)`.

    Fully distributed and JVM-side: a window cumsum gives each document its
    start offset; each document explodes into per-window slices (built-in
    `sequence`/`transform`/`slice` — no UDF); a groupBy per (source, window)
    re-assembles the slices with `array_sort` + `flatten`. A document never
    moves except to the windows it overlaps, so shuffle volume == data
    volume, once.

    Scale note: the per-source cumsum is a prefix sum over one window
    partition. At extreme scale the same offsets come for free from manifest
    stats (per-file n_tok sums -> per-file base offsets broadcast to tasks),
    turning the window into a per-file-local cumsum; the slice/group stages
    are unchanged.

    ``drop_partial``: drop the final short window per source (the standard
    trainer behavior); pass False to keep it."""
    L = ctx_len
    w = Window.partitionBy("source").orderBy("doc_id")
    pos = (
        df.filter(F.col("n_tok") > 0)
        .withColumn("_start", F.sum("n_tok").over(w) - F.col("n_tok"))
    )
    pieces = pos.select(
        "source",
        "_start",
        F.explode(
            # window ids and offsets stay BIGINT end to end: a source's
            # cumulative offset passes 2^31 long before trillion-token scale,
            # and int math here would wrap silently with ANSI off. Only the
            # final slice start/length (bounded by n_tok) narrows to int.
            F.expr(
                f"""transform(
                      sequence(_start div {L}, (_start + n_tok - 1) div {L}),
                      b -> struct(
                        b as bin,
                        slice(tokens,
                              cast(greatest(0L, b * {L} - _start) as int) + 1,
                              cast(least(cast(n_tok as bigint), (b + 1) * {L} - _start)
                                   - greatest(0L, b * {L} - _start) as int)) as piece))"""
            )
        ).alias("bp"),
    ).select("source", "_start", F.col("bp.bin").alias("bin"), F.col("bp.piece").alias("piece"))
    packed = (
        pieces.groupBy("source", "bin")
        .agg(
            F.expr(
                "flatten(transform(array_sort(collect_list(struct(_start, piece))),"
                " p -> p.piece))"
            ).alias("tokens")
        )
    )
    if drop_partial:
        packed = packed.filter(F.size("tokens") == L)
    return packed


@query(
    "pack_windows",
    # full materializer parity: DuckDB rebuilds each source's token stream
    # (same md5 tokenizer as the flagship), chunks it, and hashes every
    # complete window — equality means the distributed cumsum/slice/reassembly
    # produced every packed example bit-for-bit
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, CAST(source AS VARCHAR) AS source,
             list_transform(regexp_split_to_array(trim(text), '\\s+'),
                            w -> ('0x' || substr(md5(w), 1, 7))::BIGINT % 50257) AS tokens
      FROM documents
    ), stream AS (
      SELECT source, flatten(list(tokens ORDER BY doc_id)) AS s
      FROM tok GROUP BY source
    ), bins AS (
      SELECT source, s,
             unnest(generate_series(0, CAST(len(s) // {_CTX} AS BIGINT) - 1)) AS b
      FROM stream
    )
    SELECT source, CAST(b AS BIGINT) AS bin,
           md5(array_to_string(s[b * {_CTX} + 1 : (b + 1) * {_CTX}], ',')) AS win_hash
    FROM bins
    """,
)
def pack_windows(spark, sf_dir) -> DataFrame:
    """The packed examples themselves, content-hashed per window: tokenize
    `documents` deterministically (flagship scheme), run the distributed
    pack_token_windows materializer, and emit md5 of each complete
    {_CTX}-token window. The DuckDB oracle re-derives every window from the
    raw text single-threaded — exact parity of the distributed reassembly."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.col("source").cast("string").alias("source"),
        F.expr(
            "transform(split(trim(text), '\\\\s+'),"
            " w -> cast(conv(substring(md5(w), 1, 7), 16, 10) % 50257 AS int))"
        ).alias("tokens"),
        _ntok_col().alias("n_tok"),
    )
    packed = pack_token_windows(tok, ctx_len=_CTX, drop_partial=True)
    return packed.select(
        "source",
        "bin",
        F.md5(F.array_join(F.col("tokens").cast("array<string>"), ",")).alias("win_hash"),
    )


_SAMPLE_RATES = {"web": 200, "books": 800, "code": 500, "wiki": 1000, "chat": 100}
_RATE_SQL = "CASE " + " ".join(
    f"WHEN source = '{s}' THEN {r}" for s, r in _SAMPLE_RATES.items()
) + " ELSE 300 END"


@query(
    "stratified_sample",
    oracle=f"""
    SELECT doc_id, CAST(source AS VARCHAR) AS source
    FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 1000
          < ({_RATE_SQL})
    """,
)
def stratified_sample(spark, sf_dir) -> DataFrame:
    """Deterministic per-source stratified sampling: keep a document iff
    md5(doc_id) mod 1000 falls under its source's rate (permille). Hash
    sampling is reproducible across engines and runs, needs no state, never
    shuffles (pure filter, pushable below joins), and sampling a source at a
    different rate later reuses the same hash — nested samples."""
    d = load(spark, sf_dir, "documents")
    rate = F.expr(_RATE_SQL)
    bucket = F.expr(
        "conv(substring(md5(cast(doc_id as string)), 1, 7), 16, 10) % 1000"
    ).cast("long")
    return (
        d.select("doc_id", F.col("source").cast("string").alias("source"), bucket.alias("_b"), rate.alias("_r"))
        .filter(F.col("_b") < F.col("_r"))
        .select("doc_id", "source")
    )


_HIST_W = 64  # tokens per histogram bucket


@query(
    "token_histogram",
    oracle=f"""
    SELECT CAST(source AS VARCHAR) AS source,
           CAST(({_NTOK_SQL}) // {_HIST_W} AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum({_NTOK_SQL}) AS BIGINT) AS n_tokens
    FROM documents
    GROUP BY source, ({_NTOK_SQL}) // {_HIST_W}
    """,
)
def token_histogram(spark, sf_dir) -> DataFrame:
    """Sequence-length histogram per source (fixed {_HIST_W}-token buckets):
    the length-distribution summary packing/curriculum decisions read. One
    hash aggregate, map-side partials, no UDF."""
    d = load(spark, sf_dir, "documents").select(
        F.col("source").cast("string").alias("source"), _ntok_col().alias("n_tok")
    )
    return (
        d.groupBy("source", (F.col("n_tok") / _HIST_W).cast("long").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
    )

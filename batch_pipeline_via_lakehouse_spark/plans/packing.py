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

from .registry import load, load_wide, query  # noqa: F401 — load kept for callers

_CTX = 512  # context window length (tokens) for packing

# per-source row count under which the bucketed two-level prefix sum is
# skipped for a plain per-source window (see _with_start_offsets): a single
# task sorts ~1M (key, n_tok) rows in low seconds, while the bucketed path
# always pays two extra metadata jobs plus two broadcast joins. Above this,
# per-source parallelism matters more than the fixed cost.
_SINGLE_WINDOW_MAX_ROWS = 1 << 20

# deterministic doc -> n_tok, matching the flagship tokenizer's count
_NTOK_SQL = r"len(regexp_split_to_array(trim(text), '\s+'))"


def _ntok_col() -> F.Column:
    return F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")


def _with_start_offsets(df: DataFrame, n_buckets: int | None = None) -> DataFrame:
    """Add `_start` (the per-source concatenation offset, in (source, doc_id)
    order) to a DataFrame with (source, doc_id, n_tok) — fully distributed.

    A single `Window.partitionBy("source")` prefix sum runs in ONE task per
    source: with ~5 corpus sources, the first packing stage would use 5 cores
    of a 1000-executor cluster. Instead the prefix sum is computed as a
    two-level scan:

    1. one column-pruned pass takes per-source doc_id split points
       (`percentile_approx`) — `n_buckets` contiguous doc_id ranges per
       source, balanced even when doc_id spacing is skewed;
    2. one map-side-combined aggregate totals tokens per (source, bucket);
       the driver folds those B x #sources rows (metadata-scale) into
       per-bucket BASE offsets and broadcasts them;
    3. the window cumsum runs per (source, bucket) partition — parallelism =
       #sources x n_buckets, each partition a contiguous doc_id slice, and
       `_start = base + local cumsum`.

    The collected split points are fixed literals, so bucket assignment is
    deterministic across the totals pass and the main pass. Catalog tables
    can skip passes 1-2 entirely — per-file n_tok sums already live in
    manifest stats (`table/catalog.py` collects `sum` for ints); see
    `pack_table_windows`.

    Size-adaptive: a cheap count/supp aggregate over the persisted slim
    projection runs FIRST, and when every source fits a single window task
    (<= _SINGLE_WINDOW_MAX_ROWS) the bucket machinery — including the
    percentile_approx cut pass, which would otherwise be computed only to
    be discarded — is skipped entirely: one plain per-source window cumsum,
    no totals pass, no bucket joins. The _start
    values are identical either way (same (source, doc_id) prefix sum); only
    the parallelism strategy changes. The bucketed path remains the 100 TB
    shape."""
    from pyspark.sql.types import NumericType

    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = max(2, spark.sparkContext.defaultParallelism)
    # split points need a NUMERIC, monotone-nondecreasing image of doc_id
    # (percentile_approx can't rank strings): numerics pass through floor;
    # anything else maps to its first 7 UTF8 bytes zero-padded. Byte-prefix
    # order equals Spark's string sort order for ASCII/BMP text (UTF-8 and
    # UTF-16 code-unit order agree below U+10000); rows that collide on the
    # prefix merely share a bucket (the in-bucket window still orders by the
    # true doc_id). Spark 4's default UTF8_BINARY collation compares UTF-8
    # bytes, so the mapping is monotone even for supplementary-plane text
    # (verified empirically); but that equivalence is collation-dependent —
    # engines or collations comparing UTF-16 code units order surrogate
    # pairs below U+E000 while their UTF-8 bytes sort above. Defensively, a
    # source whose doc_ids contain any codepoint >= U+10000 is detected in
    # the same metadata pass and collapses to a single bucket — always
    # exact, just serial for that source.
    supp = F.lit(False)
    if isinstance(df.schema["doc_id"].dataType, NumericType):
        ord_expr = F.floor(F.col("doc_id")).cast("bigint")
    else:
        ord_expr = F.expr(
            "cast(conv(hex(rpad(cast(cast(doc_id as string) as binary), 7, x'00')),"
            " 16, 10) as bigint)"
        )
        supp = F.col("doc_id").cast("string").rlike("[\\x{10000}-\\x{10FFFF}]")
    # NULL source is a real group (the single-window form kept it as its own
    # partition): key the metadata joins on a never-null, collision-proof
    # image of source — a tag character ('n' null / 'v' value) prefixes real
    # values, so no real source string can collide with the null marker
    skey = F.when(F.col("source").isNull(), F.lit("n")).otherwise(
        F.concat(F.lit("v"), F.col("source").cast("string"))
    )
    df = df.withColumn("_ord", ord_expr).withColumn("_sk", skey)
    # the two metadata passes (split points, bucket totals) run over a
    # persisted 3-column projection — one upstream evaluation (tokenize/scan)
    # instead of three; the main pass below is the second and last
    slim = df.select("_sk", "_ord", "n_tok", supp.alias("_supp")).persist()
    try:
        # counts/supp first (cheap agg over the persisted projection): in the
        # single-window case the percentile cuts would be computed only to be
        # discarded — they are a second pass over the SAME cached slim table,
        # paid only when the bucketed path actually runs
        info = (
            slim.groupBy("_sk")
            .agg(F.max("_supp").alias("supp"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        if not info or max(r["n"] for r in info) <= _SINGLE_WINDOW_MAX_ROWS:
            # every source fits one window task: the two-level scan would
            # cost two extra jobs + two broadcast joins for nothing
            w1 = Window.partitionBy("_sk").orderBy("doc_id")
            return (
                df.withColumn(
                    "_start", F.sum("n_tok").over(w1) - F.col("n_tok")
                )
                .drop("_ord", "_sk")
            )
        fracs = [i / n_buckets for i in range(1, n_buckets)]
        supp_by = {r["_sk"]: r["supp"] for r in info}
        cut_rows = (
            slim.groupBy("_sk")
            .agg(F.percentile_approx("_ord", fracs, 10_000).alias("cuts"))
            .collect()
        )
        cuts_df = F.broadcast(
            spark.createDataFrame(
                [
                    (
                        r["_sk"],
                        []
                        if supp_by[r["_sk"]]
                        else [int(c) for c in (r["cuts"] or [])],
                    )
                    for r in cut_rows
                ],
                "_sk string, cuts array<bigint>",
            )
        )
        # monotone step function of doc_id: rows in bucket k all precede
        # rows in bucket k+1 in (source, doc_id) order
        bkt = F.expr("size(filter(cuts, c -> c < _ord))")
        totals = (
            slim.join(cuts_df, "_sk")
            .withColumn("_bkt", bkt)
            .groupBy("_sk", "_bkt")
            .agg(F.sum("n_tok").alias("t"))
            .collect()
        )
    finally:
        slim.unpersist()
    acc: dict[str, int] = {}
    base_rows = []
    for r in sorted(totals, key=lambda r: (r["_sk"], r["_bkt"])):
        base_rows.append((r["_sk"], r["_bkt"], acc.get(r["_sk"], 0)))
        acc[r["_sk"]] = acc.get(r["_sk"], 0) + int(r["t"] or 0)
    base_df = F.broadcast(
        spark.createDataFrame(base_rows, "_sk string, _bkt int, _base long")
    )
    w = Window.partitionBy("_sk", "_bkt").orderBy("doc_id")
    return (
        df.join(cuts_df, "_sk")
        .withColumn("_bkt", bkt)
        .drop("cuts", "_ord")
        .join(base_df, ["_sk", "_bkt"])
        .withColumn("_start", F.col("_base") + F.sum("n_tok").over(w) - F.col("n_tok"))
        .drop("_base", "_sk")
    )


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
    window its first token lands in. The concatenation offset comes from the
    distributed bucketed prefix sum (`_with_start_offsets` — parallelism =
    #sources x n_buckets, never one task per source), then one groupBy.
    Output is the per-bin roster (doc count, token count, order-insensitive
    md5-xor of doc ids), which pins the packing decision exactly without
    materializing token arrays."""
    d = load_wide(spark, sf_dir, "documents").select(
        "doc_id", F.col("source").cast("string").alias("source"), _ntok_col().alias("n_tok")
    )
    pos = _with_start_offsets(d).withColumnRenamed("_start", "start_off")
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


def pack_token_windows(
    df: DataFrame,
    ctx_len: int = _CTX,
    drop_partial: bool = True,
    n_buckets: int | None = None,
) -> DataFrame:
    """Materialize the packed examples themselves: per source, lay the token
    arrays end to end in doc_id order and emit one row per ``ctx_len``-token
    context window — `(source, bin, tokens array<int>)`.

    Fully distributed and JVM-side: the bucketed prefix sum
    (`_with_start_offsets`) gives each document its start offset with
    parallelism = #sources x n_buckets (never one cumsum task per source);
    each document explodes into per-window slices (built-in
    `sequence`/`transform`/`slice` — no UDF); a groupBy per (source, window)
    re-assembles the slices with `array_sort` + `flatten`. A document never
    moves except to the windows it overlaps, so shuffle volume == data
    volume, once. For catalog tables, `pack_table_windows` skips the two
    offset passes entirely via manifest stats.

    ``drop_partial``: drop the final short window per source (the standard
    trainer behavior); pass False to keep it."""
    pos = _with_start_offsets(df.filter(F.col("n_tok") > 0), n_buckets)
    return _slice_and_pack(pos, ctx_len, drop_partial)


def _slice_and_pack(pos: DataFrame, ctx_len: int, drop_partial: bool) -> DataFrame:
    """Shared slice/reassemble stages: `pos` carries (source, tokens, n_tok,
    `_start`); emit one (source, bin, tokens) row per context window."""
    L = ctx_len
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


def pack_table_windows(
    spark,
    table,
    ctx_len: int = _CTX,
    drop_partial: bool = True,
    n_buckets: int | None = None,
) -> DataFrame:
    """Packing over a catalog token table with ZERO offset passes: every
    file's base offset comes from manifest stats alone (per-file `n_tok`
    sums are collected at write time — `table/catalog.py` sum stats), so the
    first stage is a per-FILE-local window cumsum — parallelism = #files,
    the extreme-scale shape. The slice/reassemble stages are shared with
    `pack_token_windows`.

    Soundness gate: this layout requires each source's files to cover
    non-overlapping doc_id ranges (the post-compaction/clustering layout —
    range-partitioned, sorted-within writes). The gate checks the manifest
    min/max doc_id stats; any overlap or missing stat falls back to the
    generic bucketed-prefix-sum path over the table scan — same output,
    two extra metadata-scale passes."""
    files = table.live_files()
    by_src: dict[str, list] = {}
    for f in files:
        src = f.partition.get("source", f.stat("source", "min"))
        by_src.setdefault(src, []).append(f)

    base_rows: list[tuple[str, int]] = []
    sortable = True
    for src, fs in by_src.items():
        if any(
            f.stat("doc_id", "min") is None
            or f.stat("doc_id", "max") is None
            or f.stat("n_tok", "sum") is None
            or (f.stat("source", "min") != f.stat("source", "max"))
            # min/max manifest stats ignore NULLs: a file mixing NULL and
            # non-NULL source would pass the min==max check (and NULL doc_ids
            # would pass the range checks) while its NULL rows' tokens still
            # count into the base offsets — require zero nulls on both key
            # columns, treating a missing null-count stat as unsafe
            or f.stat("source", "nulls") != 0
            or f.stat("doc_id", "nulls") != 0
            for f in fs
        ):
            sortable = False
            break
        fs.sort(key=lambda f: f.stat("doc_id", "min"))
        prev_max = None
        off = 0
        for f in fs:
            if prev_max is not None and f.stat("doc_id", "min") <= prev_max:
                sortable = False
                break
            prev_max = f.stat("doc_id", "max")
            base_rows.append((f.path, off))
            off += int(f.stat("n_tok", "sum"))
        if not sortable:
            break
    if not sortable:
        return pack_token_windows(
            table.scan(spark).select(
                "doc_id", F.col("source").cast("string").alias("source"),
                "tokens", F.col("n_tok").cast("long").alias("n_tok"),
            ),
            ctx_len,
            drop_partial,
            n_buckets,
        )

    import os
    import re

    root = table.root

    base_df = F.broadcast(
        spark.createDataFrame(base_rows or [("", 0)], "_relpath string, _base long")
    )
    # input_file_name() is a percent-encoded URI; normalize JVM-side (strip
    # scheme, percent-decode) and relativize against the table root so it
    # joins the manifest-relative base-offset map. url_decode is form-
    # urlencoded ('+' -> space), but the URI encoder leaves literal '+'
    # unescaped — pre-escaping '+' to %2B makes the decode pure percent-
    # decoding (same result as operators/merge.py's urllib unquote)
    scan = table.scan(spark).withColumn("_file_uri", F.input_file_name())
    rel = F.expr(
        r"url_decode(regexp_replace(regexp_replace(_file_uri, '^file:/+', '/'),"
        r" '\\+', '%2B'))"
    )
    scan = scan.withColumn(
        "_relpath", F.regexp_replace(rel, "^" + re.escape(os.path.join(root, "")), "")
    ).drop("_file_uri")
    pos = (
        scan.join(base_df, "_relpath")
        .withColumn(
            "_start",
            F.col("_base")
            + F.sum(F.col("n_tok").cast("long")).over(
                Window.partitionBy("_relpath").orderBy("doc_id")
            )
            - F.col("n_tok").cast("long"),
        )
        .filter(F.col("n_tok") > 0)
        .select(
            F.col("source").cast("string").alias("source"),
            "tokens",
            F.col("n_tok").cast("long").alias("n_tok"),
            "_start",
        )
    )
    return _slice_and_pack(pos, ctx_len, drop_partial)


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
    d = load_wide(spark, sf_dir, "documents")
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

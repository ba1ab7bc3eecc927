"""Similarity search over the `embeddings` table (array<float> column).

- brute-force cosine (baseline): JVM-side higher-order functions
  (zip_with + aggregate) — no UDF at all;
- LSH bucketing (scale path): random-hyperplane signs with hyperplanes
  derived deterministically from md5 parities, computed in a vectorized
  NumPy pandas UDF (one matmul per Arrow batch);
- near-dup pairs: bucketed/blocked join instead of full cross join.

Cosine values are floor-scaled (x1000) for bit-stable cross-engine compare.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .registry import load, load_wide, query

_DIM = 64
_PLANES = 8


def _norm2_expr(a: str) -> F.Column:
    """Squared L2 norm with the same strict index-order fold as _cosine_expr
    (bit-identical wherever it is evaluated — per pair or hoisted per
    vector)."""
    return F.expr(f"aggregate({a}, 0D, (s, v) -> s + cast(v AS double) * cast(v AS double))")


def _dot_expr(a: str, b: str) -> F.Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x AS double) * cast(y AS double)),"
        " 0D, (s, v) -> s + v)"
    )


def _cosine_expr(a: str, b: str) -> F.Column:
    """cosine(a, b) entirely in Spark SQL lambdas (JVM, codegen-friendly);
    elements cast to double before multiply for engine-stable accumulation.
    The norm product is NULLIF-guarded (mirrored in _COS_SQL): a zero-norm
    vector yields NULL cosine instead of NaN — which would abort the
    floor(...)::long casts downstream under ANSI mode."""
    na = f"aggregate({a}, 0D, (s, v) -> s + cast(v AS double) * cast(v AS double))"
    nb = f"aggregate({b}, 0D, (s, v) -> s + cast(v AS double) * cast(v AS double))"
    return _dot_expr(a, b) / F.expr(f"nullif(sqrt({na}) * sqrt({nb}), 0D)")


_COS_SQL = (
    "list_dot_product({a}, {b}) / "
    "NULLIF(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})), 0)"
)


def _hyperplanes(n_planes: int = _PLANES) -> np.ndarray:
    """Deterministic ±1 hyperplanes from md5 parities — reproducible in SQL.
    Plane j is the same for every ``n_planes``, so wider signatures extend
    (never reshuffle) narrower ones."""
    w = np.empty((n_planes, _DIM), dtype=np.float64)
    for j in range(n_planes):
        for d in range(_DIM):
            h = hashlib.md5(f"{j}-{d}".encode()).hexdigest()
            w[j, d] = 1.0 if int(h[0], 16) % 2 == 0 else -1.0
    return w


def _lsh_weights_sql(n_planes: int = _PLANES) -> str:
    w = _hyperplanes(n_planes)
    rows = ", ".join(
        f"({j}, {d}, {int(w[j, d])})" for j in range(n_planes) for d in range(_DIM)
    )
    return f"(VALUES {rows}) AS w(plane, dim, wt)"


# LSH projections are computed over QUANTIZED components: q = floor(x * 1e6)
# as int64 (float32 -> double is exact; double*1e6 and floor are IEEE-defined
# identically everywhere). The ±1-weighted projection then sums INTEGERS, so
# its sign is engine-independent regardless of summation order — a raw float
# sum within rounding distance of 0 could bucket differently between NumPy's
# pairwise matmul and DuckDB's sequential aggregate.
_Q = 1_000_000
_QX_SQL = f"CAST(floor(CAST({{x}} AS DOUBLE) * {_Q}) AS BIGINT)"


def _quantize(m: np.ndarray) -> np.ndarray:
    return np.floor(m.astype(np.float64) * _Q).astype(np.int64)


@query(
    "ann_cosine_scores",
    oracle=f"""
    SELECT b.vec_id, b.label,
           CAST(floor(1000 * ({_COS_SQL.format(a="a.embedding", b="b.embedding")})) AS BIGINT) AS cos_m
    FROM embeddings a, embeddings b
    WHERE a.vec_id = 0 AND b.vec_id <> 0
      AND ({_COS_SQL.format(a="a.embedding", b="b.embedding")}) >= 0.25
    """,
)
def ann_cosine_scores(spark, sf_dir) -> DataFrame:
    """Brute-force cosine against a query vector (vec_id=0), thresholded.
    The query vector is a 1-row broadcast cross join — the canonical
    'score all vectors' plan."""
    e = load_wide(spark, sf_dir, "embeddings")
    q = F.broadcast(e.filter("vec_id = 0").select(F.col("embedding").alias("q_emb")))
    cos = _cosine_expr("q_emb", "embedding")
    return (
        e.filter("vec_id <> 0")
        .crossJoin(q)
        .filter(cos >= 0.25)
        .select("vec_id", "label", F.floor(1000 * cos).cast("long").alias("cos_m"))
    )


@query(
    "ann_topk",
    oracle=f"""
    SELECT vec_id, label, cos_m FROM (
      SELECT b.vec_id, b.label,
             CAST(floor(1000 * ({_COS_SQL.format(a="a.embedding", b="b.embedding")})) AS BIGINT) AS cos_m
      FROM embeddings a, embeddings b
      WHERE a.vec_id = 0 AND b.vec_id <> 0
    ) ORDER BY cos_m DESC, vec_id LIMIT 20
    """,
)
def ann_topk(spark, sf_dir) -> DataFrame:
    """Brute-force top-k (k=20) by cosine — TakeOrderedAndProject, no global
    sort materialization. Deterministic tiebreak on vec_id."""
    e = load_wide(spark, sf_dir, "embeddings")
    q = F.broadcast(e.filter("vec_id = 0").select(F.col("embedding").alias("q_emb")))
    cos = _cosine_expr("q_emb", "embedding")
    return (
        e.filter("vec_id <> 0")
        .crossJoin(q)
        .select("vec_id", "label", F.floor(1000 * cos).cast("long").alias("cos_m"))
        .orderBy(F.col("cos_m").desc(), "vec_id")
        .limit(20)
    )


# near-dup LSH parameters: 16 hyperplanes in 4 bands of 4 — candidates must
# share (label, band, band-signature), never the raw label alone. _ND_CAP is
# the hard quadratic bound: a (label, band, sig) bucket larger than the cap
# is non-discriminative boilerplate (the analogue of textops' _DF_CAP hot-
# shingle cap) and is dropped whole. At corpus scale the plane count per
# band grows with data volume (sig space 2^r); the cap holds regardless.
_ND_PLANES = 16
_ND_BAND = 4  # planes per band
_ND_CAP = 128


def neardup_pairs(e: DataFrame, threshold: float = 0.35, cap: int = _ND_CAP) -> DataFrame:
    """Banded-LSH embedding near-dup over any (vec_id, label, embedding)
    DataFrame: signature once per vector (one NumPy matmul per Arrow batch),
    band-explode, capped in-bucket candidate expansion, then exact cosine on
    the deduped candidates only. One hot label or bucket can no longer go
    quadratic: bucket size is capped, so candidates <= #buckets * cap^2.

    Single-pass shape (the minhash_lsh_pairs pattern): buckets come from ONE
    groupBy over the signature stream — each bucket's sorted member list
    expands to i<j pairs with SQL lambdas. The former bucket SELF-join
    evaluated the signature pandas UDF (and the scan under it) twice.

    The exact-cosine stage dominates at high candidate counts (cap^2-bounded
    per bucket, but millions of pairs on fat-bucket data), so: the bucket
    table is re-widened before the pair explode (AQE coalesces the tiny
    bucket aggregate to ONE partition, which would run the cap^2 expansion
    single-task); the squared norms are HOISTED per vector; and the per-pair
    dot product runs as a vectorized NumPy pandas UDF that accumulates
    strictly in index order — bit-identical to the JVM aggregate(zip_with)
    fold (the ann_ivf_topk equivalence), asserted in
    tests/test_vectorops_scale.py. The UDF is marked non-deterministic so
    the optimizer cannot duplicate it below the threshold filter
    (guide §4.4)."""
    w = _hyperplanes(_ND_PLANES)

    wi = w.astype(np.int64)

    @pandas_udf("long")
    def sig_udf(emb: pd.Series) -> pd.Series:
        mq = _quantize(np.stack(emb.to_numpy()))  # exact int64 projection
        bits = (mq @ wi.T >= 0).astype(np.int64)
        return pd.Series((bits << np.arange(_ND_PLANES, dtype=np.int64)).sum(axis=1))

    n_bands = _ND_PLANES // _ND_BAND
    mask = (1 << _ND_BAND) - 1
    sigs = e.select("vec_id", "label", sig_udf(F.col("embedding")).alias("s"))
    banded = sigs.select(
        "vec_id",
        "label",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("s"), b * _ND_BAND)
                        .bitwiseAND(F.lit(mask))
                        .alias("sig"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bs"),
    ).select("vec_id", "label", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    buckets = (
        banded.groupBy("label", "band", "sig")
        .agg(F.sort_array(F.collect_list("vec_id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= cap))
        .repartition(e.sparkSession.sparkContext.defaultParallelism)
    )
    pairs = F.expr(
        "flatten(transform(ids, (x, i) ->"
        " transform(slice(ids, i + 2, size(ids)), y -> struct(x AS v1, y AS v2))))"
    )
    cand = (
        buckets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.v1").alias("v1"), F.col("p.v2").alias("v2"))
        .distinct()
    )
    ea = e.select(
        F.col("vec_id").alias("v1"),
        F.col("embedding").alias("emb_a"),
        _norm2_expr("embedding").alias("_n2a"),
    )
    eb = e.select(
        F.col("vec_id").alias("v2"),
        F.col("embedding").alias("emb_b"),
        _norm2_expr("embedding").alias("_n2b"),
    )

    @pandas_udf("double")
    def dot_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series(np.empty(0, dtype=np.float64))
        ma = np.stack(a.to_numpy()).astype(np.float64)
        mb = np.stack(b.to_numpy()).astype(np.float64)
        acc = np.zeros(len(ma))
        # strict index-order accumulation == aggregate(zip_with(...)) fold
        for d in range(ma.shape[1]):
            acc += ma[:, d] * mb[:, d]
        return pd.Series(acc)

    dot_nd = dot_udf.asNondeterministic()
    cos = dot_nd(F.col("emb_a"), F.col("emb_b")) / F.expr(
        "nullif(sqrt(_n2a) * sqrt(_n2b), 0D)"
    )
    return (
        cand.join(ea, "v1")
        .join(eb, "v2")
        .withColumn("_cos", cos)
        .filter(F.col("_cos") >= threshold)
        .select("v1", "v2", F.floor(1000 * F.col("_cos")).cast("long").alias("cos_m"))
    )


@query(
    "embedding_neardup",
    oracle=f"""
    WITH comps AS (
      SELECT vec_id, label, unnest(embedding) AS x,
             unnest(range(0, len(embedding))) AS dim
      FROM embeddings
    ), proj AS (
      SELECT c.vec_id, c.label, w.plane, sum({_QX_SQL.format(x="c.x")} * w.wt) AS p
      FROM comps c JOIN {_lsh_weights_sql(_ND_PLANES)} ON c.dim = w.dim
      GROUP BY c.vec_id, c.label, w.plane
    ), sig AS (
      SELECT vec_id, label, plane // {_ND_BAND} AS band,
             sum(CASE WHEN p >= 0 THEN 1 ELSE 0 END * (1 << (plane % {_ND_BAND}))) AS s
      FROM proj GROUP BY vec_id, label, plane // {_ND_BAND}
    ), ok AS (
      SELECT * FROM sig QUALIFY count(*) OVER (PARTITION BY label, band, s) <= {_ND_CAP}
    ), cand AS (
      SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2
      FROM ok a JOIN ok b
        ON a.label = b.label AND a.band = b.band AND a.s = b.s AND a.vec_id < b.vec_id
    )
    SELECT c.v1, c.v2,
           CAST(floor(1000 * ({_COS_SQL.format(a="a.embedding", b="b.embedding")})) AS BIGINT) AS cos_m
    FROM cand c
    JOIN embeddings a ON a.vec_id = c.v1
    JOIN embeddings b ON b.vec_id = c.v2
    WHERE ({_COS_SQL.format(a="a.embedding", b="b.embedding")}) >= 0.35
    """,
)
def embedding_neardup(spark, sf_dir) -> DataFrame:
    """Embedding near-dup pairs via banded hyperplane LSH within the label
    block: candidates must share a (label, band, signature) bucket, buckets
    above _ND_CAP members are dropped as non-discriminative, and the exact
    cosine runs only on surviving candidate pairs. The md5-derived planes
    make the DuckDB oracle reproduce the identical bucketing."""
    return neardup_pairs(load_wide(spark, sf_dir, "embeddings"))


_IVF_K = 8  # coarse cells; centroids = embeddings of vec_id 0.._IVF_K-1


@query(
    "ann_ivf_topk",
    oracle=f"""
    WITH centroids AS (
      SELECT vec_id AS cid, embedding AS cemb FROM embeddings WHERE vec_id < {_IVF_K}
    ),
    assigned AS (
      SELECT e.vec_id, e.label, e.embedding,
             arg_max(c.cid, {_COS_SQL.format(a="e.embedding", b="c.cemb")}) AS cell
      FROM embeddings e, centroids c
      GROUP BY e.vec_id, e.label, e.embedding
    ),
    qcell AS (SELECT cell FROM assigned WHERE vec_id = 0)
    SELECT a.vec_id, a.label,
           CAST(floor(1000 * ({_COS_SQL.format(a="q.embedding", b="a.embedding")})) AS BIGINT) AS cos_m
    FROM assigned a, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    WHERE a.cell = (SELECT cell FROM qcell) AND a.vec_id <> 0
    ORDER BY cos_m DESC, a.vec_id LIMIT 10
    """,
)
def ann_ivf_topk(spark, sf_dir) -> DataFrame:
    """IVF-style ANN scale path: coarse-quantize every vector to its nearest
    centroid cell (broadcast K centroids, argmax over cosine), then search
    only the query's cell. At 10^12 scale this turns a full scan into a
    1/K-cell scan; here the centroid set is deterministic (first K vectors)
    so the DuckDB oracle reproduces the same approximate result.

    Cell assignment is ZERO-shuffle: the K centroids are collected (K rows —
    metadata-scale) and shipped in a scalar pandas UDF that computes the
    argmax per Arrow batch (the ann_lsh_buckets shape). The former
    crossJoin+groupBy form shuffled the whole vector table K-wide on the
    embedding array key just to argmax over 8 broadcast centroids. Float
    semantics match the JVM `aggregate` fold bit-for-bit: dot products and
    norms accumulate strictly in index order (one vectorized add per dim),
    so the cell decision is identical to the SQL form's."""
    # plain load: every pass here is a KB-scale matmul + driver reduce; an
    # extra exchange per Lloyd pass costs more than the 1-task compute saves
    e = load(spark, sf_dir, "embeddings")
    cent = sorted(
        (r.cid, r.cemb)
        for r in e.filter(f"vec_id < {_IVF_K}")
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cemb"))
        .collect()
    )
    cids = np.array([c for c, _ in cent], dtype=np.int64)
    cmat = np.array([v for _, v in cent], dtype=np.float64)  # (K, DIM)
    # centroid norms with the same sequential accumulation as the SQL fold
    cnorm = np.zeros(len(cent))
    for d in range(cmat.shape[1]):
        cnorm += cmat[:, d] * cmat[:, d]
    cnorm = np.sqrt(cnorm)

    @pandas_udf("long")
    def cell_udf(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy()).astype(np.float64)  # (batch, DIM)
        dots = np.zeros((m.shape[0], cmat.shape[0]))
        vnorm = np.zeros(m.shape[0])
        # strict index-order accumulation == aggregate(zip_with(...)) fold
        for d in range(m.shape[1]):
            dots += m[:, d : d + 1] * cmat[None, :, d]
            vnorm += m[:, d] * m[:, d]
        # zero-norm clamp (same as kmeans_fit): a zero vector gets cos=0
        # everywhere and deterministically lands in cids[0] instead of an
        # all-NaN row whose argmax is an accident of NaN propagation
        cos = dots / np.maximum(np.sqrt(vnorm)[:, None] * cnorm[None, :], 1e-300)
        return pd.Series(cids[np.argmax(cos, axis=1)])

    assigned = e.select(
        "vec_id", "label", "embedding", cell_udf(F.col("embedding")).alias("cell")
    )
    q = assigned.filter("vec_id = 0").select(
        F.col("cell").alias("qcell"), F.col("embedding").alias("q_emb")
    )
    cos_q = _cosine_expr("q_emb", "embedding")
    return (
        assigned.crossJoin(F.broadcast(q))
        .filter((F.col("cell") == F.col("qcell")) & (F.col("vec_id") != 0))
        .select("vec_id", "label", F.floor(1000 * cos_q).cast("long").alias("cos_m"))
        .orderBy(F.col("cos_m").desc(), "vec_id")
        .limit(10)
    )


def kmeans_fit(
    spark,
    df: DataFrame,
    k: int = _IVF_K,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quantize: float | None = None,
) -> np.ndarray:
    """Distributed Lloyd k-means over an embedding column — the trained-
    centroid path for IVF (ann_ivf_topk's deterministic first-K centroids
    are the oracle-friendly stand-in; production IVF trains its codebook).

    Scale shape: per iteration ONE job — a mapInPandas pass emits per-batch
    partial sums (cell, count, sum-vector), k x dim x #partitions floats —
    KB-scale partials reduced driver-side into new centroids, broadcast back
    through the next task closure. No shuffle at all: the classic
    mapPartitions+driver-reduce k-means. Assignment is the same argmax-
    by-cosine kernel the IVF query uses. Empty cells keep their previous
    centroid. Init = the k rows with the smallest ids (deterministic).

    ``quantize``: snap each UPDATED centroid component to a 1/quantize grid
    (floor) after every iteration. Summation order differs between engines
    (NumPy partial-sum reduce vs SQL row-order avg) by ~1e-13; snapping to a
    much coarser grid makes the per-iteration drift non-compounding, so an
    independent SQL replay of Lloyd's reproduces the centroids bit-for-bit
    (up to an astronomically unlikely flip exactly at a grid boundary) —
    the property the ann_kmeans_topk oracle relies on. Empty cells are NOT
    re-snapped (they keep the previous, possibly raw-init, values — the SQL
    replay's coalesce does the same).

    Returns the (k, dim) centroid matrix."""
    import pandas as pd

    init = (
        df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    if len(init) < k:
        raise ValueError(f"kmeans_fit: k={k} exceeds input rows ({len(init)})")
    cmat = np.array([r[vec_col] for r in init], dtype=np.float64)
    dim = cmat.shape[1]

    for _ in range(iters):
        c = cmat.copy()
        # zero-norm guard: an all-zero vector gets cos=0 everywhere and a
        # deterministic argmax of cell 0 instead of NaN-poisoned assignments
        cnorm = np.maximum(np.sqrt((c * c).sum(axis=1)), 1e-300)

        def partials(batches, c=c, cnorm=cnorm):
            for b in batches:
                m = np.stack(b[vec_col].to_numpy()).astype(np.float64)
                cos = (m @ c.T) / (
                    np.maximum(np.sqrt((m * m).sum(axis=1)), 1e-300)[:, None]
                    * cnorm[None, :]
                )
                cell = np.argmax(cos, axis=1)
                rows = []
                for ci in np.unique(cell):
                    sel = m[cell == ci]
                    rows.append((int(ci), len(sel), sel.sum(axis=0).tolist()))
                yield pd.DataFrame(rows, columns=["cell", "n", "sums"])

        agg = (
            df.select(vec_col)
            .mapInPandas(partials, f"cell int, n long, sums array<double>")
            .collect()
        )
        counts = np.zeros(k)
        sums = np.zeros((k, dim))
        for r in agg:
            counts[r.cell] += r.n
            sums[r.cell] += np.array(r.sums)
        nonempty = counts > 0
        cmat[nonempty] = sums[nonempty] / counts[nonempty, None]
        if quantize:
            cmat[nonempty] = np.floor(cmat[nonempty] * quantize) / quantize
    return cmat


_KM_K = 8  # trained-codebook cells
_KM_ITERS = 2  # Lloyd iterations (unrolled in the SQL oracle)
_KM_Q = 1_000_000  # centroid grid: floor(val * 1e6) / 1e6 after each update


def _kmeans_oracle_sql(k: int = _KM_K, iters: int = _KM_ITERS) -> str:
    """DuckDB replay of the distributed Lloyd trainer, unrolled: c0 = the k
    smallest-id embeddings; per iteration, assign every vector to its
    argmax-cosine centroid (ties -> lowest cell, = NumPy argmax) and recompute
    each non-empty cell's centroid as the grid-snapped per-dim mean. The
    1e-6 grid snap is what makes the two engines' float drift (~1e-13 per
    sum) non-compounding — see kmeans_fit(quantize=...)."""
    parts = [
        f"""comps AS (
      SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
             unnest(range(0, len(embedding))) AS dim
      FROM embeddings
    ),
    vn AS (SELECT vec_id, sum(x * x) AS n2 FROM comps GROUP BY vec_id),
    init AS (
      SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cell
      FROM embeddings ORDER BY vec_id LIMIT {k}
    ),
    c0 AS (SELECT i.cell, m.dim, m.x AS val FROM init i JOIN comps m USING (vec_id))"""
    ]
    for n in range(iters + 1):
        parts.append(
            f"""d{n} AS (
      SELECT m.vec_id, c.cell, sum(m.x * c.val) AS dot, sum(c.val * c.val) AS cn2
      FROM comps m JOIN c{n} c USING (dim) GROUP BY m.vec_id, c.cell
    ),
    a{n} AS (
      SELECT vec_id, cell FROM (
        SELECT d.vec_id, d.cell,
               row_number() OVER (PARTITION BY d.vec_id
                 ORDER BY d.dot / greatest(sqrt(d.cn2) * sqrt(v.n2), 1e-300) DESC,
                          d.cell) AS rn
        FROM d{n} d JOIN vn v USING (vec_id)
      ) WHERE rn = 1
    )"""
        )
        if n < iters:
            parts.append(
                f"""m{n} AS (
      SELECT a.cell, m.dim, floor(avg(m.x) * {_KM_Q}) / {_KM_Q} AS val
      FROM a{n} a JOIN comps m USING (vec_id) GROUP BY a.cell, m.dim
    ),
    c{n + 1} AS (
      SELECT c.cell, c.dim, coalesce(u.val, c.val) AS val
      FROM c{n} c LEFT JOIN m{n} u USING (cell, dim)
    )"""
            )
    cos = _COS_SQL.format(a="q.embedding", b="e.embedding")
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT a.vec_id, e.label,
           CAST(floor(1000 * ({cos})) AS BIGINT) AS cos_m
    FROM a{iters} a
    JOIN embeddings e USING (vec_id),
         (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    WHERE a.cell = (SELECT cell FROM a{iters} WHERE vec_id = 0)
      AND a.vec_id <> 0
    ORDER BY cos_m DESC, a.vec_id LIMIT 10
    """
    )


@query("ann_kmeans_topk", oracle=_kmeans_oracle_sql())
def ann_kmeans_topk(spark, sf_dir) -> DataFrame:
    """Trained-codebook IVF ANN — the production path ann_ivf_topk's
    deterministic first-K centroids stand in for: fit k-means (k=8, 2 Lloyd
    iterations, smallest-id init, 1e-6 centroid grid) with the distributed
    mapInPandas + driver-reduce trainer, coarse-quantize every vector to its
    trained cell (scalar pandas UDF over the broadcast codebook — zero
    shuffle, the ann_ivf_topk shape), then search only the query's cell.
    The DuckDB oracle replays the full training loop unrolled, so the green
    row certifies the trained pipeline end-to-end, not just the search.
    Uses the plain (narrow) load: each Lloyd pass is a KB-scale matmul, so
    widening the scan adds a shuffle per pass for no compute win.

    Accepted residual risk: the 1e-6 centroid grid makes the CENTROIDS
    bit-identical across engines, but the per-vector assignment cosine is
    still a raw float (NumPy BLAS matmul here, per-dim GROUP BY sum in the
    oracle); a vector whose top-two cells tie within ~1e-13 of each other
    could argmax differently per engine. With synthetic unit-scale vectors
    the nearest observed top-two margin is orders of magnitude wider, so the
    flake probability is negligible but not zero — quantizing the assignment
    cosine too would close it at the cost of an extra pass."""
    e = load(spark, sf_dir, "embeddings")
    cmat = kmeans_fit(spark, e, k=_KM_K, iters=_KM_ITERS, quantize=_KM_Q)
    cnorm = np.maximum(np.sqrt((cmat * cmat).sum(axis=1)), 1e-300)

    @pandas_udf("long")
    def cell_udf(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy()).astype(np.float64)
        cos = (m @ cmat.T) / (
            np.maximum(np.sqrt((m * m).sum(axis=1)), 1e-300)[:, None] * cnorm[None, :]
        )
        return pd.Series(np.argmax(cos, axis=1).astype(np.int64))

    assigned = e.select(
        "vec_id", "label", "embedding", cell_udf(F.col("embedding")).alias("cell")
    )
    q = assigned.filter("vec_id = 0").select(
        F.col("cell").alias("qcell"), F.col("embedding").alias("q_emb")
    )
    cos_q = _cosine_expr("q_emb", "embedding")
    return (
        assigned.crossJoin(F.broadcast(q))
        .filter((F.col("cell") == F.col("qcell")) & (F.col("vec_id") != 0))
        .select("vec_id", "label", F.floor(1000 * cos_q).cast("long").alias("cos_m"))
        .orderBy(F.col("cos_m").desc(), "vec_id")
        .limit(10)
    )


@query(
    "ann_lsh_buckets",
    oracle=f"""
    WITH comps AS (
      SELECT vec_id, unnest(embedding) AS x,
             unnest(range(0, len(embedding))) AS dim
      FROM embeddings
    ), proj AS (
      SELECT c.vec_id, w.plane, sum({_QX_SQL.format(x="c.x")} * w.wt) AS p
      FROM comps c JOIN {_lsh_weights_sql()} ON c.dim = w.dim
      GROUP BY c.vec_id, w.plane
    )
    SELECT vec_id,
           CAST(sum(CASE WHEN p >= 0 THEN 1 ELSE 0 END * (1 << plane)) AS BIGINT) AS bucket
    FROM proj GROUP BY vec_id
    """,
)
def ann_lsh_buckets(spark, sf_dir) -> DataFrame:
    """Random-hyperplane LSH bucket per vector — the ANN scale path: bucket
    once (one NumPy matmul per Arrow batch), then search within buckets.
    Hyperplanes are md5-derived so the SQL oracle reproduces them exactly.
    Plain load: the projection is one light matmul per batch — widening the
    scan would add an exchange that costs more than the compute."""
    w = _hyperplanes()

    wi = w.astype(np.int64)

    @pandas_udf("long")
    def bucket_udf(emb: pd.Series) -> pd.Series:
        mq = _quantize(np.stack(emb.to_numpy()))  # (batch, DIM) exact int64
        proj = mq @ wi.T  # (batch, PLANES) — integer, order-independent
        bits = (proj >= 0).astype(np.int64)
        return pd.Series((bits << np.arange(_PLANES, dtype=np.int64)).sum(axis=1))

    e = load(spark, sf_dir, "embeddings")
    return e.select("vec_id", bucket_udf(F.col("embedding")).alias("bucket"))

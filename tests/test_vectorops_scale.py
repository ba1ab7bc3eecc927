"""Scale-shape assertions for the embedding near-dup operator.

embedding_neardup must stay bounded when one label (or one LSH bucket) is
hot: candidates come from capped (label, band, signature) buckets, never a
raw label self-join, so a degenerate corpus cannot go quadratic on a single
shuffle key.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from batch_pipeline_via_lakehouse_spark.plans.vectorops import _ND_CAP, neardup_pairs

SF_DIR = "/root/testdata/sf0.001"


def _df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, label string, embedding array<float>")


def test_neardup_hot_bucket_cannot_go_quadratic(spark):
    """A label whose members all collide into one LSH bucket (identical
    vectors) past the cap contributes ZERO candidate pairs — the bucket is
    dropped whole, like textops' hot-shingle cap — while genuine near-dups
    in normal-sized buckets are still found."""
    base = np.ones(64, dtype=np.float64)
    rows = [(i, "hot", base.tolist()) for i in range(_ND_CAP * 3)]
    v1 = ((np.arange(64) % 7) + 1.0) - 4.0  # mixed-sign, non-degenerate
    v2 = v1.copy()
    v2[0] += 1e-3  # near-identical: cosine ~ 1.0, same signature
    rows += [(1000, "ok", v1.tolist()), (1001, "ok", v2.tolist())]
    out = neardup_pairs(_df(spark, rows)).collect()
    pairs = {(r.v1, r.v2) for r in out}
    assert (1000, 1001) in pairs  # genuine near-dup survives
    # the 384-member hot bucket yields no pairs at all (384^2/2 would be 73k)
    assert all(v >= 1000 for p in pairs for v in p), pairs


def test_neardup_bucket_at_cap_still_pairs(spark):
    """Buckets at exactly the cap are kept: the cap drops only oversized
    (non-discriminative) buckets."""
    base = -np.ones(64, dtype=np.float64)
    rows = [(i, "edge", base.tolist()) for i in range(_ND_CAP)]
    out = neardup_pairs(_df(spark, rows)).collect()
    # all-identical vectors, bucket size == cap -> all C(cap,2) pairs, cos 1.0
    assert len(out) == _ND_CAP * (_ND_CAP - 1) // 2
    assert all(r.cos_m == 1000 for r in out)


def test_neardup_plan_has_no_cartesian_join(spark):
    """The candidate join must be a hash equi-join on (label, band, sig) —
    never a cartesian/broadcast-nested-loop over raw vectors."""
    from batch_pipeline_via_lakehouse_spark.plans.vectorops import embedding_neardup

    df = embedding_neardup(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_cell_assignment_is_shuffle_free(spark):
    """IVF cell assignment must be a projection (pandas-UDF argmax over the
    broadcast centroid matrix) — no Exchange keyed on the embedding array.
    The former crossJoin+groupBy form shuffled the vector table K-wide on
    the 64-float embedding as a grouping key."""
    import re

    from batch_pipeline_via_lakehouse_spark.plans.vectorops import ann_ivf_topk

    df = ann_ivf_topk(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for part in re.findall(r"hashpartitioning\([^)]*\)", plan):
        assert "embedding" not in part, plan[:4000]
    assert "HashAggregate" not in plan or "embedding#" not in plan.split("HashAggregate")[1][:200]


def test_kmeans_fit_matches_numpy_reference(spark):
    """Distributed Lloyd k-means (partial-sum mapInPandas + driver reduce)
    must converge to the same cells as a single-process NumPy reference run
    from the same deterministic init, on the same data."""
    import numpy as np

    from batch_pipeline_via_lakehouse_spark.plans.vectorops import kmeans_fit

    rng = np.random.default_rng(3)
    k, n, dim = 4, 400, 16
    centers = rng.normal(size=(k, dim)) * 5
    pts = np.concatenate(
        [centers[i] + rng.normal(size=(n // k, dim)) for i in range(k)]
    )
    rows = [(i, pts[i].tolist()) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    got = kmeans_fit(spark, df, k=k, iters=6)

    # reference: identical algorithm, single process
    cmat = pts[:k].astype(np.float64).copy()
    for _ in range(6):
        cos = (pts @ cmat.T) / (
            np.linalg.norm(pts, axis=1)[:, None] * np.linalg.norm(cmat, axis=1)[None, :]
        )
        cell = np.argmax(cos, axis=1)
        for c in range(k):
            if (cell == c).any():
                cmat[c] = pts[cell == c].mean(axis=0)

    # same final assignment (centroids can differ by float-summation order)
    def assign(c):
        cos = (pts @ c.T) / (
            np.linalg.norm(pts, axis=1)[:, None] * np.linalg.norm(c, axis=1)[None, :]
        )
        return np.argmax(cos, axis=1)

    assert (assign(got) == assign(cmat)).all()
    assert np.allclose(got, cmat, rtol=1e-9, atol=1e-9)


def test_cosine_survives_zero_norm_vectors(spark):
    """A zero-norm embedding must yield NULL cosine (filtered out of top-k),
    not a NaN that aborts the long cast under ANSI mode."""
    from batch_pipeline_via_lakehouse_spark.plans.vectorops import _cosine_expr

    rows = [
        (0, "q", [1.0] * 64),
        (1, "a", [0.0] * 64),                      # zero-norm
        (2, "b", [1.0] * 64),
    ]
    e = _df(spark, rows)
    from pyspark.sql import functions as F

    q = F.broadcast(e.filter("vec_id = 0").select(F.col("embedding").alias("q_emb")))
    cos = _cosine_expr("q_emb", "embedding")
    out = {
        r.vec_id: r.cos_m
        for r in e.crossJoin(q)
        .select("vec_id", F.floor(1000 * cos).cast("long").alias("cos_m"))
        .collect()
    }
    assert out[1] is None and out[2] == 1000  # no ANSI abort, NULL for zero-norm


def test_numpy_dot_fold_matches_jvm_aggregate_bitwise(spark):
    """The neardup cosine stage computes the pair dot product in a NumPy
    pandas UDF that accumulates strictly in index order; that must equal the
    JVM aggregate(zip_with(...)) fold BIT-FOR-BIT (same binary64 adds in the
    same order), or floor(1000*cos) could flip at a boundary. Adversarial
    magnitudes (1e10 vs 1e-10 mixes) make any re-association visible."""
    import struct

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from batch_pipeline_via_lakehouse_spark.plans.vectorops import _dot_expr

    rng = np.random.default_rng(7)
    rows = []
    for i in range(200):
        scale = 10.0 ** rng.integers(-10, 10, size=64)
        a = (rng.standard_normal(64) * scale).astype(np.float32)
        b = (rng.standard_normal(64) * scale[::-1]).astype(np.float32)
        rows.append((i, [float(x) for x in a], [float(x) for x in b]))
    df = spark.createDataFrame(rows, "i long, a array<float>, b array<float>")

    @pandas_udf("double")
    def dot_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.stack(a.to_numpy()).astype(np.float64)
        mb = np.stack(b.to_numpy()).astype(np.float64)
        acc = np.zeros(len(ma))
        for d in range(ma.shape[1]):
            acc += ma[:, d] * mb[:, d]
        return pd.Series(acc)

    got = (
        df.select("i", _dot_expr("a", "b").alias("jvm"), dot_udf("a", "b").alias("np"))
        .collect()
    )
    for r in got:
        assert struct.pack("<d", r.jvm) == struct.pack("<d", r.np), (r.i, r.jvm, r.np)


def test_neardup_candidate_stage_evaluates_signature_once(spark):
    """The banded-LSH candidate generation must aggregate the signature
    stream ONCE (bucket groupBy + lambda pair expansion), never via a bucket
    self-join that evaluates the signature pandas UDF per join side."""
    base = np.ones(64, dtype=np.float64)
    rows = [(i, "L", [float(x) for x in base + i * 1e-6]) for i in range(8)]
    plan = neardup_pairs(_df(spark, rows))._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("sig_udf") <= 1, plan

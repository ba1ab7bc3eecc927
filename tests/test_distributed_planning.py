"""Distributed (Spark-job) metadata planning must make identical decisions
to the driver-side manifest fold — the 10^6-file scale path for the planner
itself (VERDICT round-1 item 8)."""

from batch_pipeline_via_lakehouse_spark.datagen import TOKEN_SCHEMA, token_table_df
from batch_pipeline_via_lakehouse_spark.functions.checksums import content_checksum
from batch_pipeline_via_lakehouse_spark.sources.scan import (
    Pred,
    column_max,
    column_max_distributed,
    prune_files,
    prune_paths_distributed,
    scan_with_pruning,
    snapshot_file_count,
)
from batch_pipeline_via_lakehouse_spark.table import Table


def _table(spark, tmp_path, partitioned=True):
    t = Table.create(
        str(tmp_path / "t"), TOKEN_SCHEMA, partition_by=["source"] if partitioned else []
    )
    df = token_table_df(spark, 2000, seed=11)
    if not partitioned:
        df = df.repartitionByRange(8, "n_tok")
    t.append(df, num_files=4 if partitioned else None)
    return t


def test_distributed_prune_matches_driver_fold(spark, tmp_path):
    t = _table(spark, tmp_path, partitioned=True)
    pred_sets = [
        [Pred("source", "=", "wiki")],
        [Pred("n_tok", ">=", 4000)],
        [Pred("source", "in", ("wiki", "web")), Pred("n_tok", "between", 100, 6000)],
        [],  # no predicates: everything survives
    ]
    for preds in pred_sets:
        driver = sorted(f.path for f in prune_files(t.live_files(), preds))
        spark_job = sorted(prune_paths_distributed(spark, t, preds))
        assert spark_job == driver, preds


def test_distributed_prune_stat_based_unpartitioned(spark, tmp_path):
    t = _table(spark, tmp_path, partitioned=False)
    preds = [Pred("n_tok", ">=", 4000)]
    driver = sorted(f.path for f in prune_files(t.live_files(), preds))
    assert len(driver) < snapshot_file_count(t)  # pruning actually bites
    assert sorted(prune_paths_distributed(spark, t, preds)) == driver


def test_distributed_column_max_matches(spark, tmp_path):
    t = _table(spark, tmp_path)
    assert column_max_distributed(spark, t, "n_tok") == column_max(t, "n_tok")
    assert column_max_distributed(spark, t, "no_such_col") is None


def test_scan_with_pruning_distributed_same_rows(spark, tmp_path):
    t = _table(spark, tmp_path)
    preds = [Pred("source", "=", "wiki"), Pred("n_tok", ">", 50)]
    got = scan_with_pruning(spark, t, preds, distributed=True)
    expected = scan_with_pruning(spark, t, preds, distributed=False)
    assert content_checksum(got) == content_checksum(expected)


def test_snapshot_file_count_matches_live_files(spark, tmp_path):
    t = _table(spark, tmp_path)
    assert snapshot_file_count(t) == len(t.live_files())


def test_compaction_planning_distributed_matches_driver(spark, tmp_path):
    """The Spark-job small-file listing must yield the identical file set AND
    the identical FFD bin plan as the driver fold (resume keys line up
    regardless of which path planned)."""
    import batch_pipeline_via_lakehouse_spark.sources.scan as S
    from batch_pipeline_via_lakehouse_spark.operators.compaction import (
        plan_compaction,
        small_live_files,
    )

    t = _table(spark, tmp_path)
    thresh = 64 * 1024 * 1024
    a = small_live_files(t, thresh, distributed=False)
    b = small_live_files(t, thresh, spark=spark, distributed=True)
    assert sorted(f.path for f in a) == sorted(f.path for f in b)
    assert a  # listing is non-trivial

    def shape(plan):
        return {
            pk: [[f.path for f in group] for group in bins]
            for pk, bins in plan.bins.items()
        }

    plan_driver = plan_compaction(t, target_bytes=thresh)
    old = S.DISTRIBUTED_PLAN_THRESHOLD
    S.DISTRIBUTED_PLAN_THRESHOLD = 0  # force the Spark-job listing
    try:
        plan_dist = plan_compaction(t, target_bytes=thresh, spark=spark)
    finally:
        S.DISTRIBUTED_PLAN_THRESHOLD = old
    assert shape(plan_driver) == shape(plan_dist)
    assert plan_driver.n_bins > 0


def test_live_files_slim_distributed_matches_driver(spark, tmp_path):
    """The Spark-job slim listing must return the same descriptors as the
    driver fold, with stats restricted to exactly the requested columns."""
    from batch_pipeline_via_lakehouse_spark.sources.scan import live_files_slim

    t = _table(spark, tmp_path)
    full = {f.path: f for f in t.live_files()}
    slim = live_files_slim(spark, t, stat_cols=("n_tok",), distributed=True)
    assert {f.path for f in slim} == set(full)
    for f in slim:
        ref = full[f.path]
        assert (f.partition, f.rows, f.bytes) == (ref.partition, ref.rows, ref.bytes)
        assert set(f.stats) <= {"n_tok"}
        assert f.stats.get("n_tok") == ref.stats.get("n_tok")


def test_distributed_commit_keeps_zero_row_manifest(spark, tmp_path):
    """A zero-row manifest untouched by the removal set must be carried by
    NAME on the distributed commit path, exactly like the driver fold —
    dropping it would make the two paths produce different manifest lists."""
    import os

    import pyarrow.parquet as pq

    t = _table(spark, tmp_path)
    parent = t.current_snapshot_id()
    manifests = t.snapshot(parent).manifests
    src = pq.read_table(os.path.join(t.metadata_dir, manifests[0]))
    zero_name = "manifest-zerorow-test.parquet"
    pq.write_table(src.slice(0, 0), os.path.join(t.metadata_dir, zero_name))

    removed = {t.live_files()[0].path}
    out = t._filter_manifests_distributed(spark, [*manifests, zero_name], removed)
    assert zero_name in out  # carried by name, not silently dropped
    # and the removal itself still happened in some rewritten manifest
    kept_paths = set()
    for m in out:
        kept_paths |= {
            r["path"] for r in pq.read_table(os.path.join(t.metadata_dir, m)).to_pylist()
        }
    assert removed.isdisjoint(kept_paths)

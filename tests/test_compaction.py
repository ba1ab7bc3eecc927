"""M1: bin-packing compaction — content invariant, isolation, resume."""

import glob
import os

from batch_pipeline_via_lakehouse_spark.datagen import TOKEN_SCHEMA, token_table_df
from batch_pipeline_via_lakehouse_spark.functions.checksums import content_checksum
from batch_pipeline_via_lakehouse_spark.operators.compaction import compact, plan_compaction
from batch_pipeline_via_lakehouse_spark.table import Table


def _fragmented_table(spark, tmp_path, rows=2000, appends=4):
    t = Table.create(str(tmp_path / "tok"), TOKEN_SCHEMA, partition_by=["source"])
    per = rows // appends
    for k in range(appends):
        t.append(token_table_df(spark, per, seed=100 + k), num_files=4)
    return t


def test_compaction_preserves_content_exactly(spark, tmp_path):
    t = _fragmented_table(spark, tmp_path)
    pre_sid = t.current_snapshot_id()
    before = content_checksum(t.scan(spark))
    n_before = len(t.live_files())

    report = compact(spark, t, target_bytes=8 * 1024 * 1024)
    after = content_checksum(t.scan(spark))

    assert after == before  # includes exact token-array equality (xxhash64 of arrays)
    assert len(t.live_files()) < n_before
    assert report["files_in"] > report["files_out"]
    # snapshot isolation: pre-compaction reader still sees the old fileset
    assert content_checksum(t.scan(spark, snapshot_id=pre_sid)) == before
    pre_paths = {f.path for f in t.live_files(pre_sid)}
    post_paths = {f.path for f in t.live_files()}
    assert pre_paths != post_paths


def test_plan_only_packs_small_files(spark, tmp_path):
    t = _fragmented_table(spark, tmp_path)
    sizes = [f.bytes for f in t.live_files()]
    target = max(sizes) + 1  # everything is "small"
    plan = plan_compaction(t, target_bytes=target, small_threshold=1.0)
    assert plan.n_files > 0
    # with a tiny target nothing fits together -> no bins of >=2 files
    assert plan_compaction(t, target_bytes=1).n_bins == 0
    # every bin respects the partition boundary
    for pk, bins in plan.bins.items():
        for b in bins:
            assert len({str(sorted(f.partition.items())) for f in b}) == 1


def test_compaction_resume_no_duplicate_work(spark, tmp_path):
    t = _fragmented_table(spark, tmp_path)
    before = content_checksum(t.scan(spark))

    # simulate a kill after 2 file-groups
    r1 = compact(spark, t, target_bytes=8 * 1024 * 1024, job_id="job-x", fail_after_partitions=2)
    assert len(r1["executed"]) == 2
    mid = content_checksum(t.scan(spark))
    assert mid == before  # partial maintenance still preserves content

    r2 = compact(spark, t, target_bytes=8 * 1024 * 1024, job_id="job-x")
    assert r2["resumed_skipped"] == 2
    # no group executed twice across the two runs
    from batch_pipeline_via_lakehouse_spark.operators.commitlog import CommitLog

    log = CommitLog(t.root, "job-x")
    groups = [e["partition"] for e in log.entries()]
    assert len(groups) == len(set(groups))
    assert content_checksum(t.scan(spark)) == before
    # lineage recorded: every entry maps inputs -> outputs with metrics
    for e in log.entries():
        assert e["input_files"] and e["output_files"] and e["rows"] > 0
        assert e["tokens"] > 0 and e["seconds"] >= 0


def test_compacted_file_layout_on_disk(spark, tmp_path):
    t = _fragmented_table(spark, tmp_path)
    compact(spark, t, target_bytes=8 * 1024 * 1024)
    live = {os.path.join(t.root, f.path) for f in t.live_files()}
    on_disk = set(glob.glob(os.path.join(t.data_dir, "**", "*.parquet"), recursive=True))
    # old files still on disk (pinned readers) but superset of live
    assert live <= on_disk and len(on_disk) > len(live)

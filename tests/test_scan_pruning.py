"""Manifest pruning + incremental reads (S3/P6/A2/S5 equivalents)."""

from batch_pipeline_via_lakehouse_spark.datagen import TOKEN_SCHEMA, token_table_df
from batch_pipeline_via_lakehouse_spark.functions.checksums import content_checksum
from batch_pipeline_via_lakehouse_spark.sources.scan import (
    Pred,
    column_max,
    prune_files,
    scan_with_pruning,
)
from batch_pipeline_via_lakehouse_spark.streaming.incremental import read_incremental
from batch_pipeline_via_lakehouse_spark.table import Table


def test_partition_pruning_is_exact(spark, tmp_path):
    t = Table.create(str(tmp_path / "t"), TOKEN_SCHEMA, partition_by=["source"])
    t.append(token_table_df(spark, 1500, seed=5), num_files=4)
    all_files = t.live_files()
    pruned = prune_files(all_files, [Pred("source", "=", "wiki")])
    assert 0 < len(pruned) < len(all_files)
    assert all(f.partition["source"] == "wiki" for f in pruned)

    df = scan_with_pruning(spark, t, [Pred("source", "=", "wiki")])
    expected = t.scan(spark).filter("source = 'wiki'")
    assert content_checksum(df) == content_checksum(expected)


def test_minmax_stat_pruning_sound_and_effective(spark, tmp_path):
    t = Table.create(str(tmp_path / "t"), TOKEN_SCHEMA)
    # sorted-by-n_tok layout -> tight n_tok ranges per file -> pruning bites
    df = token_table_df(spark, 2000, seed=6).repartitionByRange(8, "n_tok")
    files = t.write_datafiles(df)
    t.commit(files, set(), "append")

    preds = [Pred("n_tok", ">=", 4000)]
    pruned = prune_files(t.live_files(), preds)
    assert len(pruned) < len(t.live_files())  # skipped at metadata level
    got = scan_with_pruning(spark, t, preds)
    expected = t.scan(spark).filter("n_tok >= 4000")
    assert content_checksum(got) == content_checksum(expected)


def test_column_max_from_manifests_no_scan(spark, tmp_path):
    t = Table.create(str(tmp_path / "t"), TOKEN_SCHEMA)
    t.append(token_table_df(spark, 500, seed=7))
    expected = t.scan(spark).agg({"n_tok": "max"}).collect()[0][0]
    assert column_max(t, "n_tok") == expected


def test_incremental_read_between_snapshots(spark, tmp_path):
    from batch_pipeline_via_lakehouse_spark.operators.compaction import compact

    t = Table.create(str(tmp_path / "t"), TOKEN_SCHEMA, partition_by=["source"])
    s1 = t.append(token_table_df(spark, 300, seed=1), num_files=3)
    s2 = t.append(token_table_df(spark, 200, seed=2), num_files=3)
    # maintenance between appends must not pollute the delta
    compact(spark, t, target_bytes=8 * 1024 * 1024)
    t.append(token_table_df(spark, 100, seed=3), num_files=2)

    delta = read_incremental(spark, t, since_snapshot=s1)
    assert delta.count() == 300  # the seed=2 and seed=3 appends only
    d2 = read_incremental(spark, t, since_snapshot=s2)
    assert d2.count() == 100
    full = read_incremental(spark, t, since_snapshot=None)
    assert full.count() == 600

"""M0: table create/append/scan/time-travel/overwrite.

Mirrors the reference's snapshot semantics exercise
(`notebooks/iceberg_curd/create_iceberg_table.ipynb` cells 6-11: three INSERT
commits, snapshot listing, SELECT ... FOR VERSION AS OF).
"""

from batch_pipeline_via_lakehouse_spark.datagen import TOKEN_SCHEMA, token_table_df
from batch_pipeline_via_lakehouse_spark.functions.checksums import content_checksum
from batch_pipeline_via_lakehouse_spark.table import Table


def _tok_checksum(df):
    # order-insensitive content digest incl. exact token arrays
    return content_checksum(df, ["doc_id", "tokens", "n_tok", "source"])


def test_append_scan_timetravel(spark, tmp_path):
    t = Table.create(str(tmp_path / "tok"), TOKEN_SCHEMA, partition_by=["source"])

    s1 = t.append(token_table_df(spark, 500, seed=1), num_files=4)
    s2 = t.append(token_table_df(spark, 300, seed=2), num_files=2)
    s3 = t.append(token_table_df(spark, 200, seed=3), num_files=2)
    assert [s.snapshot_id for s in t.snapshots()] == [s1, s2, s3]
    assert t.current_snapshot_id() == s3

    assert t.scan(spark).count() == 1000
    assert t.scan(spark, snapshot_id=s1).count() == 500
    assert t.scan(spark, snapshot_id=s2).count() == 800

    # content fidelity: scan == generated, token arrays byte-equal
    gen = token_table_df(spark, 500, seed=1)
    assert _tok_checksum(t.scan(spark, snapshot_id=s1)) == _tok_checksum(gen)


def test_partition_values_in_manifest(spark, tmp_path):
    t = Table.create(str(tmp_path / "tok"), TOKEN_SCHEMA, partition_by=["source"])
    t.append(token_table_df(spark, 400, seed=7))
    files = t.live_files()
    assert files and all("source" in f.partition for f in files)
    # every file's rows actually match its manifest partition value
    one = files[0]
    df = t.read_files(spark, [one])
    vals = [r["source"] for r in df.select("source").distinct().collect()]
    assert vals == [one.partition["source"]]
    # stats present for scalar cols
    assert one.stat("n_tok", "min") is not None
    assert one.rows > 0 and one.bytes > 0


def test_overwrite_replaces_but_old_snapshot_readable(spark, tmp_path):
    t = Table.create(str(tmp_path / "tok"), TOKEN_SCHEMA)
    s1 = t.append(token_table_df(spark, 100, seed=1))
    t.overwrite(token_table_df(spark, 50, seed=2))
    assert t.scan(spark).count() == 50
    assert t.scan(spark, snapshot_id=s1).count() == 100


def test_generator_deterministic(spark):
    a = token_table_df(spark, 200, seed=42, num_partitions=2)
    b = token_table_df(spark, 200, seed=42, num_partitions=7)
    assert _tok_checksum(a) == _tok_checksum(b)
    assert a.schema == TOKEN_SCHEMA


def test_metadata_tables(spark, tmp_path):
    t = Table.create(str(tmp_path / "tok"), TOKEN_SCHEMA, partition_by=["source"])
    t.append(token_table_df(spark, 100, seed=1), num_files=2)
    t.append(token_table_df(spark, 50, seed=2, start=100))
    snaps = t.metadata_df(spark, "snapshots")
    assert snaps.count() == 2
    assert [r["operation"] for r in snaps.orderBy("snapshot_id").collect()] == ["append", "append"]
    files = t.metadata_df(spark, "files")
    assert files.count() == len(t.live_files())
    total = files.agg({"rows": "sum"}).collect()[0][0]
    assert total == 150


def test_append_native_equals_append(spark, tmp_path):
    a = Table.create(str(tmp_path / "a"), TOKEN_SCHEMA, partition_by=["source"])
    b = Table.create(str(tmp_path / "b"), TOKEN_SCHEMA, partition_by=["source"])
    df = token_table_df(spark, 400, seed=21)
    a.append(df, num_files=3)
    b.append_native(df, num_files=3)
    assert _tok_checksum(a.scan(spark)) == _tok_checksum(b.scan(spark))
    fb = b.live_files()[0]
    assert fb.partition.get("source") and fb.stat("n_tok", "sum") is not None


def test_distributed_commit_matches_driver_commit(spark, tmp_path):
    """The Spark-job manifest filter in commit() must produce the identical
    snapshot as the driver fold: same live-file set, untouched manifests
    reused by name, touched manifests rewritten minus the removed entries."""
    import shutil

    src_root = str(tmp_path / "t")
    t = Table.create(src_root, TOKEN_SCHEMA, partition_by=["source"])
    for k in range(6):  # 6 append snapshots -> 6 manifests
        t.append(token_table_df(spark, 200, seed=300 + k), num_files=2)
    live = sorted(t.live_files(), key=lambda f: f.path)
    assert len(t.snapshot(t.current_snapshot_id()).manifests) >= 6
    # remove a subset that touches SOME manifests but not all
    removed = {f.path for f in live[:: max(1, len(live) // 5)]}

    clone_root = str(tmp_path / "t2")
    shutil.copytree(src_root, clone_root)
    t2 = Table.load(clone_root)

    before_manifests = set(t.snapshot(t.current_snapshot_id()).manifests)
    t.commit([], removed, "expire", distributed=False)
    t2.commit([], removed, "expire", spark=spark, distributed=True)

    live1 = {f.path for f in t.live_files()}
    live2 = {f.path for f in t2.live_files()}
    assert live1 == live2
    assert removed.isdisjoint(live1)
    # untouched manifests reused by name on BOTH paths
    kept1 = before_manifests & set(t.snapshot(t.current_snapshot_id()).manifests)
    kept2 = before_manifests & set(t2.snapshot(t2.current_snapshot_id()).manifests)
    assert kept1 == kept2
    assert kept1  # some manifests genuinely untouched
    # and the data content is identical
    assert content_checksum(t.scan(spark)) == content_checksum(t2.scan(spark))

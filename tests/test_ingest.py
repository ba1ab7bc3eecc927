"""Bronze ingestion: CSV/JSON scan + metadata columns + append (S1/S2/F1/K1)."""

import json


def test_csv_ingest_schema_on_read(spark, tmp_path):
    from batch_pipeline_via_lakehouse_spark.sources.ingest import ingest

    raw = tmp_path / "raw.csv"
    raw.write_text("symbol,price,volume\nAAA,1.5,100\nBBB,2.5,\n")
    table, sid = ingest(spark, str(raw), "csv", str(tmp_path / "bronze"))
    df = table.scan(spark)
    # schema-on-read: every source column is a string (reference bronze)
    types = dict(df.dtypes)
    assert types["symbol"] == "string" and types["price"] == "string"
    assert {"ingest_timestamp", "ingest_year", "ingest_month"} <= set(df.columns)
    assert df.count() == 2
    # second ingest appends a new snapshot
    _, sid2 = ingest(spark, str(raw), "csv", str(tmp_path / "bronze"))
    assert sid2 == sid + 1
    assert table.scan(spark).count() == 4


def test_json_ingest(spark, tmp_path):
    from batch_pipeline_via_lakehouse_spark.sources.ingest import ingest

    raw = tmp_path / "raw.json"
    raw.write_text("\n".join(json.dumps({"k": i, "v": f"x{i}"}) for i in range(5)))
    table, _ = ingest(spark, str(raw), "json", str(tmp_path / "bronze"))
    assert table.scan(spark).count() == 5
    assert table.partition_cols == ["ingest_year", "ingest_month"]

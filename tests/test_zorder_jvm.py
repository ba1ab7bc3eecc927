"""JVM codegen Z-key must be bit-identical to the Arrow/NumPy kernel."""

from pyspark.sql import functions as F

from batch_pipeline_via_lakehouse_spark.datagen import token_table_df
from batch_pipeline_via_lakehouse_spark.functions.zorder import cluster_key_column


def test_jvm_zkey_equals_arrow_zkey(spark):
    df = token_table_df(spark, 2000, seed=11)
    jvm3 = cluster_key_column("zorder", "n_tok", ["source", "doc_id"], 16, 8192, impl="jvm")
    arr3 = cluster_key_column("zorder", "n_tok", ["source", "doc_id"], 16, 8192, impl="arrow")
    jvm2 = cluster_key_column("zorder", "n_tok", ["doc_id"], 16, 8192, impl="jvm")
    arr2 = cluster_key_column("zorder", "n_tok", ["doc_id"], 16, 8192, impl="arrow")
    bad = df.select(
        jvm3.alias("j3"), arr3.alias("a3"), jvm2.alias("j2"), arr2.alias("a2")
    ).filter("j3 <> a3 OR j2 <> a2")
    assert bad.count() == 0

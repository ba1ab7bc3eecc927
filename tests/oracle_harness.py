"""Local replica of the driver's Spark-vs-DuckDB compare.

Row count + sorted-column-name schema + order-insensitive value compare
(columns sorted by name, rows sorted by all columns, exact match after
string normalization).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            df[c] = col.astype(str)
        elif np.issubdtype(col.dtype, np.floating):
            df[c] = col.round(6)
        elif str(col.dtype).startswith("datetime"):
            df[c] = col.astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, sql: str, sf_dir: str) -> tuple[bool, str]:
    got = _normalize(spark_df.toPandas())
    con = duck_con(sf_dir)
    exp = _normalize(con.execute(sql).df())
    con.close()
    if list(got.columns) != list(exp.columns):
        return False, f"columns differ: spark={list(got.columns)} duck={list(exp.columns)}"
    if len(got) != len(exp):
        return False, f"row count differs: spark={len(got)} duck={len(exp)}"
    try:
        pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=False, rtol=0, atol=1e-6)
    except AssertionError as e:
        diff_mask = ~(got.astype(str).eq(exp.astype(str))).all(axis=1)
        sample = ""
        if diff_mask.any():
            i = diff_mask.idxmax()
            sample = f"\nfirst diff row {i}:\n spark: {got.loc[i].to_dict()}\n duck:  {exp.loc[i].to_dict()}"
        return False, str(e).splitlines()[0] + sample
    return True, "ok"

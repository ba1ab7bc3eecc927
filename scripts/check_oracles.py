"""Iterate all registered queries against their DuckDB oracles at sf0.01.

Usage: python scripts/check_oracles.py [name ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from batch_pipeline_via_lakehouse_spark.session import get_spark  # noqa: E402
from batch_pipeline_via_lakehouse_spark.plans import queries as q  # noqa: E402
from oracle_harness import compare  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main():
    names = sys.argv[1:] or list(q.QUERIES)
    spark = get_spark("oracle-check", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    for name in names:
        fn = q.QUERIES[name]
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            if name in q.ORACLES:
                ok, msg = compare(df, q.ORACLES[name], SF_DIR)
            else:
                n = df.count()
                ok, msg = n >= 0, f"rows-only: {n} rows"
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {e}"
        status = "OK  " if ok else "FAIL"
        print(f"{status} {name:28s} {time.time()-t0:6.1f}s  {msg[:400]}")
        if not ok:
            failures.append(name)
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    if failures:
        print("failed:", failures)
        sys.exit(1)


if __name__ == "__main__":
    main()

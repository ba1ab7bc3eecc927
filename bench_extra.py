"""Extra benchmarks for the optimization rounds (bench.py stays frozen).

Times individual queries with median-of-N, optionally through the noop sink
(guide §1.4) so the computation is isolated from row counting, and captures
.explain("formatted") per query.

Usage:
  python bench_extra.py [--sf DIR] [--reps N] [--noop] [--explain-dir D] [name ...]

Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from batch_pipeline_via_lakehouse_spark.plans.queries import QUERIES  # noqa: E402
from batch_pipeline_via_lakehouse_spark.session import get_spark  # noqa: E402

DEFAULT_SET = [
    "pricing_summary", "filter_project", "topn_per_group", "dedup_latest",
    "forward_fill", "rolling_window", "join_enrich", "asof_join",
    "merge_upsert", "grouped_features", "exact_dedup", "ngram_jaccard_pairs",
    "minhash_lsh_pairs", "dedup_clusters", "simhash", "langid",
    "repetition_ratio", "decontaminate", "quality_score", "ann_topk",
    "ann_kmeans_topk", "embedding_neardup", "ann_lsh_buckets",
    "pack_sequences", "pack_windows", "stratified_sample",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--noop", action="store_true", help="materialize via noop sink instead of count()")
    ap.add_argument("--explain-dir", default=None, help="write <name>.txt explain('formatted') per query")
    ap.add_argument("--out", default=None, help="write JSON results to this file")
    args = ap.parse_args()

    names = args.names or DEFAULT_SET
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-extra", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # same warmup as bench.py
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = args.sf
    for name in ("pricing_summary", "ann_lsh_buckets", "grouped_features"):
        QUERIES[name](spark, warm_dir).count()

    results: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = fn(spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.explain_dir, f"{name}.txt"), "w") as fh:
                fh.write(txt)
        passes = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            df = fn(spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = df.count()
            passes.append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        med = sorted(passes)[len(passes) // 2]
        results[name] = {"median": med, "passes": passes, "rows": n}
        print(f"{name:26s} median {med:8.3f}s  {passes}", flush=True)

    total = round(sum(r["median"] for r in results.values()), 3)
    print(f"TOTAL (median sum): {total}s over {len(results)} queries")
    if args.out:
        with open(args.out, "w") as fh:
            json.dump({"sf": args.sf, "reps": args.reps, "noop": args.noop,
                       "results": results, "total": total}, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()

"""Control-normalized maintenance bench (VERDICT r05 Next #1).

The sandbox host has episodic >=16-way slowdown windows that have made the
maintenance tokens/s number incomparable across rounds twice. This harness
interleaves a FIXED pure-CPU control (256 items x 200k chained md5 through a
fork pool — the `scripts/isolated_exchange_bench.py` cpu mode) with each
timed maintenance pass and reports

    tokens_per_s_normalized = tokens_per_s * (control_s / CONTROL_REF_S)^-1
                            = tokens_per_s * CONTROL_REF_S / control_s

so a pass taken in a slow window is scaled by how much slower the host ran
the fixed CPU work in that same window. CONTROL_REF_S pins the reference
window; it was measured on this host in a clean window (median of the
fastest control triplet observed in round 6).

Usage: python bench_maint_extra.py [--rows N] [--passes K] [--target-bytes B]
Env: SPARK_GRAFT_CPUS as in bench.py. Prints one JSON line.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys
import tempfile
import time
from multiprocessing import get_context

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Fixed reference: median control_s in the cleanest window observed while
# calibrating this harness (round 6). All normalized numbers are relative to
# this host state; cross-round comparisons should use the SAME constant.
CONTROL_REF_S = None  # filled from --control-ref or measured fresh


def _cpu_item(_i: int) -> int:
    h = b"x" * 64
    for _ in range(200_000):
        h = hashlib.md5(h).digest()
    return len(h)


def cpu_control(cpus: int, items: int = 256, reps: int = 3) -> list[float]:
    """Median-able wall times for the fixed md5 workload on a fork pool."""
    ctx = get_context("fork")
    times = []
    with ctx.Pool(cpus) as pool:
        pool.map(_cpu_item, range(cpus))  # warm the pool
        for _ in range(reps):
            t0 = time.monotonic()
            pool.map(_cpu_item, range(items), chunksize=1)
            times.append(round(time.monotonic() - t0, 3))
    return times


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_200_000)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--target-bytes", type=int, default=8 * 1024 * 1024)
    ap.add_argument("--control-ref", type=float, default=None,
                    help="CONTROL_REF_S override; default = this run's fastest control median")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from batch_pipeline_via_lakehouse_spark.bench_core import (
        build_fragmented_table,
        run_maintenance_on_existing,
    )
    from batch_pipeline_via_lakehouse_spark.session import get_spark

    spark = get_spark("bench-maint-norm", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(
        prefix="bench-norm-",
        dir=os.environ.get("SPARK_GRAFT_BENCH_DIR", "/dev/shm" if os.path.isdir("/dev/shm") else None),
    )
    src = os.path.join(base, "src")
    build_fragmented_table(spark, src, args.rows, fragment_files=64)

    passes = []
    for i in range(args.passes):
        ctl_before = cpu_control(cpus)
        dst = os.path.join(base, f"run{i}")
        shutil.copytree(src, dst)
        r = run_maintenance_on_existing(
            spark, dst, target_bytes=args.target_bytes, warmup=(i == 0)
        )
        shutil.rmtree(dst, ignore_errors=True)
        ctl_after = cpu_control(cpus)
        ctl = sorted(ctl_before + ctl_after)[len(ctl_before + ctl_after) // 2]
        passes.append(
            {
                "tokens_per_s": r["tokens_per_s"],
                "maintenance_s": r["maintenance_s"],
                "compact_s": r["compact_s"],
                "cluster_s": r["cluster_s"],
                "control_s": ctl,
                "control_before": ctl_before,
                "control_after": ctl_after,
            }
        )
        print(f"# pass {i}: {passes[-1]}", file=sys.stderr)
    shutil.rmtree(base, ignore_errors=True)

    ref = args.control_ref or min(p["control_s"] for p in passes)
    for p in passes:
        p["tokens_per_s_normalized"] = round(p["tokens_per_s"] * p["control_s"] / ref, 1)
    med = sorted(passes, key=lambda p: p["tokens_per_s_normalized"])[len(passes) // 2]
    out = {
        "metric": "maintenance tokens/s, control-normalized",
        "rows": args.rows,
        "cpus": cpus,
        "control_ref_s": ref,
        "passes": passes,
        "tokens_per_s_raw_median": sorted(p["tokens_per_s"] for p in passes)[len(passes) // 2],
        "tokens_per_s_normalized_median": med["tokens_per_s_normalized"],
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

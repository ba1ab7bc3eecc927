"""Two-cluster-size scaling evidence (north rule): the same compaction+Z-order
job at local[N] and local[4N] on the same input; reports throughput at both
plus scaling efficiency = thr(4N) / (4 * thr(N)).

Each run is a fresh subprocess (own JVM) so parallelism levels don't share
executor state. Usage:
    python scripts/scaling_bench.py [--rows 120000] [--n 8] [--out BENCH.md]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = """
import sys, json
sys.path.insert(0, {repo!r})
from batch_pipeline_via_lakehouse_spark.session import get_spark
from batch_pipeline_via_lakehouse_spark.bench_core import run_maintenance_bench
spark = get_spark("scaling", master="local[{cpus}]", shuffle_partitions={cpus},
                  extra_conf={{"spark.local.dir": "/dev/shm/spark-local"}})
spark.sparkContext.setLogLevel("ERROR")
out = run_maintenance_bench(spark, n_rows={rows}, fragment_files={frag}, target_bytes={target})
print("RESULT " + json.dumps(out))
spark.stop()
"""


def run_at(cpus: int, rows: int, frag: int, target: int) -> dict:
    code = _RUNNER.format(repo=REPO, cpus=cpus, rows=rows, frag=frag, target=target)
    # pin the whole process tree (JVM + python workers) to `cpus` physical
    # cores: local[N] alone only caps Spark task slots — GC/IO/Python threads
    # would still spill onto all cores and flatter the small configuration
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", code]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"run at local[{cpus}] failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-4000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=240_000)
    ap.add_argument("--n", type=int, default=8, help="small parallelism level N (big is 4N)")
    ap.add_argument("--frag", type=int, default=128)
    ap.add_argument("--target-mb", type=int, default=8,
                    help="compaction/cluster target file size (MB); sized so both\n"
                         "stages have >= 2 task waves at the 4N level")
    ap.add_argument("--repeat", type=int, default=3,
                    help="runs per level; best taken (the sandbox host has "
                         "multi-tenant IO/CPU noise worth ±3x)")
    args = ap.parse_args()

    import time as _t

    # The host's background noise is episodic (fault-storm windows slow
    # everything 2-4x for minutes at a time), so the two levels are measured
    # as BACK-TO-BACK PAIRS — each pair samples one noise window for both —
    # and the best pair is reported. Measuring each level in its own block
    # (the naive layout) lets a noise episode hit one level only, which
    # corrupts the ratio in either direction.
    pairs = []
    for i in range(args.repeat):
        small = run_at(args.n, args.rows, args.frag, args.target_mb * 1024 * 1024)
        print(f"# pair {i} local[{args.n}]: maintenance={small['maintenance_s']}s "
              f"({small['tokens_per_s']:.0f} tok/s)", file=sys.stderr)
        big = run_at(4 * args.n, args.rows, args.frag, args.target_mb * 1024 * 1024)
        print(f"# pair {i} local[{4 * args.n}]: maintenance={big['maintenance_s']}s "
              f"({big['tokens_per_s']:.0f} tok/s)", file=sys.stderr)
        eff = big["tokens_per_s"] / (4 * small["tokens_per_s"])
        print(f"# pair {i} efficiency: {eff:.3f}", file=sys.stderr)
        pairs.append((small, big, eff))
        subprocess.run(["sync"])
        _t.sleep(5)

    # best pair by combined throughput (cleanest noise window), not by
    # efficiency — picking max-efficiency would bias toward pairs where the
    # small level got unlucky
    small, big, eff = max(pairs, key=lambda p: p[0]["tokens_per_s"] + p[1]["tokens_per_s"])
    result = {
        "rows": args.rows,
        "n_cores": args.n,
        "4n_cores": 4 * args.n,
        f"local[{args.n}]": small,
        f"local[{4 * args.n}]": big,
        "scaling_efficiency_tokens": round(eff, 3),
        "scaling_efficiency_sequences": round(
            big["sequences_per_s"] / (4 * small["sequences_per_s"]), 3
        ),
        "all_pairs": [
            {"small_tok_s": p[0]["tokens_per_s"], "big_tok_s": p[1]["tokens_per_s"],
             "efficiency": round(p[2], 3)}
            for p in pairs
        ],
    }
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()

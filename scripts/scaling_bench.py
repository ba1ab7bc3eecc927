"""Two-cluster-size scaling evidence (north rule): the same maintenance job
at local[N] and local[4N] on byte-identical input; reports throughput at both
plus scaling efficiency = thr(4N) / (4 * thr(N)).

Protocol (v2 — matches how a real maintenance job runs):

1. the fragmented token table is built ONCE, untimed, at full parallelism
   (maintenance operates on tables someone else wrote; ingest is not part of
   the measured job);
2. each level runs in a FRESH subprocess (own JVM) pinned with ``taskset`` to
   exactly N cores (local[N] caps task slots but not GC/IO/Python threads),
   against its own COPY of the built table, with an untimed warmup pass that
   spawns workers / JITs hot paths before the timed compact+cluster;
3. levels are measured as BACK-TO-BACK PAIRS — the host's background noise is
   episodic (fault-storm windows slow everything 2-4x for minutes), so each
   pair samples one noise window for both levels;
4. the headline is the MEDIAN pair efficiency with the full spread reported —
   never a selected best pair.

Usage:
    python scripts/scaling_bench.py [--rows 480000] [--n 8] [--repeat 5]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_BUILD = """
import sys, json
sys.path.insert(0, {repo!r})
from batch_pipeline_via_lakehouse_spark.session import get_spark
from batch_pipeline_via_lakehouse_spark.bench_core import build_fragmented_table
spark = get_spark("build", shuffle_partitions=32,
                  extra_conf={{"spark.local.dir": "/dev/shm/spark-local",
                               "spark.ui.showConsoleProgress": "false"}})
spark.sparkContext.setLogLevel("ERROR")
build_fragmented_table(spark, {root!r}, {rows}, fragment_files={frag})
print("BUILT")
spark.stop()
"""

_RUNNER = """
import sys, json, shutil
sys.path.insert(0, {repo!r})
shutil.copytree({src!r}, {dst!r})
from batch_pipeline_via_lakehouse_spark.session import get_spark
from batch_pipeline_via_lakehouse_spark.bench_core import run_maintenance_on_existing
spark = get_spark("scaling", master="local[{cpus}]", shuffle_partitions={cpus},
                  extra_conf={{"spark.local.dir": "/dev/shm/spark-local",
                               "spark.ui.showConsoleProgress": "false"}})
spark.sparkContext.setLogLevel("ERROR")
out = run_maintenance_on_existing(spark, {dst!r}, target_bytes={target})
print("RESULT " + json.dumps(out))
spark.stop()
shutil.rmtree({dst!r}, ignore_errors=True)
"""


def _run(code: str, cpus: int | None = None) -> str:
    cmd = [sys.executable, "-c", code]
    if cpus is not None:
        # pin the whole process tree (JVM + python workers) to `cpus` cores
        cmd = ["taskset", "-c", f"0-{cpus - 1}", *cmd]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    if proc.returncode != 0:
        raise RuntimeError(f"subprocess failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-4000:]}")
    return proc.stdout


def run_at(cpus: int, src_root: str, target: int, work_dir: str) -> dict:
    dst = os.path.join(work_dir, f"run-{cpus}")
    shutil.rmtree(dst, ignore_errors=True)
    out = _run(
        _RUNNER.format(repo=REPO, src=src_root, dst=dst, cpus=cpus, target=target),
        cpus=cpus,
    )
    for line in out.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line:\n{out[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=480_000)
    ap.add_argument("--n", type=int, default=8, help="small parallelism level N (big is 4N)")
    ap.add_argument("--frag", type=int, default=256)
    ap.add_argument("--target-mb", type=int, default=8,
                    help="compaction/cluster target file size (MB); sized so both\n"
                         "stages have >= 2 task waves at the 4N level")
    ap.add_argument("--repeat", type=int, default=5, help="back-to-back pairs to run")
    ap.add_argument("--work-dir", default=None)
    args = ap.parse_args()

    base = args.work_dir or tempfile.mkdtemp(
        prefix="scaling-", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    os.makedirs(base, exist_ok=True)
    src_root = os.path.join(base, "tok-src")
    if not os.path.isdir(src_root):
        print(f"# building {args.rows}-row fragmented table once ...", file=sys.stderr)
        _run(_BUILD.format(repo=REPO, root=src_root, rows=args.rows, frag=args.frag))

    target = args.target_mb * 1024 * 1024
    pairs = []
    for i in range(args.repeat):
        small = run_at(args.n, src_root, target, base)
        print(f"# pair {i} local[{args.n}]: maintenance={small['maintenance_s']}s "
              f"({small['tokens_per_s']:.0f} tok/s)", file=sys.stderr)
        big = run_at(4 * args.n, src_root, target, base)
        print(f"# pair {i} local[{4 * args.n}]: maintenance={big['maintenance_s']}s "
              f"({big['tokens_per_s']:.0f} tok/s)", file=sys.stderr)
        eff = big["tokens_per_s"] / (4 * small["tokens_per_s"])
        print(f"# pair {i} efficiency: {eff:.3f}", file=sys.stderr)
        pairs.append((small, big, eff))

    effs = sorted(p[2] for p in pairs)
    med_eff = statistics.median(effs)
    # representative runs for the table: the pair whose efficiency is the median
    med_pair = min(pairs, key=lambda p: abs(p[2] - med_eff))
    result = {
        "protocol": "build-once; per-level fresh pinned JVM + table copy + "
                    "untimed warmup; timed compact+cluster; median of pairs",
        "rows": args.rows,
        "n_cores": args.n,
        "4n_cores": 4 * args.n,
        f"local[{args.n}]": med_pair[0],
        f"local[{4 * args.n}]": med_pair[1],
        "scaling_efficiency_tokens_median": round(med_eff, 3),
        "scaling_efficiency_spread": [round(effs[0], 3), round(effs[-1], 3)],
        "n_pairs": len(pairs),
        "all_pairs": [
            {"small_tok_s": p[0]["tokens_per_s"], "big_tok_s": p[1]["tokens_per_s"],
             "small_maint_s": p[0]["maintenance_s"], "big_maint_s": p[1]["maintenance_s"],
             "efficiency": round(p[2], 3)}
            for p in pairs
        ],
    }
    print(json.dumps(result, indent=2))
    if args.work_dir is None:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Isolated data-path scaling evidence: the clustering map-stage work (native
parquet read -> vectorized key -> sort -> staged write) measured WITHOUT the
rest of the maintenance job, at local[N] vs local[4N], plus two controls:

- ``pool``: the identical per-file work through a raw multiprocessing pool —
  no Spark, no JVM — isolating pure host behavior under concurrency;
- ``cpu``: a pure-CPU md5 loop through the same pool — isolating the host's
  compute scaling from its memory/fault-path scaling.

Together with scripts/scaling_bench.py these decompose the end-to-end number:
  full job efficiency = (host data-path ceiling) x (engine overhead factor),
and the controls show where this VM's ceiling sits (CPU scales ~linearly;
allocation-heavy data work serializes in the virtualized kernel's fault path).

Usage:
    python scripts/isolated_exchange_bench.py --table /dev/shm/scaling-X/tok-src
                                              [--n 8] [--reps 3]
Builds a default 480k-row table when --table is omitted.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_EXCHANGE = """
import sys, os, time, json
sys.path.insert(0, {repo!r})
from batch_pipeline_via_lakehouse_spark.session import get_spark
from batch_pipeline_via_lakehouse_spark.table import Table

t = Table.load({table!r})
files = [os.path.join(t.root, f.path) for f in t.live_files()]
stage = {stage_dir!r}
os.makedirs(stage, exist_ok=True)

def job(batches):
    import numpy as np, pyarrow as pa, pyarrow.parquet as pq, uuid
    from batch_pipeline_via_lakehouse_spark.functions.zorder import fnv1a64, native_cluster_key
    pa.set_cpu_count(1)
    for b in batches:
        for v in b.column(0).to_pylist():
            tbl = pq.read_table(files[v], use_threads=False)
            k = native_cluster_key("zorder", tbl.column("n_tok").to_numpy(),
                                   [fnv1a64(tbl.column("doc_id"))], 16.0, 8192.0)
            order = np.argsort(k, kind="stable")
            stbl = tbl.take(pa.array(order))
            out = os.path.join(stage, uuid.uuid4().hex + ".parquet")
            pq.write_table(stbl, out, compression="lz4")
            os.remove(out)
            yield pa.RecordBatch.from_pydict({{"n": pa.array([tbl.num_rows], pa.int64())}})

spark = get_spark("iso", master="local[{cpus}]", shuffle_partitions={cpus},
                  extra_conf={{"spark.local.dir": "/dev/shm/spark-local",
                               "spark.ui.showConsoleProgress": "false"}})
spark.sparkContext.setLogLevel("ERROR")
# warm workers (capped by file count — a small table must not index past it)
nw = min({cpus}, len(files))
spark.range(0, nw, numPartitions=nw).mapInArrow(job, "n long").collect()
times = []
for _ in range({reps}):
    t0 = time.monotonic()
    spark.range(0, len(files), numPartitions=len(files)).mapInArrow(job, "n long").collect()
    times.append(time.monotonic() - t0)
print("RESULT " + json.dumps({{"times": times, "files": len(files)}}))
spark.stop()
"""

_POOL = """
import sys, os, time, json
sys.path.insert(0, {repo!r})
from multiprocessing import get_context
from batch_pipeline_via_lakehouse_spark.session import _tune_allocators
_tune_allocators()
from batch_pipeline_via_lakehouse_spark.table import Table

t = Table.load({table!r})
files = [os.path.join(t.root, f.path) for f in t.live_files()]
stage = {stage_dir!r}
os.makedirs(stage, exist_ok=True)

def work(path):
    import numpy as np, pyarrow as pa, pyarrow.parquet as pq, uuid
    from batch_pipeline_via_lakehouse_spark.functions.zorder import fnv1a64, native_cluster_key
    pa.set_cpu_count(1)
    tbl = pq.read_table(path, use_threads=False)
    k = native_cluster_key("zorder", tbl.column("n_tok").to_numpy(),
                           [fnv1a64(tbl.column("doc_id"))], 16.0, 8192.0)
    order = np.argsort(k, kind="stable")
    stbl = tbl.take(pa.array(order))
    out = os.path.join(stage, uuid.uuid4().hex + ".parquet")
    pq.write_table(stbl, out, compression="lz4")
    os.remove(out)
    return tbl.num_rows

def cpu_work(i):
    import hashlib
    h = b"x" * 64
    for _ in range(200_000):
        h = hashlib.md5(h).digest()
    return len(h)

fn = cpu_work if {cpu_mode} else work
# FIXED total work at every level — the efficiency formula divides times, so
# per-level work must be identical ({four_n} * 8 items = 8 waves at the 4N level)
items = list(range({four_n} * 8)) if {cpu_mode} else files
ctx = get_context("fork")
times = []
with ctx.Pool({cpus}) as pool:
    pool.map(fn, items[:{cpus}])  # warm
    for _ in range({reps}):
        t0 = time.monotonic()
        pool.map(fn, items, chunksize=1)
        times.append(time.monotonic() - t0)
print("RESULT " + json.dumps({{"times": times, "files": len(items)}}))
"""


def run(code: str, cpus: int) -> dict:
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", code]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"failed:\n{proc.stdout[-1500:]}\n{proc.stderr[-3000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", default=None, help="existing token table root")
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--rows", type=int, default=480_000)
    args = ap.parse_args()

    base = tempfile.mkdtemp(prefix="iso-", dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    table = args.table
    if table is None:
        table = os.path.join(base, "tok-src")
        build = (
            "import sys; sys.path.insert(0, {repo!r})\n"
            "from batch_pipeline_via_lakehouse_spark.session import get_spark\n"
            "from batch_pipeline_via_lakehouse_spark.bench_core import build_fragmented_table\n"
            "from batch_pipeline_via_lakehouse_spark.operators.compaction import compact\n"
            "from batch_pipeline_via_lakehouse_spark.table import Table\n"
            "spark = get_spark('b', shuffle_partitions=32)\n"
            "spark.sparkContext.setLogLevel('ERROR')\n"
            "t = build_fragmented_table(spark, {root!r}, {rows}, fragment_files=256)\n"
            "compact(spark, t, target_bytes=8*1024*1024)\n"
            "print('BUILT')\nspark.stop()\n"
        ).format(repo=REPO, root=table, rows=args.rows)
        subprocess.run([sys.executable, "-c", build], check=True, capture_output=True, text=True)

    out = {"table": table, "n": args.n, "4n": 4 * args.n}
    for mode in ("exchange", "pool", "cpu"):
        per_level = {}
        for cpus in (args.n, 4 * args.n):
            stage_dir = os.path.join(base, f"stage-{mode}-{cpus}")
            if mode == "exchange":
                code = _EXCHANGE.format(repo=REPO, table=table, stage_dir=stage_dir,
                                        cpus=cpus, reps=args.reps)
            else:
                code = _POOL.format(repo=REPO, table=table, stage_dir=stage_dir,
                                    cpus=cpus, reps=args.reps, four_n=4 * args.n,
                                    cpu_mode="True" if mode == "cpu" else "False")
            r = run(code, cpus)
            per_level[cpus] = statistics.median(r["times"])
            print(f"# {mode} local[{cpus}]: median {per_level[cpus]:.2f}s "
                  f"(all: {[round(x, 2) for x in r['times']]})", file=sys.stderr)
        eff = per_level[args.n] / (4 * per_level[4 * args.n])
        out[mode] = {
            f"median_s_{args.n}": round(per_level[args.n], 2),
            f"median_s_{4 * args.n}": round(per_level[4 * args.n], 2),
            "efficiency": round(eff, 3),
        }
        print(f"# {mode} efficiency ({args.n}->{4 * args.n}): {eff:.3f}", file=sys.stderr)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

"""SparkSession factory with engine defaults.

Defaults chosen for the sandbox (local[N], single JVM) but expressed so the
same settings are what you would ship to a 1000-executor cluster:

- AQE on (runtime coalescing + skew-join splitting),
- Arrow on (every pandas UDF crosses the JVM/Python boundary in batches),
- UTC session timezone (oracle comparisons against DuckDB are TZ-stable),
- shuffle partitions sized to the parallelism level, not the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "lakehouse-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    # local[N] -> N concurrent tasks; shuffle width defaults to that.
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = cpus if n in ("*", "") else int(n)

    # Executor Python workers must be able to import this package (UDF
    # closures reference module-level kernels). On a real cluster this is
    # `spark-submit --py-files engine.zip`; in local/driver-embedded runs we
    # export the package parent dir on the workers' PYTHONPATH.
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    py_path = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in py_path.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{pkg_parent}{os.pathsep}{py_path}" if py_path else pkg_parent

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # Arrow IPC at high task counts: default 10k-row batches become ~50MB
        # humongous G1 allocations whose JNI critical sections stall every
        # thread on GCLocker retries ("Retried waiting for GCLocker too
        # often"). Smaller batches + larger G1 regions keep them ordinary.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # same humongous-allocation issue from the parquet vectorized reader:
        # 4096-row default batches of array<int> rows (up to 32KB each) are
        # ~60-130MB allocations — cap the batch so they stay ordinary objects
        .config("spark.sql.parquet.columnarReaderBatchSize", "256")
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:G1HeapRegionSize=32m -XX:+UnlockDiagnosticVMOptions",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

"""batch_pipeline_via_lakehouse_spark — a PySpark-native lakehouse table-maintenance engine.

A from-scratch re-expression of the capabilities of the reference lakehouse
(medallion ELT over Iceberg; see SURVEY.md) as an idiomatic PySpark engine:

- an engine-owned Iceberg-style table format (snapshots, manifests with
  min/max column stats, atomic commits) over Parquet  -> ``table/``
- table maintenance: bin-packing compaction, Z-order / Hilbert clustering,
  manifest rewrite, snapshot expiry + orphan-file GC, MERGE INTO
  (SCD1 / SCD2)                                        -> ``operators/``
- manifest-pruned scan planning                        -> ``sources/``
- vectorized (Arrow/NumPy) kernels: Z/Hilbert keys, text analysis,
  dedup sketches, vector similarity                    -> ``functions/``
- reference-pipeline query semantics (silver/gold transforms) and the
  driver-facing query suite                            -> ``plans/``
- incremental (snapshot-delta) reads                   -> ``streaming/``

Everything is DataFrame-first: logical plans are declared with pyspark.sql
and Catalyst picks physical strategies; Python appears only in vectorized
pandas/Arrow UDFs (never per-row) and in driver-side metadata bookkeeping.
"""

__version__ = "0.1.0"

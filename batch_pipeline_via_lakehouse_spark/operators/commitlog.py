"""Per-partition commit log: lineage + metrics + resume checkpoint.

Replaces the reference's Airflow task-state (`src/dags/elt_history.py:9-21`
sequences one spark-submit per table-stage; a failed task is re-run whole).
Here every maintenance job appends one JSON line per partition it finishes:

    {"job_id", "partition", "input_files", "output_files", "snapshot_id",
     "rows", "bytes", "tokens", "seconds", "ts_ms"}

A killed job re-runs with the same ``job_id`` and skips partitions already
logged — resume without duplicate work (north_rule). Lineage is the
input-files -> output-files mapping; metrics give per-partition rows/bytes/
tokens-per-second for skew diagnosis.
"""

from __future__ import annotations

import json
import os

from ..table.format import now_ms


class CommitLog:
    def __init__(self, table_root: str, job_id: str):
        self.job_id = job_id
        self.path = os.path.join(table_root, "_commits", f"{job_id}.jsonl")
        self.meta_path = os.path.join(table_root, "_commits", f"{job_id}.json")
        os.makedirs(os.path.dirname(self.path), exist_ok=True)

    def job_meta(self) -> dict | None:
        """Job-level record (base snapshot, params) written once at start so a
        resumed run re-plans against the SAME snapshot — group keys stay
        stable and completed groups are skippable by key."""
        if not os.path.exists(self.meta_path):
            return None
        with open(self.meta_path) as f:
            return json.load(f)

    def init_job(self, meta: dict) -> dict:
        existing = self.job_meta()
        if existing is not None:
            return existing
        with open(self.meta_path, "w") as f:
            json.dump(meta, f)
        return meta

    def completed_partitions(self) -> set[str]:
        if not os.path.exists(self.path):
            return set()
        done = set()
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                done.add(rec["partition"])
        return done

    def entries(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def record(
        self,
        partition: str,
        input_files: list[str],
        output_files: list[str],
        snapshot_id: int,
        rows: int,
        bytes_: int,
        tokens: int,
        seconds: float,
    ) -> None:
        rec = {
            "job_id": self.job_id,
            "partition": partition,
            "input_files": input_files,
            "output_files": output_files,
            "snapshot_id": snapshot_id,
            "rows": rows,
            "bytes": bytes_,
            "tokens": tokens,
            "seconds": round(seconds, 3),
            "tokens_per_s": round(tokens / seconds, 1) if seconds > 0 else None,
            "ts_ms": now_ms(),
        }
        # single-writer append; each line flushed+fsync'd so a kill leaves at
        # most one truncated line (tolerated by the json-per-line reader).
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())

"""Per-stage lineage + idempotent resume (SURVEY.md §2.10 I1–I3).

Reference analogs: the ``cve_meta`` checkpoint row advanced transactionally
per batch (/root/reference/data_collection/cve_collection.py:332-335,
:462-464) and the file-hash idempotency check
(/root/reference/process/shared_functions.py:58-64). Here:

- the corpus is processed in PARTITION GROUPS (hash buckets of url);
- each completed group writes its stage output to
  ``<root>/<stage>/part_group=<g>/`` AND appends a lineage row;
- a re-run consults the lineage table first and skips completed groups —
  resume is idempotent because group outputs are atomic
  (parquet dir write) and the final reader unions only completed groups;
- lineage rows carry row counts + a content hash (F9 analog) + wall time,
  so the I3 "delta sync" decision (counts behind ⇒ rerun) is a plain query.

This is the "Iceberg snapshot + manifest" contract on plain parquet
(SURVEY.md §7.0 shim): the lineage table is the manifest; part_group dirs
are the snapshots.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_COLS = [
    "run_id", "stage", "part_group", "input_snapshot_id",
    "row_count_in", "row_count_out", "content_sha256", "wall_ms", "ts",
]


class LineageLog:
    """Append-only JSONL lineage (atomic per-row appends; a real deployment
    uses an Iceberg table — the contract is identical)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.path = os.path.join(root, "_lineage.jsonl")

    def rows(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def completed_groups(self, stage: str) -> set[int]:
        return {r["part_group"] for r in self.rows() if r["stage"] == stage}

    def append(self, row: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")


def needs_sync(log: "LineageLog", stage: str, current_input_count: int) -> bool:
    """A5/I3 count-delta trigger: re-run iff the source has more rows than
    the last completed run ingested (the Airflow DAG's Neo4j-vs-NVD count
    compare, /root/reference/airflow/dags/ingestion_dag.py:53-77)."""
    ingested = sum(
        r["row_count_in"] for r in log.rows() if r["stage"] == stage
    )
    return current_input_count > ingested


def _group_col(n_groups: int):
    return F.pmod(F.xxhash64(F.col("url")), F.lit(n_groups)).cast("int")


def run_stage_with_resume(
    spark: SparkSession,
    pages: DataFrame,
    stage: str,
    transform,
    out_root: str,
    n_groups: int = 8,
    run_id: str | None = None,
) -> DataFrame:
    """Partition-group micro-batching with checkpointed resume (I1/I5).

    ``transform(pages_group: DataFrame) -> DataFrame`` is the stage body.
    Each group's output lands in ``<out_root>/<stage>/part_group=<g>``;
    completed groups are skipped on re-run. Returns the unioned output of
    all groups (reading from disk — the stage boundary is durable, like the
    reference's per-batch mapper/ontology/Neo4j pipeline)."""
    run_id = run_id or uuid.uuid4().hex[:12]
    log = LineageLog(out_root)
    done = log.completed_groups(stage)
    stage_dir = os.path.join(out_root, stage)
    grouped = pages.withColumn("_pg", _group_col(n_groups))
    for g in range(n_groups):
        if g in done:
            continue
        t0 = time.time()
        part = grouped.filter(F.col("_pg") == g).drop("_pg")
        n_in = part.count()
        out = transform(part)
        gdir = os.path.join(stage_dir, f"part_group={g}")
        out.write.mode("overwrite").parquet(gdir)
        written = spark.read.parquet(gdir)
        n_out = written.count()
        content_hash = (
            written.select(
                F.sha2(F.concat_ws("\x01", *[F.col(c).cast("string") for c in written.columns]), 256).alias("h")
            )
            .agg(F.sha2(F.concat_ws("", F.sort_array(F.collect_list("h"))), 256).alias("H"))
            .collect()[0]["H"]
        )
        log.append({
            "run_id": run_id, "stage": stage, "part_group": g,
            "input_snapshot_id": "fixture-v1", "row_count_in": n_in,
            "row_count_out": n_out, "content_sha256": content_hash,
            "wall_ms": int((time.time() - t0) * 1000), "ts": time.time(),
        })
    return spark.read.parquet(os.path.join(stage_dir, "part_group=*"))

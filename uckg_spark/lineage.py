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

    def completed_groups(
        self, stage: str, input_snapshot_id: str | None = None
    ) -> set[int]:
        """Groups with a completed lineage row for ``stage``.

        With ``input_snapshot_id``, a group only counts as completed if its
        LATEST lineage row was produced from that exact input snapshot —
        groups whose recorded snapshot is older are STALE and must re-run
        (the reference's delta semantics: the daily DAG resets
        ``init_finished=0`` and re-ingests when NVD advances,
        /root/reference/airflow/dags/ingestion_dag.py:53-77 +
        /root/reference/data_collection/cve_collection.py:313-336).
        Without it, presence alone counts (crash-resume within one
        snapshot). Latest-row-wins: re-runs append, never rewrite."""
        if input_snapshot_id is None:
            return {r["part_group"] for r in self.rows() if r["stage"] == stage}
        latest: dict[int, str] = {}
        for r in self.rows():  # file order == append order
            if r["stage"] == stage:
                latest[r["part_group"]] = r.get("input_snapshot_id", "")
        return {g for g, snap in latest.items() if snap == input_snapshot_id}

    def append(self, row: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")


def needs_sync(
    log: "LineageLog", stage: str, current_input_count: int,
    input_snapshot_id: str | None = None,
) -> bool:
    """A5/I3 count-delta trigger: re-run iff the source has more rows than
    the last completed run ingested (the Airflow DAG's Neo4j-vs-NVD count
    compare, /root/reference/airflow/dags/ingestion_dag.py:53-77).

    Lineage rows append (latest-row-wins, like ``completed_groups``), so
    only each part_group's LATEST row counts toward the ingested total —
    summing every row double-counts groups re-run after a snapshot
    advance, which could report "in sync" while the current input holds
    rows never ingested under the latest snapshot. With
    ``input_snapshot_id``, groups whose latest row came from a different
    snapshot contribute NOTHING (they are stale and must re-run anyway)."""
    latest: dict[int, dict] = {}
    for r in log.rows():  # file order == append order
        if r["stage"] == stage:
            latest[r["part_group"]] = r
    ingested = sum(
        r["row_count_in"] for r in latest.values()
        if input_snapshot_id is None
        or r.get("input_snapshot_id", "") == input_snapshot_id
    )
    return current_input_count > ingested


def _group_col(n_groups: int):
    return F.pmod(F.xxhash64(F.col("url")), F.lit(n_groups)).cast("int")


def _row_hash_col(columns: list[str]):
    """60-bit per-row content hash from sha2 (stable across engines and
    Spark versions, unlike xxhash64 whose seed is an implementation
    detail)."""
    joined = F.concat_ws("\x01", *[F.col(c).cast("string") for c in columns])
    return F.conv(F.substring(F.sha2(joined, 256), 1, 15), 16, 10).cast("decimal(38,0)")


def run_stage_with_resume(
    spark: SparkSession,
    pages: DataFrame,
    stage: str,
    transform,
    out_root: str,
    n_groups: int = 8,
    run_id: str | None = None,
    input_snapshot_id: str = "fixture-v1",
) -> DataFrame:
    """Partition-group micro-batching with checkpointed resume (I1/I5).

    ``transform(pages_pending: DataFrame) -> DataFrame`` is the stage body;
    its output must retain the ``url`` column (the partition-group key).
    ``input_snapshot_id`` should name the snapshot of the input table the
    stage read (e.g. ``GraphCatalog.latest_snapshot(...)["snapshot_id"]``
    for catalog-managed inputs) so each lineage row pins exactly which
    input version produced the group — the resume decision and the A5/I3
    delta trigger are then auditable against the snapshot log.
    All PENDING groups run in ONE Spark job: the output is written with
    ``partitionBy(_pg)`` + dynamic partition overwrite, so completed groups'
    directories are untouched and a re-run is idempotent. Per-group input
    counts come from an ``Observation`` on the scan (no second pass over the
    input — the round-1 per-group filter loop re-read a 100 TB input
    ``n_groups`` times); per-group output counts and a COMMUTATIVE content
    hash (sum of per-row sha2-derived ints — order-independent without
    materializing a ``collect_list`` on the driver) come from one read-back
    of the just-written parquet. Returns the unioned output of all groups
    (reading from disk — the stage boundary is durable, like the reference's
    per-batch mapper/ontology/Neo4j pipeline,
    /root/reference/data_collection/cve_collection.py:332-335)."""
    from pyspark.sql import Observation

    run_id = run_id or uuid.uuid4().hex[:12]
    log = LineageLog(out_root)
    # snapshot-aware skip: a group completed under an OLDER input snapshot
    # is stale — re-running it is idempotent (dynamic partition overwrite
    # replaces exactly that group's directory), so resume never serves
    # output computed from a superseded input version.
    done = log.completed_groups(stage, input_snapshot_id)
    stage_dir = os.path.join(out_root, stage)
    pending = [g for g in range(n_groups) if g not in done]
    if pending:
        t0 = time.time()
        tagged = pages.withColumn("_pg", _group_col(n_groups))
        if len(pending) < n_groups:
            tagged = tagged.filter(F.col("_pg").isin(pending))
        # per-group input counts, observed as rows stream through the scan
        obs = Observation(f"lineage_{stage}_{run_id}")
        tagged = tagged.observe(
            obs,
            *[F.sum(F.when(F.col("_pg") == g, 1).otherwise(0)).alias(f"in_{g}")
              for g in pending],
        )
        out = transform(tagged.drop("_pg"))
        (
            out.withColumn("_pg", _group_col(n_groups))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_pg")
            .parquet(stage_dir)
        )
        wall_ms = int((time.time() - t0) * 1000)
        in_counts = obs.get
        # one read-back pass: per-group output count + commutative hash
        written = spark.read.parquet(stage_dir).filter(F.col("_pg").isin(pending))
        data_cols = [c for c in written.columns if c != "_pg"]
        stats = {
            r["_pg"]: r
            for r in written.groupBy("_pg").agg(
                F.count(F.lit(1)).alias("n_out"),
                F.sum(_row_hash_col(data_cols)).alias("content_sum"),
            ).collect()
        }
        ts = time.time()
        for g in pending:
            st = stats.get(g)
            log.append({
                "run_id": run_id, "stage": stage, "part_group": g,
                "input_snapshot_id": input_snapshot_id,
                "row_count_in": int(in_counts.get(f"in_{g}") or 0),
                "row_count_out": int(st["n_out"]) if st else 0,
                "content_sha256": format(int(st["content_sum"]), "064x") if st else "0" * 64,
                "wall_ms": wall_ms, "ts": ts,
            })
    return spark.read.parquet(stage_dir).drop("_pg")

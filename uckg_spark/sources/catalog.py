"""Graph-table catalog: partitioned nodes/edges writers + manifest.

S9/S10 analog (SURVEY.md §2.1): the reference streams Turtle into Neo4j via
n10s (/root/reference/process/graph_updater.py:13-28); the graft's
deliverable is partitioned columnar tables:

- ``edges`` partitioned by ``pred`` — predicate-sliced scans (the dominant
  KG access path: "all hasVulnerability edges") prune at the directory
  level; within a partition, files are sorted by subj for locality.
- ``nodes`` bucketed-by-hash(uri) layout via repartition(uri) so node
  lookups and node-edge joins co-locate.

Each write appends a manifest row (snapshot id, row counts) — the Iceberg
snapshot contract on plain parquet (SURVEY.md §7.0 shim).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class GraphCatalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.manifest_path = os.path.join(root, "_manifest.jsonl")

    def snapshots(self) -> list[dict]:
        if not os.path.exists(self.manifest_path):
            return []
        with open(self.manifest_path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def latest_snapshot(self, table: str) -> dict | None:
        rows = [s for s in self.snapshots() if s["table"] == table]
        return rows[-1] if rows else None

    def _append_manifest(self, row: dict) -> None:
        with open(self.manifest_path, "a") as f:
            f.write(json.dumps(row) + "\n")

    def write_edges(self, edges: DataFrame, mode: str = "overwrite") -> str:
        snap = uuid.uuid4().hex[:12]
        path = os.path.join(self.root, "edges")
        (
            edges.repartition("pred")
            .sortWithinPartitions("subj", "obj")
            .write.mode(mode)
            .partitionBy("pred")
            .parquet(path)
        )
        n = edges.sparkSession.read.parquet(path).count()
        self._append_manifest({
            "table": "edges", "snapshot_id": snap, "rows": n,
            "ts": time.time(), "mode": mode,
        })
        return snap

    def write_nodes(self, nodes: DataFrame, n_buckets: int = 16,
                    mode: str = "overwrite") -> str:
        snap = uuid.uuid4().hex[:12]
        path = os.path.join(self.root, "nodes")
        (
            nodes.repartition(n_buckets, "uri")
            .sortWithinPartitions("uri")
            .write.mode(mode)
            .parquet(path)
        )
        n = nodes.sparkSession.read.parquet(path).count()
        self._append_manifest({
            "table": "nodes", "snapshot_id": snap, "rows": n,
            "ts": time.time(), "mode": mode,
        })
        return snap

    def read_edges(self, spark: SparkSession, pred: str | None = None) -> DataFrame:
        df = spark.read.parquet(os.path.join(self.root, "edges"))
        if pred is not None:
            # partition filter → directory pruning, no data read for other preds
            df = df.filter(F.col("pred") == pred)
        return df

    def read_nodes(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.root, "nodes"))

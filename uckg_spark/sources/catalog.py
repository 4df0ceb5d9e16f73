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

    def write_edges(self, edges: DataFrame, n_tasks: int = 32,
                    mode: str = "overwrite") -> str:
        """Edges partitioned by pred for directory-pruned scans.

        Shuffle on (pred, subj) across ``n_tasks`` — NOT ``repartition("pred")``,
        which maps each predicate to exactly one task: a hot predicate (every
        CVE mention emits ucohasCVE_ID) would serialize behind a single
        writer at scale. With (pred, subj) a hot pred spreads over many
        tasks, each writing its own file into that pred's directory.
        Row count for the manifest is observed during the write (no second
        scan of the output)."""
        from pyspark.sql import Observation

        snap = uuid.uuid4().hex[:12]
        path = os.path.join(self.root, "edges")
        obs = Observation(f"edges_{snap}")
        (
            edges.observe(obs, F.count(F.lit(1)).alias("n"))
            .repartition(n_tasks, "pred", "subj")
            .sortWithinPartitions("pred", "subj", "obj")
            .write.mode(mode)
            .partitionBy("pred")
            .parquet(path)
        )
        self._append_manifest({
            "table": "edges", "snapshot_id": snap, "rows": int(obs.get["n"]),
            "ts": time.time(), "mode": mode,
        })
        return snap

    def write_nodes(self, nodes: DataFrame, n_buckets: int = 16,
                    mode: str = "overwrite") -> str:
        from pyspark.sql import Observation

        snap = uuid.uuid4().hex[:12]
        path = os.path.join(self.root, "nodes")
        obs = Observation(f"nodes_{snap}")
        (
            nodes.observe(obs, F.count(F.lit(1)).alias("n"))
            .repartition(n_buckets, "uri")
            .sortWithinPartitions("uri")
            .write.mode(mode)
            .parquet(path)
        )
        self._append_manifest({
            "table": "nodes", "snapshot_id": snap, "rows": int(obs.get["n"]),
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

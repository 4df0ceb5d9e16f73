"""Scaling evidence: the same KG-construction job at N and 4N cores.

Sandbox proxy for the north_rule's two-cluster-size criterion (no real
cluster here): run the identical job + input on local[8] and local[32]
(fresh JVM each, via subprocess), report docs/s and triples/s at both, and
the scaling efficiency  eff = throughput(4N) / (4 × throughput(N)).

Usage:
  python tools/scaling_bench.py                 # orchestrate both runs
  python tools/scaling_bench.py --worker 8      # one timed run (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

# sized so per-task work dominates fixed scheduling overhead — strong
# scaling is only observable when there is real work to divide. Pages are
# padded to ~10 KB html (Common-Crawl-realistic; the tiny unit-test fixtures
# would make the job pure scheduling overhead).
N_PAGES = int(os.environ.get("UCKG_SCALE_PAGES", "120000"))
FILLER_PARAS = int(os.environ.get("UCKG_SCALE_FILLER", "50"))


def worker(cores: int) -> None:
    from uckg_spark.fixtures.pages import synthesize_pages_df
    from uckg_spark.plans.kg_pipeline import KgDims, build_triples
    from uckg_spark.session import build_session

    spark = build_session(
        app_name=f"uckg-scaling-{cores}",
        master=f"local[{cores}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # corpus synthesized ON EXECUTORS, then persisted — the timed section
    # reads it like a real job reads the Iceberg pages table
    pdf = synthesize_pages_df(
        spark, N_PAGES, filler_paras=FILLER_PARAS, partitions=cores * 4
    ).persist()
    n_docs = pdf.count()
    dims = KgDims(spark)
    # warm-up compiles plans + JIT; then best-of-3 timed reps (single-JVM
    # local mode has multi-second GC/JIT variance — the min is the
    # steady-state capability). Intermediate caches cleared between reps
    # (each build_triples persists its own mention tables), corpus re-pinned.
    build_triples(spark, pdf.limit(500), dims, mention_partitions=cores).count()
    walls = []
    n_triples = 0
    for _ in range(3):
        t0 = time.time()
        n_triples = build_triples(spark, pdf, dims, mention_partitions=cores).count()
        walls.append(time.time() - t0)
    wall = min(walls)
    print(json.dumps({
        "cores": cores, "docs": n_docs, "triples": n_triples,
        "wall_s": round(wall, 2),
        "wall_s_reps": [round(w, 2) for w in walls],
        "docs_per_sec": round(n_docs / wall, 1),
        "triples_per_sec": round(n_triples / wall, 1),
    }))


def orchestrate() -> None:
    results = {}
    for cores in (8, 32):
        out = subprocess.run(
            [sys.executable, __file__, "--worker", str(cores)],
            capture_output=True, text=True, check=True, cwd="/root/repo",
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results[cores] = json.loads(line)
    t8, t32 = results[8]["docs_per_sec"], results[32]["docs_per_sec"]
    eff = t32 / (4 * t8)
    summary = {
        "n_pages": N_PAGES,
        "local8": results[8],
        "local32": results[32],
        "speedup_8_to_32": round(t32 / t8, 3),
        "scaling_efficiency_N_to_4N": round(eff, 3),
    }
    print(json.dumps(summary, indent=2))
    with open("/root/repo/SCALING.json", "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
    else:
        orchestrate()

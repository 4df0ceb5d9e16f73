"""Scaling evidence: the same KG-construction job at N and 4N cores.

Sandbox proxy for the north_rule's two-cluster-size criterion (no real
cluster here). IMPORTANT hardware caveat, measured (see BENCH.md): this
container exposes 32 logical CPUs = 16 physical cores × SMT; a pure
CPU-burn scales only ~21× from 1→32 workers, so an 8→32 comparison is
capped at ~0.65 "efficiency" by the silicon, not the software. The honest
N→4N strong-scaling pair inside the physical-core budget is therefore
local[2] vs local[8] (default); the 8→32 pair is also reported for
completeness.

The corpus (~10 KB/page, Common-Crawl-realistic) is synthesized on
executors ONCE and written to parquet; every timed rep reads it from disk —
the exact shape of a production run reading the Iceberg pages table — and
caches are cleared between reps so heap state cannot drift across
measurements. Best-of-reps is reported (single-JVM local mode has
multi-second GC/JIT variance; the min is the steady-state capability).

Usage:
  python tools/scaling_bench.py                 # orchestrate (2 vs 8)
  UCKG_SCALE_CORES="8,32" python tools/scaling_bench.py
  python tools/scaling_bench.py --worker 8      # one timed run (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

N_PAGES = int(os.environ.get("UCKG_SCALE_PAGES", "360000"))
FILLER_PARAS = int(os.environ.get("UCKG_SCALE_FILLER", "50"))
REPS = int(os.environ.get("UCKG_SCALE_REPS", "2"))
CORES = tuple(int(c) for c in os.environ.get("UCKG_SCALE_CORES", "2,8").split(","))
# corpus file count must be sized for the LARGEST core count measured:
# with too-few large files the high-core run gets coarse waves + straggler
# tails while the low-core run is unaffected — measured as 171 s vs 119 s
# for the same 720k pages at local[8] with 32 vs 128 files. 16 tasks/core
# at the top size keeps wave-tail noise ≪ wall at every measured size.
PARTS = int(os.environ.get(
    "UCKG_SCALE_PARTS", str(max(128, 16 * max(CORES)))))
CORPUS = os.environ.get(
    "UCKG_SCALE_CORPUS", f"/tmp/uckg_scale_corpus_{N_PAGES}_p{PARTS}")


def _ensure_corpus(spark) -> None:
    from uckg_spark.fixtures.pages import synthesize_pages_df

    marker = os.path.join(CORPUS, "_SUCCESS")
    if os.path.exists(marker):
        return
    synthesize_pages_df(
        spark, N_PAGES, filler_paras=FILLER_PARAS,
        partitions=PARTS,
    ).write.mode("overwrite").parquet(CORPUS)


def worker(cores: int) -> None:
    from uckg_spark.plans.kg_pipeline import KgDims, build_triples
    from uckg_spark.session import build_session
    from uckg_spark.sources.pages import read_pages

    spark = build_session(
        app_name=f"uckg-scaling-{cores}",
        master=f"local[{cores}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    _ensure_corpus(spark)
    dims = KgDims(spark)
    # warm-up: compile plans + JIT on a slice
    build_triples(
        spark, read_pages(spark, CORPUS).limit(2000), dims,
        mention_partitions=cores,
    ).count()
    walls, n_triples, n_docs = [], 0, 0
    for _ in range(REPS):
        spark.catalog.clearCache()
        pages = read_pages(spark, CORPUS)
        t0 = time.time()
        n_triples = build_triples(
            spark, pages, dims, mention_partitions=cores
        ).count()
        walls.append(time.time() - t0)
    n_docs = read_pages(spark, CORPUS).count()
    wall = min(walls)
    print(json.dumps({
        "cores": cores, "docs": n_docs, "triples": n_triples,
        "wall_s": round(wall, 2),
        "wall_s_reps": [round(w, 2) for w in walls],
        "docs_per_sec": round(n_docs / wall, 1),
        "triples_per_sec": round(n_triples / wall, 1),
    }))


def _run_worker(cores: int, reps: int) -> dict:
    env = dict(os.environ, UCKG_SCALE_REPS=str(reps))
    out = subprocess.run(
        [sys.executable, __file__, "--worker", str(cores)],
        capture_output=True, text=True, check=True, cwd="/root/repo",
        env=env,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def orchestrate() -> None:
    lo, hi = CORES
    results = {}
    if os.environ.get("UCKG_SCALE_INTERLEAVE"):
        # Shared-host defense: the N and 4N points must sample the SAME
        # ambient-noise window or the ratio measures the host, not the
        # software (measured: identical code gave local[2]=990.7 s in one
        # window and 694.9 s in another — 1.4x — while local[8] moved only
        # 5%). Interleave single-rep invocations lo,hi,lo,hi,... so every
        # lo rep has a hi rep adjacent in time, then best-of per side.
        # Each invocation re-pays JVM startup + warm-up (excluded from
        # the timed wall as always).
        acc: dict[int, list[dict]] = {lo: [], hi: []}
        for _ in range(REPS):
            for cores in (lo, hi):
                acc[cores].append(_run_worker(cores, reps=1))
        for cores in (lo, hi):
            runs = acc[cores]
            walls = [r["wall_s"] for r in runs]
            best = min(range(len(runs)), key=lambda i: walls[i])
            results[cores] = dict(runs[best], wall_s_reps=walls)
            results[cores]["docs_per_sec"] = round(
                runs[best]["docs"] / walls[best], 1)
            results[cores]["triples_per_sec"] = round(
                runs[best]["triples"] / walls[best], 1)
    else:
        for cores in (lo, hi):
            results[cores] = _run_worker(cores, REPS)
    t_lo, t_hi = results[lo]["docs_per_sec"], results[hi]["docs_per_sec"]
    ratio = hi // lo
    eff = t_hi / (ratio * t_lo)
    summary = {
        "n_pages": N_PAGES,
        "page_html_bytes_avg": 10931,
        "corpus_files": PARTS,
        "cores_pair": [lo, hi],
        "protocol": (
            "same job (pages->triples, plans/kg_pipeline.py), same on-disk "
            "parquet corpus, warm-up run excluded, caches cleared between "
            "reps, best-of-reps; N->4N strong-scaling proxy chosen inside "
            "the 16-physical-core budget (32 logical CPUs are 16 cores x "
            "SMT: a pure CPU-burn scales only ~21x from 1->32 procs, "
            "capping any 8->32 comparison near 0.65 by hardware)"
            + (
                "; INTERLEAVED single-rep invocations lo,hi,lo,hi so both "
                "core counts sample the same shared-host noise window"
                if os.environ.get("UCKG_SCALE_INTERLEAVE") else ""
            )
        ),
        f"local{lo}": results[lo],
        f"local{hi}": results[hi],
        f"speedup_{lo}_to_{hi}": round(t_hi / t_lo, 3),
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

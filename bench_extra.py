"""Extra benchmarks for the optimization round (guide §1.4): noop-sink
isolation per query with construction/execution split, reps, and
explain("formatted") capture. Does NOT replace bench.py (frozen).

Usage:
  python bench_extra.py q1 q2 ...        # time the named queries
  UCKG_PROF_REPS=3 python bench_extra.py --plans q1 ...  # + dump plans
  python bench_extra.py --all            # every bench.py query
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("UCKG_PROF_REPS", "3"))
    args = [a for a in sys.argv[1:]]
    dump_plans = "--plans" in args
    plans_dir = os.environ.get("UCKG_PLANS_DIR", "plans/r06")
    suffix = os.environ.get("UCKG_PLANS_SUFFIX", "before")
    names = [a for a in args if not a.startswith("--")]

    import __spark_entry__ as entry_mod
    from uckg_spark.session import build_session

    spark = build_session(
        app_name="uckg-bench-extra",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    qs = entry_mod.queries()
    if "--all" in args:
        names = list(qs)

    if dump_plans:
        os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        build_walls, exec_walls = [], []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            build_walls.append(round(t1 - t0, 3))
            exec_walls.append(round(t2 - t1, 3))
        if dump_plans:
            df = qs[name](spark, sf_dir)
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        out[name] = {
            "build": build_walls,
            "exec": exec_walls,
            "total_min": round(min(b + e for b, e in
                                   zip(build_walls, exec_walls)), 3),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": {
        k: v["total_min"] for k, v in out.items()}}))


if __name__ == "__main__":
    main()

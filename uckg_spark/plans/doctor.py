"""Plan doctor — the repo's plan-audit discipline as an API.

Every round of this engine's development audits executed plans the
same way: no CartesianProduct, no per-row Python eval in hot paths,
broadcast joins where a side is dictionary-bounded, filters pushed
into the parquet scan, wide whole-stage-codegen spans. This module
packages that checklist so tests pin it per-operator
(tests/test_plan_properties.py style) and engineers run it on new
queries before they ship — the 100 TB failure mode is almost always
visible in the plan long before it is visible in a wall clock.

`audit_plan` inspects the EXECUTED plan string (post-AQE re-planning
where applicable), which is what actually runs — the analyzed/
optimized plans can still change shape.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# the one sanctioned BroadcastNestedLoopJoin shape: attaching a 1-row
# global-aggregate (a scalar) to every row — bounded by construction
_SCALAR_ATTACH_HINT = "single-row scalar attach"


def audit_plan(df: DataFrame) -> dict:
    """Inspect ``df``'s executed plan. Returns::

        {
          "cartesian": int,          # CartesianProduct nodes
          "bnlj": int,               # BroadcastNestedLoopJoin nodes
          "python_eval": int,        # Batch/ArrowEvalPython nodes
          "exchanges": int,          # shuffle Exchange nodes
          "broadcasts": int,         # BroadcastExchange nodes
          "codegen_spans": int,      # WholeStageCodegen regions
          "pushed_filters": int,     # scans with non-empty PushedFilters
          "scans": int,              # parquet scans
          "ok": bool,                # no cartesian and no python eval
        }

    ``bnlj`` is reported, not failed: a 1-row broadcast (scalar attach)
    is legitimate; more than that deserves a look. ``ok`` is the hard
    floor — a cartesian or a row-at-a-time Python operator in a query
    plan is an outage at corpus scale, not a slowdown.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = len(re.findall(r"Scan parquet|FileScan parquet", plan))
    pushed = len(re.findall(r"PushedFilters: \[(?!\])", plan))
    out = {
        "cartesian": plan.count("CartesianProduct"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "python_eval": (plan.count("BatchEvalPython")
                        + plan.count("ArrowEvalPython")),
        "exchanges": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning"),
        "broadcasts": plan.count("BroadcastExchange"),
        # codegen regions surface as "*(N)" operator prefixes — present
        # only once AQE has finalized (audit after an action for this
        # counter; the structural counters are valid pre-execution too)
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "pushed_filters": pushed,
        "scans": scans,
    }
    out["ok"] = out["cartesian"] == 0 and out["python_eval"] == 0
    return out


def assert_scalable(df: DataFrame, allow_bnlj: int = 0) -> dict:
    """Raise AssertionError with the audit attached when ``df``'s plan
    crosses the hard floor (cartesian / Python eval) or uses more
    BroadcastNestedLoopJoins than the ``allow_bnlj`` budget (pass 1 per
    sanctioned scalar attach). Returns the audit on success so callers
    can assert further properties."""
    audit = audit_plan(df)
    problems = []
    if audit["cartesian"]:
        problems.append(f"{audit['cartesian']} CartesianProduct node(s)")
    if audit["python_eval"]:
        problems.append(
            f"{audit['python_eval']} per-row Python eval node(s)")
    if audit["bnlj"] > allow_bnlj:
        problems.append(
            f"{audit['bnlj']} BroadcastNestedLoopJoin(s), budget "
            f"{allow_bnlj} ({_SCALAR_ATTACH_HINT} is the only "
            "sanctioned use)")
    if problems:
        raise AssertionError("; ".join(problems) + f"; audit={audit}")
    return audit

"""Continuous plan audit: every batch query in the driver contract
must satisfy the scalability floor (no CartesianProduct, no per-row
Python eval) with a BNLJ budget of 1 for the sanctioned single-row
scalar attaches. This replaces the per-round manual grep with a gate
that fails the moment a regression lands."""

import pytest

import __spark_entry__ as entry_mod
from uckg_spark.plans.doctor import assert_scalable

SF = "/root/testdata/sf0.001"

# queries that stage streaming sinks (side effects, not a single plan)
_STREAMING = {k for k in entry_mod.queries() if k.startswith("streaming_")}
# single-row scalar attach via crossJoin(broadcast(1-row agg)) — the
# one sanctioned BroadcastNestedLoopJoin use
_SCALAR_ATTACH = {"cooccur_lift", "bm25_topk", "quality_fit",
                  "kge_negatives", "kmv_union"}
# contingency's densify is TWO bounded attaches (the |categories|²
# product + the 1-row total) — same sanctioned class, budget 2
_BNLJ_BUDGET = {"contingency": 2}

_BATCH_KEYS = sorted(set(entry_mod.queries()) - _STREAMING)


@pytest.mark.parametrize("name", _BATCH_KEYS)
def test_query_plan_is_scalable(spark, name):
    qs = entry_mod.queries()
    df = qs[name](spark, SF)
    budget = _BNLJ_BUDGET.get(name, 1 if name in _SCALAR_ATTACH else 0)
    assert_scalable(df, allow_bnlj=budget)

"""GraphCatalog.merge_table (keyed upsert with snapshot-pinned OCC) and
rank_normalize (operators/quantiles.py)."""

import pytest

from uckg_spark.operators.quantiles import rank_normalize
from uckg_spark.sources.catalog import CommitConflictError, GraphCatalog


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def _read(spark, cat, name, snapshot_id=None):
    return {tuple(r) for r in
            cat.read_table(spark, name, snapshot_id=snapshot_id).collect()}


def test_merge_upserts_and_time_travels(spark, tmp_path):
    cat = GraphCatalog(str(tmp_path / "g"))
    s1 = cat.merge_table(spark, "dim", _df(spark, [(1, "a"), (2, "b")]), ["k"])
    s2 = cat.merge_table(spark, "dim", _df(spark, [(2, "B"), (3, "c")]), ["k"])
    assert _read(spark, cat, "dim") == {(1, "a"), (2, "B"), (3, "c")}
    # the pre-merge snapshot is still readable (COW, not in-place)
    assert _read(spark, cat, "dim", snapshot_id=s1) == {(1, "a"), (2, "b")}
    assert cat.latest_snapshot("dim")["snapshot_id"] == s2


def test_merge_is_idempotent_on_replay(spark, tmp_path):
    cat = GraphCatalog(str(tmp_path / "g"))
    cat.merge_table(spark, "dim", _df(spark, [(1, "a")]), ["k"])
    cat.merge_table(spark, "dim", _df(spark, [(1, "a")]), ["k"])
    assert _read(spark, cat, "dim") == {(1, "a")}


def test_pinned_commit_rejects_moved_head(spark, tmp_path):
    # the OCC primitive merge_table relies on: a commit pinned to a
    # superseded snapshot must fail, never silently clobber
    cat = GraphCatalog(str(tmp_path / "g"))
    s1 = cat.write_table("dim", _df(spark, [(1, "a")]))
    cat.write_table("dim", _df(spark, [(9, "z")]))  # concurrent writer
    with pytest.raises(CommitConflictError):
        cat.write_table("dim", _df(spark, [(2, "b")]),
                        expected_parent_id=s1)


def test_merge_rejects_schema_mismatch(spark, tmp_path):
    cat = GraphCatalog(str(tmp_path / "g"))
    cat.merge_table(spark, "dim", _df(spark, [(1, "a")]), ["k"])
    bad = spark.createDataFrame([(1, "a", 0)], "k long, v string, extra long")
    with pytest.raises(ValueError, match="schema mismatch"):
        cat.merge_table(spark, "dim", bad, ["k"])


def _rank(spark, vals):
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(vals)],
        "doc_id long, source string, n_chars long")
    got = rank_normalize(df, "n_chars", "source")
    return {r["doc_id"]: r["pct_e6"] for r in got.collect()}


def test_rank_normalize_with_ties(spark):
    # ranks 1,2,2,4 over n=4 -> (rk-1)*1e6 div 3
    assert _rank(spark, [10, 20, 20, 30]) == {
        0: 0, 1: 333_333, 2: 333_333, 3: 1_000_000}


def test_rank_normalize_degenerate_and_nulls(spark):
    assert _rank(spark, [42]) == {0: 0}
    got = _rank(spark, [5, None, 7])
    assert got == {0: 0, 2: 1_000_000}  # the null row is dropped

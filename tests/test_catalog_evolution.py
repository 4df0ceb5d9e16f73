"""Add-column schema evolution on the snapshot catalog: appends may add
or omit columns; readers conform every dir to the recorded union schema;
dtype changes are rejected before any data is written; evolution
composes with MoR deletes and changelog scans."""

import pytest

from uckg_spark.sources.catalog import GraphCatalog


def _read(spark, cat, name, snapshot_id=None):
    df = cat.read_table(spark, name, snapshot_id=snapshot_id)
    return df.columns, {tuple(r) for r in df.collect()}


def test_append_adds_column(spark, tmp_path):
    cat = GraphCatalog(str(tmp_path / "g"))
    s1 = cat.write_table(
        "t", spark.createDataFrame([(1, "a")], "k long, v string"))
    cat.write_table(
        "t",
        spark.createDataFrame([(2, "b", 9)], "k long, v string, extra long"),
        mode="append")
    cols, rows = _read(spark, cat, "t")
    assert cols == ["k", "v", "extra"]
    assert rows == {(1, "a", None), (2, "b", 9)}
    # time travel to the pre-evolution snapshot: original schema
    cols1, rows1 = _read(spark, cat, "t", snapshot_id=s1)
    assert cols1 == ["k", "v"] and rows1 == {(1, "a")}


def test_append_may_omit_columns(spark, tmp_path):
    cat = GraphCatalog(str(tmp_path / "g"))
    cat.write_table(
        "t", spark.createDataFrame([(1, "a")], "k long, v string"))
    cat.write_table(
        "t", spark.createDataFrame([(2,)], "k long"), mode="append")
    cols, rows = _read(spark, cat, "t")
    assert cols == ["k", "v"]
    assert rows == {(1, "a"), (2, None)}


def test_dtype_change_rejected_before_write(spark, tmp_path):
    cat = GraphCatalog(str(tmp_path / "g"))
    cat.write_table(
        "t", spark.createDataFrame([(1, "a")], "k long, v string"))
    snaps_before = len(cat.snapshots("t"))
    with pytest.raises(ValueError, match="dtype"):
        cat.write_table(
            "t", spark.createDataFrame([(2, 3)], "k long, v long"),
            mode="append")
    # rejected pre-write: no commit AND no orphan data dir
    assert len(cat.snapshots("t")) == snaps_before
    assert cat.expire_snapshots("t", keep_last=100) == []


def test_evolution_composes_with_mor_and_changelog(spark, tmp_path):
    cat = GraphCatalog(str(tmp_path / "g"))
    s1 = cat.write_table(
        "t", spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    cat.write_table(
        "t",
        spark.createDataFrame([(3, "c", 7)], "k long, v string, w long"),
        mode="append")
    cat.delete_rows(
        "t", spark.createDataFrame([(2,)], "k long"), ["k"])
    cols, rows = _read(spark, cat, "t")
    assert cols == ["k", "v", "w"]
    assert rows == {(1, "a", None), (3, "c", 7)}
    # changelog since s1: the evolved insert + the delete, both in the
    # head (union) schema
    got = {tuple(r) for r in
           cat.read_changes(spark, "t", s1).collect()}
    assert got == {(3, "c", 7, "insert", 2), (2, None, None, "delete", 3)}
    # compaction materializes the net evolved table, back to uniform
    cat.compact_table(spark, "t", n_tasks=1)
    head = cat.latest_snapshot("t")
    assert head["uniform_schema"] and len(head["dirs"]) == 1
    assert _read(spark, cat, "t") == (cols, rows)


def test_add_column_onto_legacy_schemaless_table(spark, tmp_path):
    """A parent with data dirs but NO recorded schema (pre-evolution
    commit rows) must NOT be treated as uniform: an add-column append
    onto it has to take the mergeSchema+_conform read path, else the
    new column resolves from an arbitrary footer and silently reads
    NULL (or vanishes) nondeterministically."""
    cat = GraphCatalog(str(tmp_path / "g"))

    def write_v1(path):
        spark.createDataFrame([(1, "a")], "k long, v string") \
            .coalesce(1).write.mode("overwrite").parquet(path)
        return 1

    # simulate a legacy commit row: data dir present, no schema key
    cat._write_snapshot("t", write_v1, "overwrite", schema=None)
    assert "schema" not in cat.latest_snapshot("t")
    cat.write_table(
        "t",
        spark.createDataFrame([(2, "b", 9)], "k long, v string, w long"),
        mode="append")
    head = cat.latest_snapshot("t")
    assert head["uniform_schema"] is False  # legacy dirs force _conform
    cols, rows = _read(spark, cat, "t")
    assert cols == ["k", "v", "w"]
    assert rows == {(1, "a", None), (2, "b", 9)}

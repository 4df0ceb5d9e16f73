"""plans/incremental.py: the KG stays equal to a full rebuild over the
LIVE pages while extraction runs only on changed pages — inserts,
re-crawls (MoR upserts), and deletions all flow from the pages table's
changelog into mention-store updates and edge-delta commits."""

import pytest
from pyspark.sql import functions as F

from uckg_spark.plans.incremental import last_synced, sync_kg
from uckg_spark.plans.kg_pipeline import build_triples, materialize_graph
from uckg_spark.sources.catalog import GraphCatalog
from uckg_spark.sources.pages import pages_df


def _rebuild(spark, pages, kg_dims):
    """Gold standard: batch pipeline over the live corpus."""
    triples = build_triples(spark, pages_df(spark, pages), kg_dims)
    nodes, edges = materialize_graph(triples)
    return (
        {tuple(r) for r in edges.collect()},
        {(r["uri"], tuple(r["labels"])) for r in nodes.collect()},
    )


def _graph_state(spark, cat):
    edges = {tuple(r) for r in
             cat.read_edges(spark).select("subj", "pred", "obj").collect()}
    nodes = {(r["uri"], tuple(r["labels"]))
             for r in cat.read_nodes(spark).collect()}
    return edges, nodes


@pytest.fixture(scope="module")
def synced(spark, fixture_pages, kg_dims, tmp_path_factory):
    """Drive two syncs: v1 = pages[:20]; v2 = re-crawl page 0 with page
    35's html (mention set changes), delete page 1, insert pages 20:30.
    Returns everything the assertions need."""
    root = tmp_path_factory.mktemp("sync")
    pages_cat = GraphCatalog(str(root / "pages"))
    graph_cat = GraphCatalog(str(root / "graph"))

    # a page whose CVE id no other fixture page mentions: deleting it
    # MUST retract its R1 triples (last-support disappearance)
    uniq = dict(
        fixture_pages[0],
        url="https://unique.test/only-here",
        html=b"<html><body>An advisory for CVE-1999-9997 alone."
             b"</body></html>")
    v1 = fixture_pages[:20] + [uniq]
    pages_cat.write_table("pages", pages_df(spark, v1), n_tasks=2)
    s1 = sync_kg(spark, pages_cat, graph_cat, kg_dims, n_tasks=2)
    state1 = _graph_state(spark, graph_cat)

    recrawled = dict(v1[0], html=fixture_pages[35]["html"])
    pages_cat.merge_table(
        spark, "pages",
        pages_df(spark, [recrawled] + fixture_pages[20:30]),
        ["url"], n_tasks=2, strategy="mor")
    pages_cat.delete_rows(
        "pages",
        spark.createDataFrame([(v1[1]["url"],), (uniq["url"],)],
                              "url string"),
        ["url"])
    s2 = sync_kg(spark, pages_cat, graph_cat, kg_dims, n_tasks=2)

    live = [recrawled] + v1[2:20] + fixture_pages[20:30]
    return {
        "pages_cat": pages_cat, "graph_cat": graph_cat,
        "v1": v1, "live": live, "s1": s1, "s2": s2, "state1": state1,
    }


def test_first_sync_equals_batch_build(spark, fixture_pages, kg_dims, synced):
    assert synced["s1"]["status"] == "synced"
    gold = _rebuild(spark, synced["v1"], kg_dims)
    assert synced["state1"] == gold


def test_incremental_sync_equals_full_rebuild(spark, kg_dims, synced):
    """THE invariant: after upsert + delete + insert, the incremental
    graph equals a from-scratch batch build over the live corpus."""
    assert synced["s2"]["status"] == "synced"
    gold_edges, gold_nodes = _rebuild(spark, synced["live"], kg_dims)
    got_edges, got_nodes = _graph_state(spark, synced["graph_cat"])
    assert got_edges == gold_edges
    assert got_nodes == gold_nodes
    # the second sync genuinely moved the graph in both directions
    assert synced["s2"]["changed_urls"] == 13  # 1 recrawl + 2 del + 10 new
    assert synced["s2"]["edges_added"] > 0
    assert synced["s2"]["edges_retracted"] > 0


def test_sync_is_noop_when_pages_unchanged(spark, kg_dims, synced):
    again = sync_kg(spark, synced["pages_cat"], synced["graph_cat"],
                    kg_dims, n_tasks=2)
    assert again["status"] == "up_to_date"
    assert last_synced(synced["graph_cat"]) == again["pages_snapshot_id"]


def test_mention_store_tracks_live_pages(spark, kg_dims, synced):
    """The incrementally-maintained mention store equals a fresh scan of
    the live corpus (set-wise): deleted urls gone, re-crawled url's
    mentions replaced."""
    from uckg_spark.operators.mentions import scan_pages

    store = {tuple(r) for r in synced["graph_cat"]
             .read_table(spark, "mentions").collect()}
    gold = {tuple(r) for r in scan_pages(
        spark, pages_df(spark, synced["live"]),
        kg_dims.alias_rows).collect()}
    assert store == gold
    dead_url = synced["v1"][1]["url"]
    assert all(u != dead_url for u, *_ in store)


def test_edges_history_time_travels(spark, synced):
    """The delta commits keep history: the edges snapshot log contains
    a head matching sync 2 and an ancestor state matching sync 1."""
    cat = synced["graph_cat"]
    snaps = cat.snapshots("edges")
    assert len(snaps) >= 2
    first = {tuple(r) for r in
             cat.read_edges(spark, snapshot_id=snaps[0]["snapshot_id"])
             .select("subj", "pred", "obj").collect()}
    assert first == synced["state1"][0]


def test_sync_job_compaction_maintenance(
        spark, fixture_pages, kg_dims, tmp_path):
    """jobs/sync_kg.run: after enough delta syncs the edges head spans
    several dirs; --compact-after triggers the rewrite and the graph is
    unchanged (still equal to the batch rebuild over live pages)."""
    from jobs.sync_kg import run

    pages_cat = GraphCatalog(str(tmp_path / "pages"))
    graph = str(tmp_path / "graph")
    pages_cat.write_table(
        "pages", pages_df(spark, fixture_pages[:10]), n_tasks=2)
    run(spark, str(tmp_path / "pages"), graph, n_tasks=2, dims=kg_dims)
    # two delta batches with genuinely new mentions → appended edge dirs
    for lo, hi in ((10, 16), (16, 22)):
        pages_cat.write_table(
            "pages", pages_df(spark, fixture_pages[lo:hi]),
            n_tasks=2, mode="append")
        s = run(spark, str(tmp_path / "pages"), graph, n_tasks=2,
                dims=kg_dims)
        assert s["status"] == "synced"
    cat = GraphCatalog(graph)
    assert len(cat.latest_snapshot("edges")["dirs"]) > 1
    # a no-change sync with compaction enabled: up_to_date, no compaction
    s = run(spark, str(tmp_path / "pages"), graph, n_tasks=2,
            dims=kg_dims, compact_after=1)
    assert s["status"] == "up_to_date" and "compacted_edges" not in s
    # a real sync with compaction enabled compacts both tables
    pages_cat.write_table(
        "pages", pages_df(spark, fixture_pages[22:25]),
        n_tasks=2, mode="append")
    s = run(spark, str(tmp_path / "pages"), graph, n_tasks=2,
            dims=kg_dims, compact_after=1)
    assert s.get("compacted_edges") and s.get("compacted_mentions")
    assert len(cat.latest_snapshot("edges")["dirs"]) == 1
    assert cat.latest_snapshot("edges")["deletes"] == []
    gold_edges, gold_nodes = _rebuild(spark, fixture_pages[:25], kg_dims)
    got_edges, got_nodes = _graph_state(spark, cat)
    assert got_edges == gold_edges and got_nodes == gold_nodes


def test_sync_collapses_multi_commit_ranges(
        spark, fixture_pages, kg_dims, tmp_path):
    """A changelog range can touch the same url in several commits —
    re-crawled twice between syncs, insert-then-delete, or a FIRST sync
    over a pages catalog with history (read_changes replays every
    version). The sync must net-collapse per url or stale page versions
    contaminate the mention store."""
    pages_cat = GraphCatalog(str(tmp_path / "pages"))
    graph_cat = GraphCatalog(str(tmp_path / "graph"))
    p = fixture_pages

    # history BEFORE the first sync: v0 of pages 0-9, then p0 re-crawled,
    # then p1 deleted — the first sync sees all of it in one range
    pages_cat.write_table("pages", pages_df(spark, p[:10]), n_tasks=2)
    p0_new = dict(p[0], html=p[30]["html"])
    pages_cat.merge_table(spark, "pages", pages_df(spark, [p0_new]),
                          ["url"], n_tasks=2, strategy="mor")
    pages_cat.delete_rows(
        "pages", spark.createDataFrame([(p[1]["url"],)], "url string"),
        ["url"])
    sync_kg(spark, pages_cat, graph_cat, kg_dims, n_tasks=2)
    live = [p0_new] + p[2:10]
    assert _graph_state(spark, graph_cat) == _rebuild(spark, live, kg_dims)

    # one range, same url twice + insert-then-delete of a new url
    p2_a = dict(p[2], html=p[31]["html"])
    p2_b = dict(p[2], html=p[32]["html"])  # final version
    pages_cat.merge_table(spark, "pages", pages_df(spark, [p2_a]),
                          ["url"], n_tasks=2, strategy="mor")
    pages_cat.merge_table(spark, "pages", pages_df(spark, [p2_b]),
                          ["url"], n_tasks=2, strategy="mor")
    pages_cat.write_table("pages", pages_df(spark, [p[40]]),
                          n_tasks=2, mode="append")
    pages_cat.delete_rows(
        "pages", spark.createDataFrame([(p[40]["url"],)], "url string"),
        ["url"])
    s = sync_kg(spark, pages_cat, graph_cat, kg_dims, n_tasks=2)
    assert s["status"] == "synced"
    live = [p0_new, p2_b] + p[3:10]
    assert _graph_state(spark, graph_cat) == _rebuild(spark, live, kg_dims)
    # the intermediate version's mentions must NOT be in the store
    store_urls = {r["url"] for r in graph_cat
                  .read_table(spark, "mentions").collect()}
    assert p[40]["url"] not in store_urls


def test_streaming_ingest_feeds_incremental_sync(
        spark, fixture_pages, kg_dims, tmp_path):
    """The full loop: crawl stream → pages catalog (exactly-once MoR
    upserts per micro-batch, re-crawls superseding) → sync_kg — the
    graph equals a batch rebuild over exactly the LIVE page versions,
    regardless of micro-batch slicing."""
    import os
    import time as _time

    from uckg_spark.sources.pages import PAGES_SCHEMA
    from uckg_spark.streaming.pages_stream import (
        pages_ingest_sink, run_pages_ingest)
    from uckg_spark.sources.catalog import GraphCatalog

    p = fixture_pages
    p0_v2 = dict(p[0], html=p[30]["html"])  # re-crawl in a LATER file
    src = tmp_path / "crawl"
    src.mkdir()
    import glob
    import shutil

    for i, (name, rows) in enumerate((
            ("f1", p[:8]), ("f2", [p0_v2] + p[8:12]), ("f3", p[12:16]))):
        stage = str(tmp_path / f"stage_{name}")
        pages_df(spark, rows).coalesce(1).write.mode(
            "overwrite").parquet(stage)
        # FileStreamSource sources FILES: lift the single part file out
        # of the directory Spark wrote, with mtimes forcing batch order
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = str(src / f"{name}.parquet")
        shutil.copy(part, dst)
        t = _time.time() - 100 + i * 10
        os.utime(dst, (t, t))

    pages_root = str(tmp_path / "pages_cat")
    stream = (spark.readStream.schema(PAGES_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    run_pages_ingest(spark, stream, pages_root,
                     str(tmp_path / "ckpt"))

    pages_cat = GraphCatalog(pages_root)
    live = [p0_v2] + p[1:16]
    got_pages = {(r["url"], bytes(r["html"])) for r in
                 pages_cat.read_table(spark, "pages")
                 .select("url", "html").collect()}
    assert got_pages == {(r["url"], bytes(r["html"])) for r in
                         map(dict, live)}

    # replaying an already-committed batch id is a no-op
    n_snaps = len(pages_cat.snapshots("pages"))
    last_id = (pages_cat.latest_snapshot("pages")["props"]
               ["last_batch_id"])
    sink = pages_ingest_sink(spark, pages_cat)
    sink(pages_df(spark, p[:4]), last_id)
    assert len(pages_cat.snapshots("pages")) == n_snaps

    graph_cat = GraphCatalog(str(tmp_path / "graph"))
    sync_kg(spark, pages_cat, graph_cat, kg_dims, n_tasks=2)
    assert _graph_state(spark, graph_cat) == _rebuild(spark, live, kg_dims)


def test_ingest_replay_survives_interleaved_maintenance(
        spark, fixture_pages, tmp_path):
    """Exactly-once must hold even when another commit lands between a
    batch's commit and its post-crash replay: a compact_table on pages
    moves the head PAST the batch-id marker, and a head-only replay
    check would apply the batch twice (duplicate changelog entries, a
    spurious upsert commit). The marker scan must still skip it."""
    from uckg_spark.streaming.pages_stream import pages_ingest_sink

    p = fixture_pages
    pages_cat = GraphCatalog(str(tmp_path / "pages_cat"))
    sink = pages_ingest_sink(spark, pages_cat)
    sink(pages_df(spark, p[:6]), 0)
    sink(pages_df(spark, p[6:10]), 1)
    # interleaved maintenance: compaction commits a NEW head whose props
    # carry no batch marker
    pages_cat.compact_table(spark, "pages", n_tasks=2)
    assert "last_batch_id" not in (
        pages_cat.latest_snapshot("pages").get("props") or {})
    n_snaps = len(pages_cat.snapshots("pages"))
    before = {(r["url"], bytes(r["html"])) for r in
              pages_cat.read_table(spark, "pages")
              .select("url", "html").collect()}
    # crash-replay of batch 1 AFTER the compaction: must be a no-op
    sink(pages_df(spark, p[6:10]), 1)
    assert len(pages_cat.snapshots("pages")) == n_snaps
    got = {(r["url"], bytes(r["html"])) for r in
           pages_cat.read_table(spark, "pages")
           .select("url", "html").collect()}
    assert got == before

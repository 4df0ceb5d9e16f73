"""End-to-end pages-pipeline parity (the BASELINE.json gates):
1. byte-identical extracted text per url (input_hint);
2. triple set P/R ≥ 0.95 vs the oracle (exact equality expected on
   fixtures — the assertion is equality, strictly stronger).
"""

from uckg_spark.operators.extract import extract_pages
from uckg_spark.oracle.kg_oracle import run_oracle
from uckg_spark.plans.kg_pipeline import build_triples, materialize_graph
from uckg_spark.sources.pages import pages_df


def test_extraction_byte_identity(spark, fixture_pages, oracle_dicts):
    pdf = pages_df(spark, fixture_pages)
    got = {r["url"]: r["text"] for r in extract_pages(pdf).collect()}
    gold_text, _ = run_oracle(fixture_pages, oracle_dicts)
    assert set(got) == set(gold_text)
    for url, text in gold_text.items():
        assert got[url] == text, url  # bytes == (str equality on utf-8 text)


def test_triple_set_parity(spark, fixture_pages, oracle_dicts, kg_dims):
    pdf = pages_df(spark, fixture_pages)
    got = {tuple(r) for r in build_triples(spark, pdf, kg_dims).collect()}
    _, gold = run_oracle(fixture_pages, oracle_dicts)
    gold = {tuple(t) for t in gold}
    inter = len(got & gold)
    precision = inter / len(got) if got else 0.0
    recall = inter / len(gold) if gold else 0.0
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    assert got == gold  # fixtures: exact equality

    nodes, edges = materialize_graph(
        build_triples(spark, pdf, kg_dims)
    )
    n_nodes = nodes.count()
    assert n_nodes == nodes.select("uri").distinct().count()  # URI-unique (A2)
    assert edges.count() > 0


def test_duplicate_pages_idempotent(spark, fixture_pages, kg_dims):
    """~2% duplicated urls (identical html) must not change the triple set
    (A1 set semantics / idempotent re-emission)."""
    pdf = pages_df(spark, fixture_pages)
    doubled = pages_df(spark, fixture_pages + fixture_pages[:10])
    a = {tuple(r) for r in build_triples(spark, pdf, kg_dims).collect()}
    b = {tuple(r) for r in build_triples(spark, doubled, kg_dims).collect()}
    assert a == b

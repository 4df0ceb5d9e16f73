"""End-to-end web-graph composition: crafted pages → page_links →
host_graph → pagerank_fixed. Pins that the families interlock (the
Common-Crawl workload: corpus in, ranked host graph out) and that the
authority host actually outranks the satellites."""

from uckg_spark.operators.webgraph import host_graph, page_links
from uckg_spark.plans.graphalgs import pagerank_fixed


def _page(host, i, targets):
    body = "".join(
        f'<a href="https://{t}/p">to {t}</a>' for t in targets)
    return (f"https://{host}/page{i}",
            f"<html><body>{body}</body></html>".encode())


def test_pages_to_ranked_host_graph(spark):
    # hub.example links out to everyone; everyone links to
    # authority.example; satellites link only to the authority
    rows = [
        _page("hub.example", 0, ["authority.example", "s1.example"]),
        _page("hub.example", 1, ["authority.example", "s2.example"]),
        _page("s1.example", 0, ["authority.example"]),
        _page("s2.example", 0, ["authority.example"]),
        _page("authority.example", 0, ["hub.example"]),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    hosts = host_graph(page_links(pages))
    edges = hosts.selectExpr("src_host as subj", "dst_host as obj")
    ranks = {r["node"]: r["rank"]
             for r in pagerank_fixed(edges, iterations=3).collect()}
    assert set(ranks) == {"hub.example", "authority.example",
                          "s1.example", "s2.example"}
    # the in-degree-4 authority dominates; satellites receive nothing
    assert ranks["authority.example"] > ranks["hub.example"]
    assert ranks["hub.example"] > ranks["s1.example"]
    assert ranks["s1.example"] == ranks["s2.example"]

    hg = {(r["src_host"], r["dst_host"]): r["n_links"]
          for r in hosts.collect()}
    assert hg[("hub.example", "authority.example")] == 2
    assert hg[("s1.example", "authority.example")] == 1

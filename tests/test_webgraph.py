"""Web link-graph family (operators/webgraph.py + kernel/links.py):
hand-computed link sets on crafted HTML (NOT kernel-vs-itself), host
rollup semantics, and anchor-text top-k determinism."""

from uckg_spark.kernel.links import extract_links
from uckg_spark.operators.webgraph import anchor_texts, host_graph, page_links

P1 = (
    "https://a.example.com/dir/page1",
    b'<html><body>'
    b'<a href="https://b.example.com:443/x/">cross <b>site</b></a>'
    b'<a href="../other">relative link</a>'
    b'<a href="#frag">skip me</a>'
    b'<a href="javascript:void(0)">skip too</a>'
    b'<a href="/root">first <a href="sub">implicit close</a>'
    b'</body></html>',
)
P2 = (
    "http://c.example.com:80/",
    b'<html><body>'
    b'<a href="https://b.example.com/x/">cross site</a>'
    b'<a href="https://b.example.com/x/">cross site</a>'
    b'<a href="http://c.example.com/self">me</a>'
    b'</body></html>',
)


def test_kernel_link_extraction_hand_checked():
    got = extract_links(P1[1], P1[0])
    assert got == [
        ("https://b.example.com:443/x/", "cross site"),
        ("https://a.example.com/other", "relative link"),
        ("https://a.example.com/root", "first"),      # implicitly closed
        ("https://a.example.com/dir/sub", "implicit close"),
    ]
    assert extract_links(None, P1[0]) == []
    assert extract_links(b"\xff\xfe not html", P1[0]) == []


def _links(spark):
    df = spark.createDataFrame(
        [P1, P2], "url string, html binary")
    return page_links(df.withColumn("warc_ts", df.url.cast("timestamp")))


def test_page_links_normalizes_targets(spark):
    rows = {(r["src"], r["dst"], r["anchor"], r["pos"])
            for r in _links(spark).collect()}
    assert rows == {
        # :443 dropped (https default), trailing slash trimmed
        ("https://a.example.com/dir/page1", "https://b.example.com/x", "cross site", 0),
        ("https://a.example.com/dir/page1", "https://a.example.com/other", "relative link", 1),
        ("https://a.example.com/dir/page1", "https://a.example.com/root", "first", 2),
        ("https://a.example.com/dir/page1", "https://a.example.com/dir/sub", "implicit close", 3),
        ("http://c.example.com:80/", "https://b.example.com/x", "cross site", 0),
        ("http://c.example.com:80/", "https://b.example.com/x", "cross site", 1),
        ("http://c.example.com:80/", "http://c.example.com/self", "me", 2),
    }


def test_host_graph_rollup(spark):
    got = {(r["src_host"], r["dst_host"]): (r["n_links"], r["n_pages"], r["is_internal"])
           for r in host_graph(_links(spark)).collect()}
    assert got[("a.example.com", "b.example.com")] == (1, 1, False)
    assert got[("a.example.com", "a.example.com")] == (3, 1, True)
    # page 2 links b twice but counts once in n_pages
    assert got[("c.example.com", "b.example.com")] == (2, 1, False)
    assert got[("c.example.com", "c.example.com")] == (1, 1, True)


def test_anchor_texts_topk(spark):
    got = {(r["dst"], r["rk"]): (r["anchor"], r["n"])
           for r in anchor_texts(_links(spark), k=2).collect()}
    assert got[("https://b.example.com/x", 1)] == ("cross site", 3)
    assert ("https://b.example.com/x", 2) not in got  # only one distinct anchor
    assert got[("https://a.example.com/root", 1)] == ("first", 1)

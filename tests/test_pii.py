"""pii_scrub (operators/webtext.py): replacement + count semantics on
crafted edge cases — sequential pass ordering, word-boundary strictness,
and pass-through of clean text."""

from uckg_spark.operators.webtext import pii_scrub


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string")
    return {r["doc_id"]: r for r in pii_scrub(df).collect()}


def test_each_kind_scrubbed_and_counted(spark):
    out = _run(spark, [
        "mail a.b+c@ex-ample.co.uk now",
        "server 10.0.255.3 and 192.168.1.1 up",
        "call 555-123-4567 or 555-9876 4321",
    ])
    assert out[0]["text_scrubbed"] == "mail <EMAIL> now"
    assert (out[0]["n_email"], out[0]["n_ipv4"], out[0]["n_phone"]) == (1, 0, 0)
    assert out[1]["text_scrubbed"] == "server <IP> and <IP> up"
    assert out[1]["n_ipv4"] == 2
    assert out[2]["text_scrubbed"] == "call <PHONE> or <PHONE>"
    assert out[2]["n_phone"] == 2


def test_sequential_passes_do_not_double_count(spark):
    # the email's digits must not later count as ip/phone, and an
    # email @ an IP-shaped host is consumed by whichever pattern
    # matches it first in pass order (here: ipv4 host has no alpha TLD,
    # so the email pass skips it and the ip pass takes the host only)
    out = _run(spark, ["u555-123-4567x@h.org or root@10.1.2.3 done"])
    r = out[0]
    assert r["text_scrubbed"] == "<EMAIL> or root@<IP> done"
    assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (1, 1, 0)


def test_word_boundary_strictness(spark):
    out = _run(spark, [
        "build 1234.1.1.1 is not an ip",   # 4-digit first octet: no \b start
        "semver 1.2.3 is not an ip",       # only 3 octets
        "id 123-4567 needs a third group", # phone needs 3 groups
    ])
    for i in range(3):
        assert out[i]["text_scrubbed"].startswith(("build", "semver", "id"))
        assert (out[i]["n_email"], out[i]["n_ipv4"], out[i]["n_phone"]) == (0, 0, 0)
    assert out[0]["text_scrubbed"] == "build 1234.1.1.1 is not an ip"


def test_clean_text_passes_through(spark):
    texts = ["the quick brown fox", ""]
    out = _run(spark, texts)
    for i, t in enumerate(texts):
        assert out[i]["text_scrubbed"] == t

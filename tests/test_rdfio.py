"""N-Triples round-trip (SURVEY §2.11 R3): serialize → parse must be
the identity on (subj, pred, obj, obj_is_literal) with absent datatypes
normalized to the '' sentinel. The reference's analogous surface is the
rdflib→OWL/XML→rdflib ontology round-trip
(process/ontology_updater.py:52-82); the distributed carrier here is
line-oriented N-Triples so both directions stay row-maps."""

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from uckg_spark.sources.rdfio import from_ntriples, to_ntriples

SCHEMA = ("subj string, pred string, obj string, "
          "obj_is_literal boolean, obj_datatype string")


def _roundtrip(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    back = from_ntriples(to_ntriples(df))
    want = sorted(
        (s, p, o, lit, dt if (lit and dt) else "")
        for s, p, o, lit, dt in rows
    )
    got = sorted(map(tuple, back.collect()))
    assert got == want


ADVERSARIAL = [
    ("s:a", "p:x", "plain body", True, None),
    ("s:b", "p:x", 'quote " inside', True, ""),
    ("s:c", "p:x", "backslash-n \\n is NOT a newline", True, None),
    ("s:d", "p:x", "real\nnewline\rand\ttab", True, "xsd:string"),
    ("s:e", "p:x", "\\\\\\", True, None),            # odd backslash run
    ("s:f", "p:x", 'trailing quote"', True, None),
    ("s:g", "p:x", "", True, "xsd:token"),           # empty literal
    ("s:h", "p:x", '"^^<xsd:fake>', True, None),     # datatype-lookalike BODY
    ("s:i", "p:x", "ends with dot .", True, None),
    ("s:j", "p:y", "obj:iri/1", False, None),        # IRI object
    ("s:k", "p:y", "unicode é 中文 🙂", True, None),
]


def test_adversarial_roundtrip(spark):
    _roundtrip(spark, ADVERSARIAL)


def test_one_triple_one_line(spark):
    """LF/CR are escaped, so the serialized output NEVER spans lines —
    the property that makes spark.read.text a correct reader."""
    df = spark.createDataFrame(ADVERSARIAL, SCHEMA)
    lines = [r.line for r in to_ntriples(df).collect()]
    assert all("\n" not in ln and "\r" not in ln for ln in lines)
    assert all(ln.endswith(" .") for ln in lines)


def test_iri_and_plain_literal_forms(spark):
    df = spark.createDataFrame(
        [("s", "p", "o:iri", False, None), ("s", "p", "v", True, None)],
        SCHEMA)
    lines = sorted(r.line for r in to_ntriples(df).collect())
    assert lines == ['<s> <p> "v" .', "<s> <p> <o:iri> ."]


def test_pipeline_triples_roundtrip(spark, fixture_pages, kg_dims):
    """The engine's own emission output survives the text carrier:
    build_triples → N-Triples → parse == the original triple set."""
    from uckg_spark.plans.kg_pipeline import build_triples
    from uckg_spark.sources.pages import pages_df

    t = build_triples(spark, pages_df(spark, fixture_pages), kg_dims).select(
        "subj", "pred", "obj", "obj_is_literal",
        F.coalesce("obj_datatype", F.lit("")).alias("obj_datatype"))
    back = from_ntriples(to_ntriples(t))
    assert sorted(map(tuple, t.collect())) == sorted(
        map(tuple, back.collect()))


def test_comment_and_blank_lines_skipped(spark):
    """Real N-Triples dumps interleave comments and blank lines; the
    reader drops them instead of parsing garbage rows."""
    lines = spark.createDataFrame(
        [("# a comment",), ("",), ("   ",), ('<s> <p> "v" .',),
         ("  # indented comment",)], "line string")
    got = [tuple(r) for r in from_ntriples(lines).collect()]
    assert got == [("s", "p", "v", True, "")]


def test_disk_roundtrip(spark, tmp_path):
    """The full export/import path: to_ntriples → write.text →
    spark.read.text → from_ntriples is the identity — the distributed
    S9-sink shape (any partitioning, any reader parallelism)."""
    df = spark.createDataFrame(ADVERSARIAL, SCHEMA)
    out = str(tmp_path / "nt")
    to_ntriples(df).repartition(3).write.text(out)
    back = from_ntriples(spark.read.text(out).withColumnRenamed(
        "value", "line"))
    want = sorted((s, p, o, lit, dt if (lit and dt) else "")
                  for s, p, o, lit, dt in ADVERSARIAL)
    assert sorted(map(tuple, back.collect())) == want


# printable-ish text plus the escape-relevant characters, biased so
# quotes/backslashes/control chars appear often
_BODY = st.text(
    alphabet=st.sampled_from(list('ab"\\\n\r\t .<>^') + ["é", "中"]),
    max_size=24,
)


@settings(max_examples=40, deadline=None)
@given(bodies=st.lists(_BODY, min_size=1, max_size=8),
       dt=st.sampled_from(["", "xsd:string"]))
def test_property_roundtrip(spark, bodies, dt):
    rows = [(f"s:{i}", "p:x", b, True, dt) for i, b in enumerate(bodies)]
    _roundtrip(spark, rows)

"""N-Triples text serialization and parsing — the format round-trip
surface (SURVEY §2.11 R3, previously a documented non-goal).

The reference round-trips its merged ontology through a text carrier
(rdflib → OWL/XML → rdflib, ``process/ontology_updater.py:52-82``).
The distributed analog here uses N-Triples, not OWL/XML or Turtle, on
purpose: N-Triples is the one W3C RDF syntax that is line-oriented and
state-free — one triple per line, no prefix table, no nesting — so
BOTH directions are embarrassingly parallel row maps (pure JVM string
expressions, whole-stage codegen, zero shuffles, zero document-global
state). Turtle/OWL-XML need document-level prefix/nesting context and
would serialize through a single writer; N-Triples shards to any
partitioning, which is why it is the interchange format large RDF
stores actually bulk-load at scale.

Escaping follows the N-Triples 1.1 canonical set for literal bodies:
``\\`` ``\"`` ``\n`` ``\r`` ``\t``. Because LF/CR are escaped, one
serialized triple is ALWAYS one text line — the property that makes
``spark.read.text`` + :func:`from_ntriples` a correct distributed
reader. IRIs are emitted verbatim inside ``<>``; the engine's URI
templates (``kernel/templates.py``) never produce ``>`` or whitespace
in an IRI, which is the documented precondition.

Round-trip contract: ``from_ntriples(to_ntriples(df))`` is the
identity on (subj, pred, obj, obj_is_literal) and maps an absent
datatype (NULL or '') to the '' sentinel — driver rows ship NULL-free
columns, and '' is not a legal datatype IRI so nothing collides.
Property-tested in ``tests/test_rdfio.py`` over adversarial strings
(quotes, backslash runs, tabs, newlines, unicode).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.column import Column

# order matters: backslash FIRST on escape (or the escapes' own
# backslashes would be re-escaped) …
_SIMPLE_ESCAPES = [('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t")]


def ntriples_escape(col: Column) -> Column:
    """Escape a literal body for N-Triples: ``\\`` then the quote/LF/
    CR/TAB set. Pure ``F.replace`` chain — literal (non-regex) replace,
    stays in codegen."""
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    for raw, esc in _SIMPLE_ESCAPES:
        out = F.replace(out, F.lit(raw), F.lit(esc))
    return out


def ntriples_unescape(col: Column) -> Column:
    """Invert :func:`ntriples_escape` in ONE logical pass. Sequential
    global replaces are WRONG here (``\\\\n`` — an escaped backslash
    followed by a literal ``n`` — must not decode to LF), so: split on
    the two-character escaped-backslash token, decode the four simple
    escapes inside each segment (segments contain no double backslash
    by construction, so every remaining ``\\n`` is a genuine escape),
    re-join with a single backslash."""
    segs = F.split(col, "\\\\\\\\", -1)  # Java regex for two literal backslashes
    def _seg(s: Column) -> Column:
        for raw, esc in _SIMPLE_ESCAPES:
            s = F.replace(s, F.lit(esc), F.lit(raw))
        return s
    return F.array_join(F.transform(segs, _seg), "\\")


def to_ntriples(
    df: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    is_literal: str = "obj_is_literal",
    datatype: str = "obj_datatype",
) -> DataFrame:
    """Serialize a triples DataFrame to one N-Triples ``line`` per row.

    Literal objects become ``"escaped body"`` with an optional
    ``^^<datatype>`` suffix (datatype NULL or '' means plain literal);
    IRI objects become ``<iri>``. Row map — no shuffle, any
    partitioning survives, so a 10^12-triple export is
    ``to_ntriples(t).write.text(...)`` at full cluster width.
    """
    dt = F.col(datatype)
    has_dt = dt.isNotNull() & (dt != F.lit(""))
    lit_term = F.concat(
        F.lit('"'), ntriples_escape(F.col(obj)), F.lit('"'),
        F.when(has_dt, F.concat(F.lit("^^<"), dt, F.lit(">")))
        .otherwise(F.lit("")),
    )
    obj_term = F.when(F.col(is_literal), lit_term).otherwise(
        F.concat(F.lit("<"), F.col(obj), F.lit(">")))
    return df.select(
        F.concat(
            F.lit("<"), F.col(subj), F.lit("> <"), F.col(pred),
            F.lit("> "), obj_term, F.lit(" ."),
        ).alias("line")
    )


# one line: <s> <p> TERM .  — TERM greedy to the final " ." anchor, so
# escaped quotes/dots inside a literal body cannot truncate the term
_LINE_RE = "^<([^>]*)> <([^>]*)> (.*) \\.$"
_LIT_RE = '^"(.*)"(?:\\^\\^<([^>]*)>)?$'


def from_ntriples(
    lines: DataFrame, col: str = "line", keep_line: bool = False
) -> DataFrame:
    """Parse N-Triples lines back to ``(subj, pred, obj,
    obj_is_literal, obj_datatype)``. Inverse of :func:`to_ntriples`;
    absent datatypes come back as the NULL-free '' sentinel
    (``regexp_extract``'s no-match value). Row map, zero shuffles.
    ``keep_line=True`` prepends the carrier line to the output (the
    wire-format-plus-parse shape the driver row checks).

    Blank lines and ``#`` comment lines — legal in N-Triples files and
    routine in real dumps — are dropped (a filter on the raw line, so
    it pushes into the scan), not parsed into garbage rows."""
    lines = lines.filter(
        ~F.col(col).rlike(r"^\s*(#.*)?$"))
    term = F.regexp_extract(F.col(col), _LINE_RE, 3)
    is_lit = F.startswith(term, F.lit('"'))
    body = F.regexp_extract(term, _LIT_RE, 1)
    dt = F.regexp_extract(term, _LIT_RE, 2)
    iri = F.regexp_extract(term, "^<(.*)>$", 1)
    return lines.select(
        *([F.col(col).alias("line")] if keep_line else []),
        F.regexp_extract(F.col(col), _LINE_RE, 1).alias("subj"),
        F.regexp_extract(F.col(col), _LINE_RE, 2).alias("pred"),
        F.when(is_lit, ntriples_unescape(body)).otherwise(iri).alias("obj"),
        is_lit.alias("obj_is_literal"),
        F.when(is_lit, dt).otherwise(F.lit("")).alias("obj_datatype"),
    )

"""Basic graph-pattern matching over a (subj, pred, obj) edge table —
the query surface of the knowledge graph.

The reference stores its KG in Neo4j and its users query it with Cypher
patterns (e.g. the n10s-loaded graph in
/root/reference/process/graph_updater.py:13-45 is the product the
pipeline exists to serve). The Spark-native equivalent is conjunctive
triple-pattern matching compiled to a join chain over the edges table:

    match_pattern(edges, [("?o", "placed_by", "?c"),
                          ("?c", "in_nation", "nation:5")])

returns one column per variable (`o`, `c`), exactly a Cypher
``MATCH (o)-[:placed_by]->(c)-[:in_nation]->(:nation5)``.

Execution shape at 100 TB:
- constant predicates/subjects/objects become pushed-down scan filters
  on the pred-partitioned edges table (partition pruning — the catalog
  writes edges partitioned by pred, `sources/catalog.py`), so each
  pattern step reads only its predicate's partition;
- steps join on their shared variables, which is exactly the key the
  shuffle needs — no cartesian unless the PATTERN is disconnected, and
  a disconnected pattern raises instead of silently exploding;
- duplicate edges cannot multiply results: graph semantics are set
  semantics, so each step is deduped before joining (cheap map-side
  combine; the A1 global dedup usually makes it a no-op).

Equality semantics: a variable reused WITHIN one triple pattern (e.g.
(?x, likes, ?x)) constrains subj = obj.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VAR = "?"


def _is_var(term: str) -> bool:
    return term.startswith(VAR)


def parse_pattern(text: str) -> list[tuple[str, str, str]]:
    """Parse a SPARQL-ish basic graph pattern into ``match_pattern``
    steps: whitespace-separated ``s p o`` triples joined by ``.``, with
    ``?name`` variables — e.g.
    ``"?o hasCustomer ?c . ?c inNation nation:5"``. A text front door
    only: the plan, the connectivity check, and every semantic live in
    ``match_pattern``; this function just tokenizes and validates
    shape, so there is no second query semantics to drift.
    """
    steps: list[tuple[str, str, str]] = []
    for i, raw in enumerate(text.split(".")):
        terms = raw.split()
        if not terms and (i == len(text.split(".")) - 1):
            continue  # trailing dot
        if len(terms) != 3:
            raise ValueError(
                f"pattern step {i} must be exactly 's p o': {raw.strip()!r}")
        steps.append(tuple(terms))
    if not steps:
        raise ValueError("empty pattern text")
    return steps


def query_pattern(edges: DataFrame, text: str, **kw) -> DataFrame:
    """``match_pattern(edges, parse_pattern(text))`` — the one-line KG
    query surface (the Cypher/SPARQL analog of the reference's Neo4j
    read path)."""
    return match_pattern(edges, parse_pattern(text), **kw)


def match_pattern(
    edges: DataFrame,
    pattern: list[tuple[str, str, str]],
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """Match a conjunctive basic graph pattern against ``edges``.

    Each pattern element is (s, p, o); terms beginning with ``?`` are
    variables, anything else is a constant literal. Returns a DataFrame
    with one column per distinct variable (name without the ``?``),
    deduplicated (set semantics).

    Raises ValueError for an empty pattern, a pattern with no variables,
    or a DISCONNECTED pattern (a step sharing no variable with the steps
    before it would be a cartesian product — at corpus scale that is an
    outage, so it is an error the caller must opt out of by splitting
    the query).
    """
    if not pattern:
        raise ValueError("empty pattern")

    result: DataFrame | None = None
    bound: set[str] = set()
    for step_i, (s, p, o) in enumerate(pattern):
        step = edges
        cols = []
        seen_vars: dict[str, str] = {}
        for term, col in ((s, subj), (p, pred), (o, obj)):
            if _is_var(term):
                name = term[1:]
                if name in seen_vars:  # repeated var inside one step
                    step = step.filter(F.col(col) == F.col(seen_vars[name]))
                else:
                    seen_vars[name] = col
                    cols.append(F.col(col).alias(name))
            else:
                step = step.filter(F.col(col) == term)
        if not cols:
            raise ValueError(f"pattern step {step_i} binds no variable")
        step_df = step.select(*cols).dropDuplicates()

        if result is None:
            result = step_df
        else:
            on = sorted(bound & set(seen_vars))
            if not on:
                raise ValueError(
                    f"pattern step {step_i} shares no variable with the "
                    "previous steps — a cartesian product; split the query"
                )
            result = result.join(step_df, on)
        bound |= set(seen_vars)

    return result.dropDuplicates()


def degree_stats(
    edges: DataFrame, subj: str = "subj", pred: str = "pred", obj: str = "obj"
) -> DataFrame:
    """Per-node out/in degree and distinct-predicate fan-out — the first
    profile anyone runs on a freshly built KG (hot-entity skew shows up
    here before it shows up as a straggler task). One union + one
    aggregation shuffle keyed by the node."""
    out_d = edges.select(F.col(subj).alias("node"), F.col(pred).alias("p"),
                         F.lit(1).alias("is_out"))
    in_d = edges.select(F.col(obj).alias("node"), F.col(pred).alias("p"),
                        F.lit(0).alias("is_out"))
    return (
        out_d.unionByName(in_d)
        .groupBy("node")
        .agg(
            F.sum("is_out").cast("bigint").alias("out_degree"),
            F.sum(1 - F.col("is_out")).cast("bigint").alias("in_degree"),
            F.countDistinct("p").cast("bigint").alias("n_predicates"),
        )
    )

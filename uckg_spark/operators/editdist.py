"""Edit-distance entity-resolution pairs — exact, without all-pairs.

Linking vendor/product surface forms means finding names within small
edit distance (typos, dropped digits). The naive form is a quadratic
levenshtein join; the scale form is deletion-neighborhood blocking
(FastSS / the SymSpell family): for k=1, two strings have edit
distance <= 1 IFF they share a member of their deletion neighborhoods
D(s) = {s} ∪ {s with one char deleted} — equality shares s itself, a
substitution shares the string with the edited position deleted, an
insert/delete shares the shorter string. So candidates are an
EQUI-join on exploded deletion signatures (complete by the argument
above — zero recall loss), then verified with one levenshtein call.

Scale shape: |s|+1 signatures per row explode map-side; the candidate
join keys on the signature (skew = identical-prefix families, AQE
splits them); verification joins names back by id and runs inside
codegen (`levenshtein` is a JVM builtin — and the same DP in DuckDB,
so the verified distances compare exactly). State is |rows|·(|s|+1)
signature rows — linear, vs the quadratic candidate set a length-band
blocking would pass at this name density.

k > 1 generalizes by deleting up to k chars (signature count grows
~|s|^k — SymSpell's trade); this operator pins k=1, the typo case
entity linking actually runs at, and raises otherwise rather than
silently degrading.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _deletion_sigs(s):
    """{s} ∪ single-char deletions, distinct. sequence(1, len) is only
    evaluated for non-empty strings — sequence() DESCENDS (and at worst
    throws) when its end is below its start."""
    dels = F.when(
        F.length(s) > 0,
        F.transform(
            F.sequence(F.lit(1), F.length(s)),
            lambda i: F.concat(
                s.substr(F.lit(1), i - 1),
                s.substr(i + 1, F.length(s)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(F.concat(F.array(s), dels))


def er_canonical_names(df: DataFrame, text_col: str) -> DataFrame:
    """Entity resolution END-TO-END for name typos: distinct names →
    edit-distance<=1 pairs (deletion-signature blocking) → connected
    components → ``(member, canonical)`` with canonical = the cluster's
    lexicographic-min name. The same composition shape as the corpus's
    ``near_duplicate_keepers`` (LSH → CC → keeper), instantiated for
    the KG's vendor/product surface forms: downstream, a left join +
    coalesce rewrites every mention to its canonical name. Only
    clustered names appear (singletons are their own canonical — the
    join default), matching ``canonical_map``'s contract."""
    from .canonicalize import connected_components

    names = df.select(F.col(text_col).alias("name")).where(
        F.col(text_col).isNotNull()).distinct()
    pairs = edit_distance_pairs(names, "name", "name")
    cc = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    return cc.select(
        F.col("node").alias("member"), F.col("component").alias("canonical")
    )


def edit_distance_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All pairs with levenshtein <= ``max_dist`` (only 1 supported):
    ``(id_a, id_b, dist)`` with ``id_a < id_b`` — exact recall via
    deletion-signature blocking, no quadratic join."""
    if max_dist != 1:
        raise ValueError(
            f"only max_dist=1 is supported (got {max_dist}); see module "
            "docstring for the k>1 signature-count trade")
    named = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("s")
    ).where(F.col(text_col).isNotNull())
    sigs = named.select(
        "id", F.explode(_deletion_sigs(F.col("s"))).alias("sig")
    )
    cands = (
        sigs.alias("l")
        .join(sigs.alias("r"), "sig")
        .where(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    return (
        cands.join(named.withColumnsRenamed({"id": "id_a", "s": "sa"}),
                   "id_a")
        .join(named.withColumnsRenamed({"id": "id_b", "s": "sb"}), "id_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein("sa", "sb").cast("bigint").alias("dist"),
        )
        .where(F.col("dist") <= max_dist)
    )

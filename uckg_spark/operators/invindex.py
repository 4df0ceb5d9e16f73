"""Inverted index construction — the retrieval structure behind search.

``bm25_rank`` (operators/search.py) scores every document; at 10^12
docs the scorer needs a candidate prefilter, and that is an inverted
index: token → sorted posting list of documents containing it. This
operator materializes exactly that table, with the two classic
document-frequency gates applied WHERE they are cheap:

- ``min_df`` drops hapax/noise tokens (the long tail that dominates
  index size but never matches a query),
- ``max_df`` drops stopwords (posting lists that approach |corpus| are
  useless for pruning and are precisely the skewed groups that would
  hurt the collect).

Scale shape: explode → per-row DISTINCT inside the token array (set
semantics before the shuffle, so a token repeated 100× in a doc ships
once), then ONE (token)-keyed aggregation that counts df and collects
the postings together. The df gates are applied as a HAVING on the
same aggregation — filtered groups never materialize their list. At
web scale the posting arrays are the one unbounded-per-group payload;
``max_df`` is the honest cap (a stopword list at 10^12 docs is not an
array, it is a non-goal), and shards of the index partition naturally
by token hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens


def build_inverted_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_df: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """Token → ``(token, df, postings)`` with ``postings`` the SORTED
    array of distinct document ids containing the token; tokens outside
    ``[min_df, max_df]`` document frequency are dropped inside the
    aggregation."""
    if min_df < 1:
        raise ValueError(f"min_df must be >= 1, got {min_df}")
    if max_df is not None and max_df < min_df:
        raise ValueError(f"max_df {max_df} < min_df {min_df}")
    pairs = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("token"),
    )
    gate = F.col("df") >= min_df
    if max_df is not None:
        gate = gate & (F.col("df") <= max_df)
    return (
        pairs.groupBy("token")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("df"),
            F.sort_array(F.collect_list("id")).alias("postings"),
        )
        .where(gate)
    )

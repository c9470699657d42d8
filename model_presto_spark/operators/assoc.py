"""Co-occurrence / association mining (PMI) over contexts.

Market-basket-style association signal: how much more often two
items appear in the same context (a user-day, a session, a document)
than independence predicts — pointwise mutual information
``pmi(a,b) = ln(n_ab * N / (n_a * n_b))``.

Plan shape is the inverted-index pair generation of the n-gram dedup
family: distinct (context, item) postings, pairs produced INSIDE a
context via a context-keyed self-join (never an all-pairs join
across contexts), marginals and the context count as broadcastable
aggregates. The ``max_context_items`` guard drops pathological
contexts (a context with d items emits C(d,2) pairs — the same d²
skew the dedup operators cap), keeping the operator safe on
heavy-tailed corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cooccurrence_pmi(
    df: DataFrame,
    context_cols: list[str],
    item_col: str,
    min_pair_count: int = 1,
    max_context_items: int | None = None,
) -> DataFrame:
    """(item_a, item_b, n_ab, pmi) for unordered item pairs sharing
    at least ``min_pair_count`` contexts; item_a < item_b.

    ``n_a`` marginals count CONTEXTS containing the item (set
    semantics — repeated occurrences within a context don't inflate
    the association).
    """
    post = df.select(*context_cols, item_col).distinct()
    if max_context_items is not None:
        w = Window.partitionBy(*context_cols)
        post = post.withColumn("__csize", F.count("*").over(w)).where(
            F.col("__csize") <= max_context_items
        ).drop("__csize")
    post = post.persist()
    n_ctx = post.select(*context_cols).distinct().count()
    marg = post.groupBy(item_col).agg(F.count("*").alias("n_i"))
    a = post.select(*context_cols, F.col(item_col).alias("item_a"))
    b = post.select(*context_cols, F.col(item_col).alias("item_b"))
    pairs = (
        a.join(b, context_cols)
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= min_pair_count)
    )
    ma = marg.select(
        F.col(item_col).alias("item_a"), F.col("n_i").alias("n_a")
    )
    mb = marg.select(
        F.col(item_col).alias("item_b"), F.col("n_i").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(ma), "item_a")
        .join(F.broadcast(mb), "item_b")
        .select(
            "item_a",
            "item_b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.log(
                F.col("n_ab").cast("double")
                * F.lit(float(n_ctx))
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("pmi"),
        )
    )

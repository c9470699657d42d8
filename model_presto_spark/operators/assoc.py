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


def frequent_itemsets(
    df: DataFrame,
    context_cols: list[str],
    item_col: str,
    min_count: int,
    max_size: int = 3,
    max_context_items: int | None = None,
) -> DataFrame:
    """Apriori-style frequent itemsets of size 1..max_size (<= 3)
    with basket-support at least ``min_count``.

    Baskets are distinct (context, item) postings; level k candidates
    are generated only from baskets RESTRICTED to level-1-frequent
    items (the Apriori prune), via within-context ordered self-joins
    — the co-occurrence shape with the same ``max_context_items``
    d-squared guard as PMI mining. Level-k counts are exact.

    Output rows: (item1, item2, item3, set_size, support) — items
    sorted, unused slots null.
    """
    if not 1 <= max_size <= 3:
        raise ValueError("max_size must be 1, 2 or 3")
    post = df.select(*context_cols, item_col).distinct()
    if max_context_items is not None:
        w = Window.partitionBy(*context_cols)
        post = post.withColumn("__csize", F.count("*").over(w)).where(
            F.col("__csize") <= max_context_items
        ).drop("__csize")
    post = post.persist()
    l1 = post.groupBy(item_col).agg(F.count("*").alias("support")).where(
        F.col("support") >= min_count
    )
    out = l1.select(
        F.col(item_col).alias("item1"),
        F.lit(None).cast("string").alias("item2"),
        F.lit(None).cast("string").alias("item3"),
        F.lit(1).alias("set_size"),
        F.col("support").cast("bigint").alias("support"),
    )
    if max_size == 1:
        return out
    # Apriori prune: only level-1-frequent items participate upward
    fpost = post.join(
        F.broadcast(l1.select(item_col)), item_col
    ).persist()
    b1 = fpost.select(*context_cols, F.col(item_col).alias("i1"))
    b2 = fpost.select(*context_cols, F.col(item_col).alias("i2"))
    pairs = (
        b1.join(b2, context_cols)
        .where(F.col("i1") < F.col("i2"))
        .groupBy("i1", "i2")
        .agg(F.count("*").alias("support"))
        .where(F.col("support") >= min_count)
    )
    out = out.unionByName(
        pairs.select(
            F.col("i1").alias("item1"),
            F.col("i2").alias("item2"),
            F.lit(None).cast("string").alias("item3"),
            F.lit(2).alias("set_size"),
            F.col("support").cast("bigint").alias("support"),
        )
    )
    if max_size == 2:
        return out
    b3 = fpost.select(*context_cols, F.col(item_col).alias("i3"))
    triples = (
        b1.join(b2, context_cols)
        .where(F.col("i1") < F.col("i2"))
        .join(b3, context_cols)
        .where(F.col("i2") < F.col("i3"))
        .groupBy("i1", "i2", "i3")
        .agg(F.count("*").alias("support"))
        .where(F.col("support") >= min_count)
    )
    return out.unionByName(
        triples.select(
            F.col("i1").alias("item1"),
            F.col("i2").alias("item2"),
            F.col("i3").alias("item3"),
            F.lit(3).alias("set_size"),
            F.col("support").cast("bigint").alias("support"),
        )
    )

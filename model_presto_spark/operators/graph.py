"""Connected components over duplicate-pair edges: transitive dedup
clustering.

``keep_representatives`` (operators/dedup.py) applies the cheap
pairwise min-id rule; full dedup at corpus scale needs *transitive*
clusters (a~b, b~c => {a,b,c} share one representative). This is the
min-label-propagation algorithm accelerated with pointer jumping
(path doubling, as in Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14): each round lowers every node's
component label to the min over itself, its neighbors' labels, AND
its label's label (``comp(n) <- comp(comp(n))``). The jump step
halves the remaining label-chain depth each round, so convergence is
O(log diameter) — a 1M-node path graph converges in ~20 rounds where
plain neighbor propagation would need 1M.

Spark-first: edges and labels are plain DataFrames; each iteration
is a join + groupBy (no vertex-centric framework needed). The driver
loop checks a one-row convergence aggregate per round — scalar only,
never the data. Iterations localCheckpoint to truncate lineage, the
standard guard against plan blowup in iterative Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(src, dst) edge list -> (id, component) with component = min
    node id reachable. Nodes appearing only as isolated edges map to
    their own pair-minimum; nodes absent from ``pairs`` are absent
    from the output (callers left-join and coalesce to self).
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # undirected: keep both directions for neighborhood scans.
    # localCheckpoint materializes the edge list ONCE: every iteration
    # joins against ``sym``, and without this the full upstream
    # pair-generation lineage (e.g. the MinHash pipeline) re-executes
    # per round — the sf1.0 stress bench measured 50x slowdown.
    sym = (
        edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    # label(n) starts as min(n, min neighbor)
    labels = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select(
            F.col("u").alias("id"), F.least(F.col("u"), F.col("mv")).alias("comp")
        )
    )

    for _ in range(max_iter):
        # propagate: every node's component <- min(component of self,
        # components of neighbors)
        lab_u = labels.select(F.col("id").alias("u"), F.col("comp").alias("cu"))
        lab_v = labels.select(F.col("id").alias("v"), F.col("comp").alias("cv"))
        prop = (
            sym.join(lab_u, "u")
            .join(lab_v, "v")
            .select(F.col("u").alias("id"), F.least("cu", "cv").alias("comp"))
        )
        # pointer jump: comp(n) <- comp(comp(n)). Labels always point at
        # a node present in ``labels`` (they are min-so-far node ids),
        # so the inner join is total; each jump halves chain depth.
        jump = labels.join(
            labels.select(
                F.col("id").alias("comp"), F.col("comp").alias("comp2")
            ),
            "comp",
        ).select("id", F.col("comp2").alias("comp"))
        new_labels = (
            labels.unionByName(prop)
            .unionByName(jump)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)  # truncate iterative lineage
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_clusters(
    df: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Attach a ``cluster`` column: transitive-closure representative
    (min id in the duplicate cluster; singletons are their own
    cluster). The full-strength version of
    dedup.keep_representatives."""
    comp = connected_components(pairs)
    return df.join(
        comp.withColumnRenamed("id", id_col), id_col, "left"
    ).withColumn("cluster", F.coalesce(F.col("comp"), F.col(id_col))).drop("comp")


def keep_cluster_representatives(
    df: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Keep exactly one row (the min-id) per transitive dup cluster."""
    clustered = dedup_clusters(df, pairs, id_col)
    return clustered.filter(F.col(id_col) == F.col("cluster")).drop("cluster")

"""Classification/regression metrics as SQL aggregates (A14).

The reference computes F1/precision/recall/accuracy, R²/MSE and
Cohen's kappa driver-side with sklearn over collected arrays
(reference: presto-tolbi/presto/eval/treesat_eval.py:221-252,
cropharvest_eval.py:366-371, croptype_france_eval.py:11-16,
fuel_moisture_eval.py:17). Here they are **distributed aggregates**
over a (pred, label) pair table: confusion counts via one groupBy,
everything else derived in expressions — no driver-side collect of
predictions, which is the difference between "works on an eval set"
and "works on 100 TB of scored pixels".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_matrix(df: DataFrame, label: str, pred: str) -> DataFrame:
    """(label, pred, n) counts — one shuffle."""
    return df.groupBy(
        F.col(label).alias("label"), F.col(pred).alias("pred")
    ).agg(F.count(F.lit(1)).alias("n"))


def binary_metrics(df: DataFrame, label: str, pred: str) -> DataFrame:
    """Accuracy/precision/recall/F1 for 0/1 labels, one pass
    (conditional aggregates — Catalyst computes all in a single
    partial-agg stage)."""
    l, p = F.col(label), F.col(pred)
    tp = F.count_if((l == 1) & (p == 1)).alias("tp")
    fp = F.count_if((l == 0) & (p == 1)).alias("fp")
    fn = F.count_if((l == 1) & (p == 0)).alias("fn")
    tn = F.count_if((l == 0) & (p == 0)).alias("tn")
    agg = df.agg(tp, fp, fn, tn)
    tpc, fpc, fnc, tnc = F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn")
    prec = tpc / F.greatest(tpc + fpc, F.lit(1))
    rec = tpc / F.greatest(tpc + fnc, F.lit(1))
    return agg.select(
        "tp",
        "fp",
        "fn",
        "tn",
        ((tpc + tnc) / (tpc + fpc + fnc + tnc)).alias("accuracy"),
        prec.alias("precision"),
        rec.alias("recall"),
        (2 * prec * rec / F.greatest(prec + rec, F.lit(1e-12))).alias("f1"),
    )


def multiclass_f1(df: DataFrame, label: str, pred: str) -> DataFrame:
    """Per-class precision/recall/F1 plus support, from confusion
    counts only (macro/micro follow by averaging/summing)."""
    cm = confusion_matrix(df, label, pred)
    per_label = cm.groupBy("label").agg(F.sum("n").alias("support"))
    per_pred = cm.groupBy("pred").agg(F.sum("n").alias("predicted"))
    diag = cm.filter(F.col("label") == F.col("pred")).select(
        F.col("label").alias("cls"), F.col("n").alias("tp")
    )
    out = (
        per_label.withColumnRenamed("label", "cls")
        .join(per_pred.withColumnRenamed("pred", "cls"), "cls", "outer")
        .join(diag, "cls", "left")
        .na.fill(0, ["tp", "support", "predicted"])
    )
    prec = F.col("tp") / F.greatest(F.col("predicted"), F.lit(1))
    rec = F.col("tp") / F.greatest(F.col("support"), F.lit(1))
    return out.select(
        "cls",
        "support",
        prec.alias("precision"),
        rec.alias("recall"),
        (2 * prec * rec / F.greatest(prec + rec, F.lit(1e-12))).alias("f1"),
    )


def regression_metrics(df: DataFrame, label: str, pred: str) -> DataFrame:
    """MSE, RMSE, MAE, R² in one aggregate pass."""
    l, p = F.col(label).cast("double"), F.col(pred).cast("double")
    agg = df.agg(
        F.avg((l - p) * (l - p)).alias("mse"),
        F.avg(F.abs(l - p)).alias("mae"),
        F.avg(l).alias("__ybar"),
        F.sum((l - p) * (l - p)).alias("__ss_res"),
        F.sum(l * l).alias("__yy"),
        F.sum(l).alias("__y"),
        F.count(F.lit(1)).alias("n"),
    )
    ss_tot = F.col("__yy") - F.col("__y") * F.col("__y") / F.col("n")
    return agg.select(
        "mse",
        F.sqrt(F.col("mse")).alias("rmse"),
        "mae",
        (1.0 - F.col("__ss_res") / F.greatest(ss_tot, F.lit(1e-12))).alias("r2"),
        "n",
    )


def cohens_kappa(df: DataFrame, label: str, pred: str) -> DataFrame:
    """Cohen's kappa from confusion counts (treesat_eval.py:252)."""
    cm = confusion_matrix(df, label, pred)
    total = cm.agg(F.sum("n").alias("n")).collect()[0]["n"]
    po = (
        cm.filter(F.col("label") == F.col("pred")).agg(F.sum("n")).collect()[0][0]
        or 0
    ) / total
    marg = (
        cm.groupBy("label")
        .agg(F.sum("n").alias("nl"))
        .join(
            cm.groupBy("pred").agg(F.sum("n").alias("np")),
            F.col("label") == F.col("pred"),
        )
        .agg(F.sum(F.col("nl") * F.col("np")))
        .collect()[0][0]
        or 0
    ) / (total * total)
    spark = df.sparkSession
    kappa = (po - marg) / (1.0 - marg) if marg < 1.0 else 1.0
    return spark.createDataFrame([(float(kappa),)], "kappa: double")


def binary_auc(df: DataFrame, score: str, label: str) -> DataFrame:
    """Exact ROC-AUC as the Mann-Whitney rank-sum statistic, computed
    scale-out: ``AUC = Σ_s n_pos(s)·(cum_neg_below(s) + n_neg(s)/2)
    / (N_pos·N_neg)`` over per-distinct-score counts. No global-order
    single-task window: scores aggregate by value (one shuffle), the
    cumulative-negatives term runs through the two-phase distributed
    prefix sum (operators/packing.prefix_sum), and the totals ride a
    broadcast crossJoin. Ties get the standard midrank 0.5 credit.
    Returns one row: (auc, n_pos, n_neg)."""
    from model_presto_spark.operators.packing import prefix_sum

    y = F.col(label).cast("int")
    per = df.groupBy(F.col(score).alias("__s")).agg(
        F.sum(y).alias("__np"), F.sum(1 - y).alias("__nn")
    )
    cum = prefix_sum(per, ["__s"], "__nn", "__cn")
    tot = df.agg(
        F.sum(y).alias("__tp"), F.sum(1 - y).alias("__tn")
    )
    contrib = cum.select(
        (
            F.col("__np")
            * (F.col("__cn") - F.col("__nn") + F.col("__nn") / 2.0)
        ).alias("__c")
    ).agg(F.sum("__c").alias("__num"))
    return (
        contrib.crossJoin(F.broadcast(tot))
        .select(
            (F.col("__num") / (F.col("__tp") * F.col("__tn"))).alias("auc"),
            F.col("__tp").cast("bigint").alias("n_pos"),
            F.col("__tn").cast("bigint").alias("n_neg"),
        )
    )


def ranking_metrics(
    ranked: DataFrame,
    qrels: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
) -> DataFrame:
    """Retrieval-quality aggregates over a ranked run vs relevance
    judgments: one row (mrr, recall_at_k, ndcg_at_k, n_queries).

    ``ranked``: (query, doc, rank 1-based) — e.g. the output of
    knn_join / ann_lsh_join / ivfpq_search. ``qrels``: (query, doc)
    binary relevance. Plan: one left join of the run onto qrels
    (both sides hash-partitioned on (query, doc)), one groupBy per
    query, one global mean — no windows, no collect. nDCG uses
    binary gains with the ideal DCG from the per-query relevant
    count; ties beyond ``k`` are ignored (standard trec_eval
    behavior)."""
    q = qrels.select(
        F.col(query_col).alias("__q"), F.col(doc_col).alias("__d"),
        F.lit(1).alias("__rel"),
    )
    r = ranked.select(
        F.col(query_col).alias("__q"), F.col(doc_col).alias("__d"),
        F.col(rank_col).alias("__rank"),
    ).where(F.col(rank_col) <= k)
    hits = r.join(q, ["__q", "__d"], "left")
    per_q = hits.groupBy("__q").agg(
        F.coalesce(
            F.max(F.when(F.col("__rel").isNotNull(), 1.0 / F.col("__rank"))),
            F.lit(0.0),
        ).alias("rr"),
        F.sum(F.coalesce(F.col("__rel"), F.lit(0))).alias("n_hit"),
        F.sum(
            F.when(
                F.col("__rel").isNotNull(),
                1.0 / F.log2(F.col("__rank") + 1.0),
            ).otherwise(0.0)
        ).alias("dcg"),
    )
    totals = q.groupBy("__q").agg(F.count(F.lit(1)).alias("n_rel"))
    # ideal DCG for binary gains: sum_{i=1..min(n_rel,k)} 1/log2(i+1)
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.least(F.col("n_rel"), F.lit(k))),
        F.lit(0.0),
        lambda acc, i: acc + 1.0 / F.log2(i.cast("double") + 1.0),
    )
    joined = totals.join(per_q, "__q", "left")
    return joined.select(
        F.coalesce(F.col("rr"), F.lit(0.0)).alias("rr"),
        (F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_rel")).alias("rec"),
        (F.coalesce(F.col("dcg"), F.lit(0.0)) / idcg).alias("ndcg"),
    ).agg(
        F.avg("rr").alias("mrr"),
        F.avg("rec").alias("recall_at_k"),
        F.avg("ndcg").alias("ndcg_at_k"),
        F.count(F.lit(1)).alias("n_queries"),
    )


def calibration_bins(
    df: DataFrame,
    prob: str,
    label: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram + expected calibration error (ECE).

    Buckets predictions into ``n_bins`` equal-width confidence bins
    and compares mean confidence to empirical accuracy per bin; the
    scalar ``ece`` (sum of |acc - conf| weighted by bin mass) is
    attached to every row via a single-partition window over the
    10-row bin relation — never over the raw data.

    One aggregation over the scored table (map-side combinable);
    ``prob`` must be in [0, 1); ``label`` is 0/1 numeric. Output:
    (bin, n_bin, avg_conf, frac_pos, abs_gap, ece).
    """
    from pyspark.sql import Window

    p, y = F.col(prob), F.col(label).cast("double")
    binc = F.floor(p * n_bins).cast("bigint")
    bins = (
        df.select(binc.alias("bin"), p.alias("p"), y.alias("y"))
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_bin"),
            F.avg("p").alias("avg_conf"),
            F.avg("y").alias("frac_pos"),
        )
        .withColumn("abs_gap", F.abs(F.col("frac_pos") - F.col("avg_conf")))
    )
    w = Window.partitionBy()
    total = F.sum("n_bin").over(w)
    return bins.withColumn(
        "ece",
        F.sum(F.col("abs_gap") * F.col("n_bin")).over(w) / total,
    )


def ab_test(
    df: DataFrame,
    group_col: str,
    success_col: str,
    z_crit: float = 1.96,
) -> DataFrame:
    """Two-proportion z-test between exactly two groups.

    Input: one row per experimental unit with a group label and a 0/1
    outcome. One aggregation computes both groups' counts; the
    closed-form pooled z-statistic is evaluated on the resulting
    2-row relation (conditional aggregation — no pivot, no collect).
    Significance is decided on the ROUNDED z so the boundary cannot
    flip between engines.

    Output one row: (n_a, n_b, conv_a, conv_b, lift, z, significant).
    Groups are ordered by label (min label = A) for determinism.

    Single pass over the data: one groupBy builds the per-group
    stats; the O(#groups) relation is collected to validate the
    group count (null labels rejected) and the closed form runs on
    that tiny relation, never touching the raw table again.
    """
    y = F.col(success_col).cast("double")
    stats = df.groupBy(group_col).agg(
        F.count("*").alias("n"), F.sum(y).alias("s")
    )
    rows = stats.collect()  # O(#groups)
    labels = [r[0] for r in rows]
    if len(labels) != 2 or any(lab is None for lab in labels):
        raise ValueError(f"ab_test needs exactly 2 groups, got {labels}")
    a, b = sorted(labels)
    # rebuild the tiny stats relation as literals so the closed form
    # below never re-executes the groupBy lineage over the raw table
    stats = df.sparkSession.createDataFrame(rows, stats.schema)
    g = F.col(group_col)
    agg = stats.agg(
        F.sum(F.when(g == a, F.col("n"))).alias("n_a"),
        F.sum(F.when(g == b, F.col("n"))).alias("n_b"),
        F.sum(F.when(g == a, F.col("s")).otherwise(0.0)).alias("s_a"),
        F.sum(F.when(g == b, F.col("s")).otherwise(0.0)).alias("s_b"),
    )
    p_a = F.col("s_a") / F.col("n_a")
    p_b = F.col("s_b") / F.col("n_b")
    p_pool = (F.col("s_a") + F.col("s_b")) / (F.col("n_a") + F.col("n_b"))
    se = F.sqrt(
        p_pool * (1.0 - p_pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    z = F.round((p_a - p_b) / se + F.lit(5e-12), 6)
    return agg.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round(p_a + F.lit(5e-12), 6).alias("conv_a"),
        F.round(p_b + F.lit(5e-12), 6).alias("conv_b"),
        F.round(p_a - p_b + F.lit(5e-12), 6).alias("lift"),
        z.alias("z"),
        (F.abs(z) >= z_crit).alias("significant"),
    )

"""Conformance queries batch #48 (q434+) — covariance power
iteration, sorted-neighborhood blocking, mergeable-histogram
quantiles, sample-ratio-mismatch guardrail, and shuffle-skew
partition planning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q434 — leading eigenpair by relational power iteration
# ---------------------------------------------------------------------------
# Covariance of the 64-dim embeddings as a (i, j, cov) relation, then
# eight unrolled matvec+normalize rounds from the uniform start
# vector: v <- normalize(C v) is a join + groupBy per round.  The
# Rayleigh quotient, the trace share it explains, and the v7.v8
# convergence cosine are the scalars PCA monitoring needs — spectra
# without any linear-algebra runtime.
def _q434_oracle() -> str:
    it = """
    , w{k} AS MATERIALIZED (
      SELECT c.i, SUM(c.cov * v.v) AS w
      FROM cov c JOIN v{p} v ON v.i = c.j GROUP BY c.i
    ), v{k} AS MATERIALIZED (
      SELECT i, w / (SELECT SQRT(SUM(w * w)) FROM w{k}) AS v FROM w{k}
    )"""
    chain = "".join(it.format(k=k, p=k - 1) for k in range(1, 9))
    return f"""
    WITH comp AS MATERIALIZED (
      SELECT vec_id, g.d AS i, CAST(embedding[g.d] AS DOUBLE) AS x
      FROM embeddings, generate_series(1, 64) g(d)
    ), mu AS (
      SELECT i, AVG(x) AS m FROM comp GROUP BY i
    ), cov AS MATERIALIZED (
      SELECT a.i, b.i AS j,
             SUM(a.x * b.x) / (SELECT COUNT(*) FROM embeddings)
               - ma.m * mb.m AS cov
      FROM comp a
      JOIN comp b ON b.vec_id = a.vec_id
      JOIN mu ma ON ma.i = a.i
      JOIN mu mb ON mb.i = b.i
      GROUP BY a.i, b.i, ma.m, mb.m
    ), v0 AS (
      SELECT g.d AS i, 0.125 AS v FROM generate_series(1, 64) g(d)
    ){chain}
    , ray AS (
      SELECT SUM(v8.v * w.w) AS lam
      FROM v8 JOIN (
        SELECT c.i, SUM(c.cov * v.v) AS w
        FROM cov c JOIN v8 v ON v.i = c.j GROUP BY c.i
      ) w ON w.i = v8.i
    ), tr AS (
      SELECT SUM(cov) AS trace FROM cov WHERE i = j
    ), conv AS (
      SELECT ABS(SUM(a.v * b.v)) AS cos78
      FROM v7 a JOIN v8 b ON b.i = a.i
    )
    SELECT ROUND(ray.lam + 5e-12, 6) AS eigenvalue,
           ROUND(ray.lam / tr.trace + 5e-12, 6) AS explained_share,
           ROUND(conv.cos78 + 5e-12, 6) AS convergence_cos,
           ROUND(tr.trace + 5e-12, 6) AS trace
    FROM ray, tr, conv
    """


@register(
    "q434_power_iteration",
    _q434_oracle(),
    doc="Leading covariance eigenpair by eight unrolled power-"
    "iteration rounds on the (i, j, cov) relation — matvec as "
    "join+groupBy, normalization as a scalar subquery; Rayleigh "
    "quotient, explained-variance share and v7.v8 convergence "
    "cosine as outputs (the spectral step behind intrinsic-dim "
    "q333 / effective-rank q334).",
)
def q434(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    n = emb.count()
    comp = emb.select(
        "vec_id", F.posexplode("v").alias("d0", "x")
    ).select("vec_id", (F.col("d0") + 1).alias("i"), "x")
    mu = comp.groupBy("i").agg(F.avg("x").alias("m"))
    a = comp.select(
        F.col("vec_id").alias("va"), F.col("i").alias("i"), F.col("x").alias("xa")
    )
    b = comp.select(
        F.col("vec_id").alias("vb"), F.col("i").alias("j"), F.col("x").alias("xb")
    )
    cov = (
        a.join(b, F.col("va") == F.col("vb"))
        .groupBy("i", "j")
        .agg((F.sum(F.col("xa") * F.col("xb")) / F.lit(float(n))).alias("sxy"))
        .join(mu.select(F.col("i").alias("i"), F.col("m").alias("ma")), "i")
        .join(mu.select(F.col("i").alias("j"), F.col("m").alias("mb")), "j")
        .select("i", "j", (F.col("sxy") - F.col("ma") * F.col("mb")).alias("cov"))
        .localCheckpoint(eager=False)
    )
    v = spark.range(1, 65).select(F.col("id").alias("i"), F.lit(0.125).alias("v"))
    # Normalize via an unpartitioned window over the 64-row vector so
    # each round references its matvec result ONCE — a second
    # reference (separate scalar-agg + crossJoin) would double the
    # unrolled plan per round and blow up analysis time 2^8-fold.
    allw = Window.partitionBy()
    last = None
    for _ in range(8):
        last = v
        w = (
            cov.join(v.select(F.col("i").alias("j"), "v"), "j")
            .groupBy("i")
            .agg(F.sum(F.col("cov") * F.col("v")).alias("w"))
        )
        v = w.select(
            "i",
            (F.col("w") / F.sqrt(F.sum(F.col("w") * F.col("w")).over(allw))).alias(
                "v"
            ),
        ).localCheckpoint(eager=False)
    w9 = (
        cov.join(v.select(F.col("i").alias("j"), "v"), "j")
        .groupBy("i")
        .agg(F.sum(F.col("cov") * F.col("v")).alias("w"))
    )
    ray = (
        v.join(w9, "i")
        .agg(F.sum(F.col("v") * F.col("w")).alias("lam"))
    )
    tr = cov.filter(F.col("i") == F.col("j")).agg(F.sum("cov").alias("trace"))
    conv = (
        last.select(F.col("i"), F.col("v").alias("v7"))
        .join(v.select(F.col("i"), F.col("v").alias("v8")), "i")
        .agg(F.abs(F.sum(F.col("v7") * F.col("v8"))).alias("cos78"))
    )
    return (
        ray.crossJoin(F.broadcast(tr))
        .crossJoin(F.broadcast(conv))
        .select(
            r6(F.col("lam")).alias("eigenvalue"),
            r6(F.col("lam") / F.col("trace")).alias("explained_share"),
            r6(F.col("cos78")).alias("convergence_cos"),
            r6(F.col("trace")).alias("trace"),
        )
    )


# ---------------------------------------------------------------------------
# Q435 — sorted-neighborhood blocking for near-dup candidates
# ---------------------------------------------------------------------------
# The classic linear-cost blocking scheme: sort documents by a short
# sort key (16-char prefix), pair each row with its next 4 neighbors,
# and measure recall against the prefix-32 near-dup ground truth —
# candidate count vs the O(n^2) full cross product is the efficiency
# half, recall the quality half.
_Q435_ORACLE = """
    WITH d AS (
      SELECT doc_id, substr(text, 1, 16) AS k16, substr(text, 1, 32) AS k32,
             ROW_NUMBER() OVER (ORDER BY substr(text, 1, 16), doc_id) AS r
      FROM documents
    ), cand AS (
      SELECT LEAST(a.doc_id, b.doc_id) AS id1,
             GREATEST(a.doc_id, b.doc_id) AS id2
      FROM d a JOIN d b ON b.r > a.r AND b.r <= a.r + 4
    ), truth AS (
      SELECT LEAST(a.doc_id, b.doc_id) AS id1,
             GREATEST(a.doc_id, b.doc_id) AS id2
      FROM d a JOIN d b ON a.k32 = b.k32 AND a.doc_id < b.doc_id
    ), hit AS (
      SELECT COUNT(*) AS n_hit
      FROM truth t JOIN cand c ON c.id1 = t.id1 AND c.id2 = t.id2
    ), sz AS (
      SELECT (SELECT COUNT(*) FROM d) AS n,
             (SELECT COUNT(*) FROM cand) AS n_cand,
             (SELECT COUNT(*) FROM truth) AS n_truth
    )
    SELECT CAST(sz.n AS BIGINT) AS n_docs,
           CAST(sz.n_cand AS BIGINT) AS n_candidates,
           CAST(sz.n_truth AS BIGINT) AS n_truth_pairs,
           ROUND(hit.n_hit * 1.0 / sz.n_truth + 5e-12, 6) AS recall,
           ROUND(sz.n_cand * 2.0 / (sz.n * (sz.n - 1)) + 5e-12, 6)
             AS candidate_frac
    FROM sz, hit
"""


@register(
    "q435_sorted_neighborhood",
    _Q435_ORACLE,
    doc="Sorted-neighborhood blocking: prefix-16 sort key, window of 4 "
    "successors as candidate pairs, recall against prefix-32 "
    "near-dup ground truth and candidate fraction of the full "
    "O(n^2) — the linear-cost blocking alternative to LSH banding "
    "(q32) and dictionary blocking (q314).",
)
def q435(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.substring("text", 1, 16).alias("k16"),
        F.substring("text", 1, 32).alias("k32"),
    ).select(
        "doc_id",
        "k32",
        F.row_number().over(Window.orderBy("k16", "doc_id")).alias("r"),
        # lineage cut: d feeds both window sides, both truth sides, and
        # the size aggregate (plan audit: 18 scans un-materialized)
    ).localCheckpoint(eager=False)
    a = d.select(F.col("doc_id").alias("ida"), F.col("r").alias("ra"))
    b = d.select(F.col("doc_id").alias("idb"), F.col("r").alias("rb"))
    cand = a.join(
        b, (F.col("rb") > F.col("ra")) & (F.col("rb") <= F.col("ra") + 4)
    ).select(
        F.least("ida", "idb").alias("id1"), F.greatest("ida", "idb").alias("id2")
    ).localCheckpoint(eager=False)
    ta = d.select(F.col("doc_id").alias("ida"), F.col("k32").alias("ka"))
    tb = d.select(F.col("doc_id").alias("idb"), F.col("k32").alias("kb"))
    truth = ta.join(
        tb, (F.col("ka") == F.col("kb")) & (F.col("ida") < F.col("idb"))
    ).select(
        F.least("ida", "idb").alias("id1"), F.greatest("ida", "idb").alias("id2")
    ).localCheckpoint(eager=False)
    hit = truth.join(cand, ["id1", "id2"]).agg(F.count(F.lit(1)).alias("n_hit"))
    sz = (
        d.agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(cand.agg(F.count(F.lit(1)).alias("n_cand")))
        .crossJoin(truth.agg(F.count(F.lit(1)).alias("n_truth")))
    )
    return sz.crossJoin(F.broadcast(hit)).select(
        F.col("n").cast("bigint").alias("n_docs"),
        F.col("n_cand").cast("bigint").alias("n_candidates"),
        F.col("n_truth").cast("bigint").alias("n_truth_pairs"),
        r6(F.col("n_hit") * 1.0 / F.col("n_truth")).alias("recall"),
        r6(F.col("n_cand") * 2.0 / (F.col("n") * (F.col("n") - 1))).alias(
            "candidate_frac"
        ),
    )


# ---------------------------------------------------------------------------
# Q436 — mergeable equi-width histogram quantiles
# ---------------------------------------------------------------------------
# The distributed-quantile contract: shard order prices 32 ways,
# build per-shard 128-bin equi-width histograms, merge by bin
# addition (the mergeability property), interpolate p50/p90/p99 from
# the merged cumulative counts, and audit each estimate against the
# exact percentile — the error must stay under one bin width.
_Q436_ORACLE = """
    WITH mm AS (
      SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
             COUNT(*) AS n
      FROM orders
    ), h AS (
      SELECT o_orderkey % 32 AS shard,
             LEAST(CAST(FLOOR((o_totalprice - lo) * 128.0 / (hi - lo))
                        AS INT), 127) AS bin,
             COUNT(*) AS c
      FROM orders, mm GROUP BY 1, 2
    ), merged AS (
      SELECT bin, SUM(c) AS c FROM h GROUP BY bin
    ), cum AS (
      SELECT bin, c, SUM(c) OVER (ORDER BY bin) AS cc FROM merged
    ), exact AS (
      SELECT quantile_cont(o_totalprice, [0.5, 0.9, 0.99]) AS q FROM orders
    ), est AS (
      SELECT p.p, p.idx,
             (SELECT MIN(bin) FROM cum WHERE cc >= p.p * mm.n) AS b
      FROM (VALUES (CAST(0.5 AS DOUBLE), 1), (CAST(0.9 AS DOUBLE), 2),
                   (CAST(0.99 AS DOUBLE), 3)) p(p, idx), mm
    ), interp AS (
      SELECT est.p, est.idx,
             mm.lo + (mm.hi - mm.lo) / 128.0
               * (est.b + (est.p * mm.n
                           - COALESCE((SELECT cc FROM cum
                                       WHERE bin < est.b
                                       ORDER BY bin DESC LIMIT 1), 0))
                          / (SELECT c FROM cum WHERE bin = est.b)) AS v
      FROM est, mm
    )
    SELECT i.p AS pct,
           ROUND(i.v + 5e-10, 4) AS hist_estimate,
           ROUND(e.q[i.idx] + 5e-10, 4) AS exact_value,
           ROUND(ABS(i.v - e.q[i.idx]) + 5e-10, 4) AS abs_err,
           ROUND((SELECT (hi - lo) / 128.0 FROM mm) + 5e-10, 4) AS bin_width,
           ABS(i.v - e.q[i.idx]) <= (SELECT (hi - lo) / 128.0 FROM mm)
             AS within_bound
    FROM interp i, exact e ORDER BY pct
"""


@register(
    "q436_histogram_quantiles",
    _Q436_ORACLE,
    doc="Mergeable equi-width histogram quantiles: 32 shard "
    "histograms merged by bin addition, p50/p90/p99 by cumulative "
    "interpolation, audited against the exact percentile with the "
    "one-bin-width error bound — the distributed-quantile shape "
    "behind approx sketches (q72) and bin planning (q305).",
)
def q436(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    mm = o.agg(
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    binned = o.crossJoin(F.broadcast(mm)).select(
        (F.col("o_orderkey") % 32).alias("shard"),
        F.least(
            F.floor(
                (F.col("o_totalprice") - F.col("lo"))
                * 128.0
                / (F.col("hi") - F.col("lo"))
            ).cast("int"),
            F.lit(127),
        ).alias("bin"),
    )
    h = binned.groupBy("shard", "bin").agg(F.count(F.lit(1)).alias("c"))
    merged = h.groupBy("bin").agg(F.sum("c").alias("c"))
    cum = merged.select(
        "bin", "c", F.sum("c").over(Window.orderBy("bin")).alias("cc")
        # lineage cut: cum feeds bin selection, prev-cumulative lookup,
        # and the interpolation join (plan audit: 16 scans)
    ).localCheckpoint(eager=False)
    exact = o.agg(
        F.percentile(
            "o_totalprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
        ).alias("q")
    )
    ps = spark.createDataFrame(
        [(0.5, 1), (0.9, 2), (0.99, 3)], "p double, idx int"
    )
    tgt = ps.crossJoin(F.broadcast(mm)).select(
        "p", "idx", (F.col("p") * F.col("n")).alias("target"), "lo", "hi"
    )
    bsel = (
        tgt.join(cum, F.col("cc") >= F.col("target"))
        .groupBy("p", "idx", "target", "lo", "hi")
        .agg(F.min("bin").alias("b"))
    )
    prevcc = cum.select(F.col("bin").alias("b2"), F.col("cc").alias("cc2"))
    below = (
        bsel.join(prevcc, F.col("b2") < F.col("b"), "left")
        .groupBy("p", "idx", "target", "lo", "hi", "b")
        .agg(F.coalesce(F.max("cc2"), F.lit(0)).alias("cc_prev"))
    )
    interp = below.join(
        cum.select(F.col("bin").alias("b"), F.col("c").alias("cb")), "b"
    ).select(
        "p",
        "idx",
        "lo",
        "hi",
        (
            F.col("lo")
            + (F.col("hi") - F.col("lo"))
            / 128.0
            * (
                F.col("b")
                + (F.col("target") - F.col("cc_prev")) / F.col("cb")
            )
        ).alias("v"),
    )
    out = interp.crossJoin(F.broadcast(exact)).select(
        F.col("p").alias("pct"),
        F.round(F.col("v") + F.lit(5e-10), 4).alias("hist_estimate"),
        F.round(
            F.element_at(F.col("q"), F.col("idx")) + F.lit(5e-10), 4
        ).alias("exact_value"),
        F.round(
            F.abs(F.col("v") - F.element_at(F.col("q"), F.col("idx")))
            + F.lit(5e-10),
            4,
        ).alias("abs_err"),
        F.round(
            (F.col("hi") - F.col("lo")) / 128.0 + F.lit(5e-10), 4
        ).alias("bin_width"),
        (
            F.abs(F.col("v") - F.element_at(F.col("q"), F.col("idx")))
            <= (F.col("hi") - F.col("lo")) / 128.0
        ).alias("within_bound"),
    )
    return out.orderBy("pct")


# ---------------------------------------------------------------------------
# Q437 — sample-ratio-mismatch (SRM) guardrail
# ---------------------------------------------------------------------------
# Users hash-split 50/50 by a multiplicative congruential hash; the
# daily and overall chi-square statistics against the expected even
# split are the experimentation platform's assignment-integrity
# alarm (fires at 3.841 = chi2_{1,0.05}).  Pure integer assignment,
# two aggregation levels.
_Q437_ORACLE = """
    WITH asg AS (
      SELECT DISTINCT user_id,
             CASE WHEN (user_id * 2654435761) % 4294967296 < 2147483648
                  THEN 0 ELSE 1 END AS grp
      FROM events
    ), ev AS (
      SELECT EXTRACT(day FROM e.ts) AS day, a.grp
      FROM events e JOIN asg a ON a.user_id = e.user_id
    ), daily AS (
      SELECT day,
             SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS n_a,
             SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS n_b
      FROM ev GROUP BY day
    )
    SELECT CAST(day AS BIGINT) AS day,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           ROUND(n_a * 1.0 / (n_a + n_b) + 5e-12, 6) AS ratio_a,
           ROUND((n_a - (n_a + n_b) / 2.0) * (n_a - (n_a + n_b) / 2.0)
                 / ((n_a + n_b) / 2.0)
                 + (n_b - (n_a + n_b) / 2.0) * (n_b - (n_a + n_b) / 2.0)
                 / ((n_a + n_b) / 2.0) + 5e-12, 6) AS chi2,
           ((n_a - (n_a + n_b) / 2.0) * (n_a - (n_a + n_b) / 2.0)
            / ((n_a + n_b) / 2.0)
            + (n_b - (n_a + n_b) / 2.0) * (n_b - (n_a + n_b) / 2.0)
            / ((n_a + n_b) / 2.0)) > 3.841 AS srm_flag
    FROM daily ORDER BY day
"""


@register(
    "q437_srm_guardrail",
    _Q437_ORACLE,
    doc="Sample-ratio-mismatch guardrail: multiplicative-hash 50/50 "
    "user assignment, per-day exposure chi-square against the even "
    "split with the 3.841 alarm threshold — the assignment-"
    "integrity check that gates every A/B readout (q94/q323's "
    "precondition).",
)
def q437(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    asg = ev.select("user_id").distinct().select(
        "user_id",
        F.when(
            (F.col("user_id") * 2654435761) % 4294967296 < 2147483648, 0
        )
        .otherwise(1)
        .alias("grp"),
    )
    daily = (
        ev.join(asg, "user_id")
        .groupBy(F.dayofmonth("ts").cast("bigint").alias("day"))
        .agg(
            F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("n_a"),
            F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("n_b"),
        )
    )
    e = (F.col("n_a") + F.col("n_b")) / 2.0
    chi2 = (F.col("n_a") - e) * (F.col("n_a") - e) / e + (
        F.col("n_b") - e
    ) * (F.col("n_b") - e) / e
    return daily.select(
        "day",
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        r6(F.col("n_a") * 1.0 / (F.col("n_a") + F.col("n_b"))).alias("ratio_a"),
        r6(chi2).alias("chi2"),
        (chi2 > 3.841).alias("srm_flag"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# Q438 — shuffle-partition planning under key skew
# ---------------------------------------------------------------------------
# From the key-size distribution (documents bytes by source), size a
# hash shuffle: for candidate partition counts, the expected largest
# partition is bounded below by the hottest key (all of a key hashes
# to one partition), so est_max = max_key + (total - max_key)/P.
# The skew ratio vs the ideal total/P and the salting factor that
# would bring the hot key under a 64 KiB target are exactly what a
# salting-rewrite planner needs (operators/skew.py implements the
# rewrite; this query sizes it).
_Q438_ORACLE = """
    WITH keys AS (
      SELECT source, SUM(n_chars) AS bytes
      FROM documents GROUP BY source
    ), agg AS (
      SELECT SUM(bytes) AS total, MAX(bytes) AS max_key,
             COUNT(*) AS n_keys
      FROM keys
    )
    SELECT p.p AS n_partitions,
           CAST(agg.total AS BIGINT) AS total_bytes,
           CAST(agg.max_key AS BIGINT) AS max_key_bytes,
           CAST(agg.max_key + (agg.total - agg.max_key) // p.p AS BIGINT)
             AS est_max_partition,
           ROUND((agg.max_key + (agg.total - agg.max_key) * 1.0 / p.p)
                 / (agg.total * 1.0 / p.p) + 5e-12, 6) AS skew_ratio,
           CAST(CEIL(agg.max_key / 65536.0) AS BIGINT) AS salt_factor
    FROM (VALUES (8), (32), (128)) p(p), agg
    ORDER BY n_partitions
"""


@register(
    "q438_shuffle_skew_planner",
    _Q438_ORACLE,
    doc="Shuffle sizing under key skew: hottest-key lower bound on "
    "the largest hash partition (est_max = max_key + rest/P), skew "
    "ratio vs ideal for P in {8, 32, 128}, and the salt factor that "
    "brings the hot key under a 64 KiB target — the planning table "
    "for salted aggregation (operators/skew.py) and AQE skew joins.",
)
def q438(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    keys = docs.groupBy("source").agg(F.sum("n_chars").alias("bytes"))
    agg = keys.agg(
        F.sum("bytes").alias("total"),
        F.max("bytes").alias("max_key"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    ps = spark.createDataFrame([(8,), (32,), (128,)], "p int")
    rest = F.col("total") - F.col("max_key")
    return (
        ps.crossJoin(F.broadcast(agg))
        .select(
            F.col("p").alias("n_partitions"),
            F.col("total").cast("bigint").alias("total_bytes"),
            F.col("max_key").cast("bigint").alias("max_key_bytes"),
            (F.col("max_key") + F.floor(rest / F.col("p")))
            .cast("bigint")
            .alias("est_max_partition"),
            r6(
                (F.col("max_key") + rest * 1.0 / F.col("p"))
                / (F.col("total") * 1.0 / F.col("p"))
            ).alias("skew_ratio"),
            F.ceil(F.col("max_key") / 65536.0).cast("bigint").alias("salt_factor"),
        )
        .orderBy("n_partitions")
    )

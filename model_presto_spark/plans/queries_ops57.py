"""Conformance queries batch #57 (q479+) — Dorfman group testing,
Huffman coding, backdoor adjustment, hypergeometric enrichment, and
the inspection paradox.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from model_presto_spark.plans.queries import _t, r6, register


# ---------------------------------------------------------------------------
# Q479 — Dorfman group-testing pool sizing
# ---------------------------------------------------------------------------
# Defect prevalence measured from the data (return-flag rate); for
# pool sizes k = 2..12 the expected tests per item under two-stage
# Dorfman testing is 1/k + 1 - (1-p)^k, and the optimal pool size
# minimizes it.  The screening-economics table behind pooled QC.
_Q479_ORACLE = """
    WITH p AS (
      SELECT SUM(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0 END)
               / COUNT(*) AS prev
      FROM lineitem
    ), tab AS (
      SELECT g.k, p.prev,
             1.0 / g.k + 1.0 - POW(1.0 - p.prev, g.k) AS e_tests
      FROM generate_series(2, 12) g(k), p
    )
    SELECT CAST(k AS BIGINT) AS pool_size,
           ROUND(prev + 5e-12, 6) AS prevalence,
           ROUND(e_tests + 5e-12, 6) AS tests_per_item,
           ROUND(1.0 - e_tests + 5e-12, 6) AS savings,
           e_tests = (SELECT MIN(e_tests) FROM tab) AS is_optimal
    FROM tab ORDER BY pool_size
"""


@register(
    "q479_group_testing",
    _Q479_ORACLE,
    doc="Dorfman two-stage group testing sized from the measured "
    "return rate: expected tests per item 1/k + 1 - (1-p)^k for "
    "pools of 2-12, optimal pool flagged — the pooled-screening "
    "economics table (overbooking q477's QC sibling).",
)
def q479(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = li.agg(
        (
            F.sum(F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0))
            / F.count(F.lit(1))
        ).alias("prev")
    )
    ks = spark.range(2, 13).select(F.col("id").alias("k"))
    tab = ks.crossJoin(F.broadcast(p)).select(
        "k",
        "prev",
        (1.0 / F.col("k") + 1.0 - F.pow(1.0 - F.col("prev"), F.col("k"))).alias(
            "e_tests"
        ),
    )
    best = tab.agg(F.min("e_tests").alias("best"))
    return (
        tab.crossJoin(F.broadcast(best))
        .select(
            F.col("k").cast("bigint").alias("pool_size"),
            r6(F.col("prev")).alias("prevalence"),
            r6(F.col("e_tests")).alias("tests_per_item"),
            r6(1.0 - F.col("e_tests")).alias("savings"),
            (F.col("e_tests") == F.col("best")).alias("is_optimal"),
        )
        .orderBy("pool_size")
    )


# ---------------------------------------------------------------------------
# Q480 — Huffman code length as a merge fold
# ---------------------------------------------------------------------------
# Letter frequencies of the corpus drive an actual Huffman
# construction: the fold's accumulator is [total_cost, weights...];
# each of the 25 steps re-sorts the tail, merges the two smallest
# weights and adds the merge sum to the running cost (total internal
# weight = total weighted code length — invariant under tie order,
# so both engines agree exactly on integer counts).  Compared to the
# Shannon entropy bound and a fixed 5-bit code.
_Q480_ORACLE = """
    WITH chars AS (
      SELECT lower(u.c) AS ch
      FROM documents d, unnest(string_split_regex(d.text, '')) u(c)
      WHERE lower(u.c) BETWEEN 'a' AND 'z'
    ), w AS (
      SELECT ch, CAST(COUNT(*) AS BIGINT) AS n FROM chars GROUP BY ch
    ), init AS (
      SELECT list_prepend(CAST(0 AS BIGINT), list_sort(list(n))) AS st,
             SUM(n) AS total_n, COUNT(*) AS alpha
      FROM w
    ), merged AS (
      SELECT total_n, alpha,
        list_reduce(
          list_prepend(st, list_transform(generate_series(1, alpha - 1),
                                          z -> [CAST(z AS BIGINT)])),
          (acc, dummy) -> list_concat(
            [acc[1] + acc[2] + acc[3]],
            list_sort(list_concat(acc[4:], [acc[2] + acc[3]])))
        ) AS fin
      FROM init
    ), ent AS (
      SELECT SUM(-(n * 1.0 / t.total_n) * LN(n * 1.0 / t.total_n) / LN(2.0))
               AS h
      FROM w, (SELECT total_n FROM init) t
    )
    SELECT CAST(m.alpha AS BIGINT) AS alphabet,
           CAST(m.total_n AS BIGINT) AS n_chars,
           ROUND(e.h + 5e-12, 6) AS entropy_bits,
           ROUND(m.fin[1] * 1.0 / m.total_n + 5e-12, 6) AS huffman_bits,
           CAST(5.0 AS DOUBLE) AS fixed_bits,
           ROUND(e.h / (m.fin[1] * 1.0 / m.total_n) + 5e-12, 6)
             AS huffman_efficiency
    FROM merged m, ent e
"""


@register(
    "q480_huffman_fold",
    _Q480_ORACLE,
    doc="Huffman coding executed as a merge fold over letter counts "
    "([cost, weights...] accumulator, re-sort + merge two smallest "
    "per step; total internal weight = weighted code length, "
    "tie-order invariant on integers) vs the Shannon entropy bound "
    "and a fixed 5-bit code — source-coding economics on real "
    "corpus frequencies (LZ78 q447's optimal-code sibling).",
)
def q480(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    chars = docs.select(
        F.explode_outer(F.split(F.lower("text"), "")).alias("ch")
    ).filter((F.col("ch") >= "a") & (F.col("ch") <= "z") & (F.length("ch") == 1))
    w = chars.groupBy("ch").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    init = w.agg(
        F.concat(
            F.array(F.lit(0).cast("bigint")), F.array_sort(F.collect_list("n"))
        ).alias("st"),
        F.sum("n").alias("total_n"),
        F.count(F.lit(1)).alias("alpha"),
    )

    def step(acc, dummy):
        cost = F.element_at(acc, 1)
        w1 = F.element_at(acc, 2)
        w2 = F.element_at(acc, 3)
        rest = F.slice(acc, F.lit(4), F.size(acc) - 3)
        return F.concat(
            F.array(cost + w1 + w2),
            F.array_sort(F.concat(rest, F.array(w1 + w2))),
        )

    merged = init.select(
        "total_n",
        "alpha",
        F.aggregate(
            F.transform(
                F.sequence(F.lit(1), F.col("alpha") - 1),
                lambda z: F.array(z.cast("bigint")),
            ),
            F.col("st"),
            step,
        ).alias("fin"),
    )
    tot = init.select("total_n")
    ent = (
        w.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                -(F.col("n") * 1.0 / F.col("total_n"))
                * F.log(F.col("n") * 1.0 / F.col("total_n"))
                / F.log(F.lit(2.0))
            ).alias("h")
        )
    )
    return merged.crossJoin(F.broadcast(ent)).select(
        F.col("alpha").cast("bigint").alias("alphabet"),
        F.col("total_n").cast("bigint").alias("n_chars"),
        r6(F.col("h")).alias("entropy_bits"),
        r6(F.element_at("fin", 1) * 1.0 / F.col("total_n")).alias(
            "huffman_bits"
        ),
        F.lit(5.0).alias("fixed_bits"),
        r6(
            F.col("h") / (F.element_at("fin", 1) * 1.0 / F.col("total_n"))
        ).alias("huffman_efficiency"),
    )


# ---------------------------------------------------------------------------
# Q481 — backdoor adjustment (do-calculus stratification)
# ---------------------------------------------------------------------------
# Effect of high balance (X) on lifetime spend (Y) confounded by
# nation (Z): the naive E[Y|X=1] - E[Y|X=0] contrast vs the backdoor
# formula sum_z P(z) (E[Y|X=1,z] - E[Y|X=0,z]) over strata where
# both arms exist — stratified identification beside the weighting
# estimator (IPW q360) and DiD (q235); the gap IS the confounding.
_Q481_ORACLE = """
    WITH u AS (
      SELECT c.c_custkey, c.c_nationkey AS z,
             CASE WHEN c.c_acctbal > 5000 THEN 1 ELSE 0 END AS x,
             COALESCE(SUM(ROUND(o.o_totalprice * 100)), 0) AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_nationkey, c.c_acctbal
    ), naive AS (
      SELECT AVG(CASE WHEN x = 1 THEN y END)
               - AVG(CASE WHEN x = 0 THEN y END) AS d
      FROM u
    ), strata AS (
      SELECT z, COUNT(*) AS n_z,
             AVG(CASE WHEN x = 1 THEN y END) AS y1,
             AVG(CASE WHEN x = 0 THEN y END) AS y0
      FROM u GROUP BY z
    ), ok AS (
      SELECT * FROM strata WHERE y1 IS NOT NULL AND y0 IS NOT NULL
    ), adj AS (
      SELECT SUM((n_z * 1.0 / (SELECT SUM(n_z) FROM ok)) * (y1 - y0)) AS d,
             COUNT(*) AS n_strata
      FROM ok
    )
    SELECT ROUND(naive.d / 100.0 + 5e-8, 2) AS naive_diff_usd,
           ROUND(adj.d / 100.0 + 5e-8, 2) AS backdoor_diff_usd,
           ROUND((naive.d - adj.d) / 100.0 + 5e-8, 2) AS confounding_usd,
           CAST(adj.n_strata AS BIGINT) AS n_strata
    FROM naive, adj
"""


@register(
    "q481_backdoor_adjustment",
    _Q481_ORACLE,
    doc="Backdoor (do-calculus) adjustment: naive high-vs-low-balance "
    "spend contrast vs the stratified sum_z P(z) (E[Y|1,z]-E[Y|0,z]) "
    "over nations with both arms — identification by stratification "
    "beside IPW (q360) and DiD (q235); the difference measures the "
    "confounding.",
)
def q481(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    u = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_nationkey", "c_acctbal")
        .agg(
            F.coalesce(F.sum(F.round(F.col("o_totalprice") * 100)), F.lit(0)).alias(
                "y"
            )
        )
        .select(
            F.col("c_nationkey").alias("z"),
            F.when(F.col("c_acctbal") > 5000, 1).otherwise(0).alias("x"),
            "y",
        )
    )
    naive = u.agg(
        (
            F.avg(F.when(F.col("x") == 1, F.col("y")))
            - F.avg(F.when(F.col("x") == 0, F.col("y")))
        ).alias("nd")
    )
    strata = u.groupBy("z").agg(
        F.count(F.lit(1)).alias("n_z"),
        F.avg(F.when(F.col("x") == 1, F.col("y"))).alias("y1"),
        F.avg(F.when(F.col("x") == 0, F.col("y"))).alias("y0"),
    )
    ok = strata.filter(F.col("y1").isNotNull() & F.col("y0").isNotNull())
    tot = ok.agg(F.sum("n_z").alias("tn"))
    adj = (
        ok.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                (F.col("n_z") * 1.0 / F.col("tn")) * (F.col("y1") - F.col("y0"))
            ).alias("ad"),
            F.count(F.lit(1)).alias("n_strata"),
        )
    )
    r2 = lambda col: F.round(col + F.lit(5e-8), 2)  # noqa: E731
    return naive.crossJoin(F.broadcast(adj)).select(
        r2(F.col("nd") / 100.0).alias("naive_diff_usd"),
        r2(F.col("ad") / 100.0).alias("backdoor_diff_usd"),
        r2((F.col("nd") - F.col("ad")) / 100.0).alias("confounding_usd"),
        F.col("n_strata").cast("bigint").alias("n_strata"),
    )


# ---------------------------------------------------------------------------
# Q482 — exact hypergeometric enrichment (Fisher tail)
# ---------------------------------------------------------------------------
# Are high-value orders over-represented among URGENT ones?  The
# exact hypergeometric upper tail P(X >= k) from relational
# log-factorial prefix sums (numerically via a max-shifted
# log-sum-exp so both engines track each other), with the
# enrichment ratio — the exact test beside chi-square (q155) and
# McNemar (q325).
_Q482_ORACLE = """
    WITH uni AS (
      SELECT COUNT(*) AS nn,
             SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS kk,
             SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
               AS n_s,
             SUM(CASE WHEN o_totalprice > 200000
                       AND o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
               AS k_s
      FROM orders
    ), mx AS (SELECT MAX(nn) AS mxn FROM uni
    ), lf AS (
      SELECT g.k,
             SUM(LN(g.k)) OVER (ORDER BY g.k) AS lfact
      FROM (SELECT unnest(generate_series(1, (SELECT CAST(mxn AS BIGINT) FROM mx))) AS k) g
    ), lf0 AS (
      SELECT k, lfact FROM lf UNION ALL SELECT 0, 0.0
    ), terms AS (
      SELECT x.x,
             la.lfact - lb.lfact - lc.lfact
             + ld.lfact - le.lfact - lg.lfact
             - (lh.lfact - li.lfact - lj.lfact) AS lt
      FROM uni u,
           (SELECT unnest(generate_series(0, (SELECT CAST(LEAST(n_s, kk) AS BIGINT)
                                              FROM uni))) AS x) x,
           lf0 la, lf0 lb, lf0 lc, lf0 ld, lf0 le, lf0 lg,
           lf0 lh, lf0 li, lf0 lj
      WHERE x.x >= u.k_s
        AND la.k = u.kk AND lb.k = x.x AND lc.k = u.kk - x.x
        AND ld.k = u.nn - u.kk AND le.k = u.n_s - x.x
        AND lg.k = (u.nn - u.kk) - (u.n_s - x.x)
        AND lh.k = u.nn AND li.k = u.n_s AND lj.k = u.nn - u.n_s
        AND u.n_s - x.x >= 0 AND (u.nn - u.kk) - (u.n_s - x.x) >= 0
    ), lse AS (
      SELECT MAX(lt) AS m, COUNT(*) AS n_terms FROM terms
    ), pv AS (
      SELECT lse.m + LN(SUM(EXP(t.lt - lse.m))) AS logp, lse.n_terms
      FROM terms t, lse GROUP BY lse.m, lse.n_terms
    )
    SELECT CAST(u.nn AS BIGINT) AS n_orders,
           CAST(u.kk AS BIGINT) AS n_highvalue,
           CAST(u.n_s AS BIGINT) AS n_urgent,
           CAST(u.k_s AS BIGINT) AS overlap,
           ROUND((u.k_s * 1.0 / u.n_s) / (u.kk * 1.0 / u.nn) + 5e-12, 6)
             AS enrichment_ratio,
           ROUND(pv.logp / LN(10.0) + 5e-10, 4) AS log10_pvalue
    FROM uni u, pv
"""


@register(
    "q482_hypergeometric_enrichment",
    _Q482_ORACLE,
    doc="Exact hypergeometric upper-tail enrichment (Fisher test): "
    "high-value x urgent over-representation, pmf terms from "
    "log-factorial prefix sums combined by max-shifted log-sum-exp "
    "— the exact contingency test beside chi-square (q155) and "
    "McNemar (q325), stable in log10 space.",
)
def q482(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    uni = o.agg(
        F.count(F.lit(1)).alias("nn"),
        F.sum(F.when(F.col("o_totalprice") > 200000, 1).otherwise(0)).alias("kk"),
        F.sum(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        ).alias("n_s"),
        F.sum(
            F.when(
                (F.col("o_totalprice") > 200000)
                & (F.col("o_orderpriority") == "1-URGENT"),
                1,
            ).otherwise(0)
        ).alias("k_s"),
    ).localCheckpoint(eager=False)
    nn_val = uni.select("nn").first()["nn"]
    lf = (
        spark.range(1, nn_val + 1)
        .select(F.col("id").alias("k"), F.log(F.col("id").cast("double")).alias("l"))
        .select("k", F.sum("l").over(Window.orderBy("k")).alias("lfact"))
    )
    lf0 = lf.unionAll(
        spark.range(0, 1).select(F.col("id").alias("k"), F.lit(0.0).alias("lfact"))
    ).localCheckpoint(eager=False)
    xs = spark.range(0, nn_val + 1).select(F.col("id").alias("x"))
    grid = (
        xs.crossJoin(F.broadcast(uni))
        .filter(
            (F.col("x") >= F.col("k_s"))
            & (F.col("x") <= F.least("n_s", "kk"))
            & (F.col("n_s") - F.col("x") >= 0)
            & ((F.col("nn") - F.col("kk")) - (F.col("n_s") - F.col("x")) >= 0)
        )
    )

    def lj(df, key_expr, alias):
        return df.join(
            F.broadcast(
                lf0.select(F.col("k").alias(alias + "_k"), F.col("lfact").alias(alias))
            ),
            key_expr == F.col(alias + "_k"),
        ).drop(alias + "_k")

    t = grid
    t = lj(t, F.col("kk"), "la")
    t = lj(t, F.col("x"), "lb")
    t = lj(t, F.col("kk") - F.col("x"), "lc")
    t = lj(t, F.col("nn") - F.col("kk"), "ld")
    t = lj(t, F.col("n_s") - F.col("x"), "le")
    t = lj(t, (F.col("nn") - F.col("kk")) - (F.col("n_s") - F.col("x")), "lg")
    t = lj(t, F.col("nn"), "lh")
    t = lj(t, F.col("n_s"), "li")
    t = lj(t, F.col("nn") - F.col("n_s"), "lk")
    terms = t.select(
        (
            F.col("la")
            - F.col("lb")
            - F.col("lc")
            + F.col("ld")
            - F.col("le")
            - F.col("lg")
            - (F.col("lh") - F.col("li") - F.col("lk"))
        ).alias("lt")
    )
    lse = terms.agg(F.max("lt").alias("m"))
    pv = (
        terms.crossJoin(F.broadcast(lse))
        .agg(
            (
                F.first("m") + F.log(F.sum(F.exp(F.col("lt") - F.col("m"))))
            ).alias("logp")
        )
    )
    return uni.crossJoin(F.broadcast(pv)).select(
        F.col("nn").cast("bigint").alias("n_orders"),
        F.col("kk").cast("bigint").alias("n_highvalue"),
        F.col("n_s").cast("bigint").alias("n_urgent"),
        F.col("k_s").cast("bigint").alias("overlap"),
        r6(
            (F.col("k_s") * 1.0 / F.col("n_s")) / (F.col("kk") * 1.0 / F.col("nn"))
        ).alias("enrichment_ratio"),
        F.round(F.col("logp") / F.log(F.lit(10.0)) + F.lit(5e-10), 4).alias(
            "log10_pvalue"
        ),
    )


# ---------------------------------------------------------------------------
# Q483 — the inspection paradox, measured
# ---------------------------------------------------------------------------
# A random observer lands in an interarrival gap with probability
# proportional to its LENGTH, so the gap they experience averages
# E[L^2]/E[L] = mean * (1 + CV^2), not the mean — and their expected
# residual wait is E[L^2]/(2 E[L]).  All three quantities from the
# purchase interarrival moments, with the identity reported as its
# own audit column (renewal theory behind q255/q419).
_Q483_ORACLE = """
    WITH g AS (
      SELECT epoch_us(ts) - LAG(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
      FROM events WHERE event_type = 'purchase'
    ), m AS (
      SELECT COUNT(*) AS n, SUM(gap * 1.0) AS s1, SUM(gap * 1.0 * gap) AS s2
      FROM g WHERE gap IS NOT NULL AND gap > 0
    )
    SELECT CAST(n AS BIGINT) AS n_gaps,
           ROUND(s1 / n / 3.6e9 + 5e-10, 4) AS mean_gap_hr,
           ROUND(s2 / s1 / 3.6e9 + 5e-10, 4) AS length_biased_hr,
           ROUND((s2 / s1) / (s1 / n) + 5e-12, 6) AS paradox_ratio,
           ROUND(1 + (s2 / n - (s1 / n) * (s1 / n)) / ((s1 / n) * (s1 / n))
                 + 5e-12, 6) AS one_plus_cv2,
           ROUND(s2 / (2 * s1) / 3.6e9 + 5e-10, 4) AS mean_residual_hr
    FROM m
"""


@register(
    "q483_inspection_paradox",
    _Q483_ORACLE,
    doc="Inspection paradox measured on purchase interarrivals: "
    "length-biased mean E[L^2]/E[L] vs plain mean, the ratio equal "
    "to 1 + CV^2 (reported as its own identity audit), and the "
    "random-incidence residual wait E[L^2]/(2 E[L]) — renewal "
    "theory behind waiting-time dashboards (q255/q419's paradox "
    "sibling).",
)
def q483(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    uw = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    g = ev.select((t - F.lag(t).over(uw)).alias("gap")).filter(
        F.col("gap") > 0
    )
    m = g.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("gap") * 1.0).alias("s1"),
        F.sum(F.col("gap") * 1.0 * F.col("gap")).alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    mean = s1 / n
    r4 = lambda c: F.round(c + F.lit(5e-10), 4)  # noqa: E731
    return m.select(
        n.cast("bigint").alias("n_gaps"),
        r4(mean / 3.6e9).alias("mean_gap_hr"),
        r4(s2 / s1 / 3.6e9).alias("length_biased_hr"),
        r6((s2 / s1) / mean).alias("paradox_ratio"),
        r6(1 + (s2 / n - mean * mean) / (mean * mean)).alias("one_plus_cv2"),
        r4(s2 / (2 * s1) / 3.6e9).alias("mean_residual_hr"),
    )

"""Conformance queries: round-3 additions, part 2 (q85+).

q85 is the exact-substring (span) dedup signal of Lee et al.,
"Deduplicating Training Data Makes Language Models Better" — the
fixed-k window-hash formulation that distributes as a posting-list
groupBy/join (operators/dedup.span_dup_stats). Emits per-document
duplicated-window statistics over the whole corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from model_presto_spark.operators import dedup
from model_presto_spark.plans.queries import _t, register
from model_presto_spark.plans.queries_docs import DD_TOKENS

# ---------------------------------------------------------------------------
# Q85 — exact-substring span dedup statistics (k-token windows)
# ---------------------------------------------------------------------------
_K = 8

_Q85_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, {DD_TOKENS.format(t='text')} AS toks FROM documents
    ), w AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(array_to_string(
                    list_slice(toks, i, i + {_K} - 1), ' ')), 1, 15))
                  AS BIGINT) AS whash
      FROM (
        SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - {_K} + 1)) AS i
        FROM t
      )
    ), pc AS (
      SELECT doc_id, whash, COUNT(*) AS cnt FROM w GROUP BY 1, 2
    ), g AS (
      SELECT whash, SUM(cnt) AS total FROM pc GROUP BY 1
    ), d AS (
      SELECT pc.doc_id,
             SUM(pc.cnt) AS n_windows,
             SUM(CASE WHEN g.total > 1 THEN pc.cnt ELSE 0 END) AS dup_windows
      FROM pc JOIN g USING (whash) GROUP BY 1
    )
    SELECT docs.doc_id,
           CAST(COALESCE(d.n_windows, 0) AS BIGINT) AS n_windows,
           CAST(COALESCE(d.dup_windows, 0) AS BIGINT) AS dup_windows,
           CASE WHEN COALESCE(d.n_windows, 0) > 0
                THEN CAST(d.dup_windows AS DOUBLE) / CAST(d.n_windows AS DOUBLE)
                ELSE 0.0 END AS dup_fraction
    FROM documents docs LEFT JOIN d ON docs.doc_id = d.doc_id
"""


@register(
    "q85_span_dedup",
    _Q85_ORACLE,
    doc="Exact-substring span dedup (Lee et al. recipe, fixed-k "
    f"window-hash form, k={_K}): a window position is duplicated iff "
    "its k-token window hash occurs more than once in the corpus. "
    "Per-doc (n_windows, dup_windows, dup_fraction); posting-list "
    "plan shape — window hashes shuffle as 8-byte keys, map-side "
    "combined; never O(n^2).",
)
def q85(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup.span_dup_stats(docs, k=_K)


# ---------------------------------------------------------------------------
# Q86 — fuzzy entity linkage with blocking (dirty registry -> catalog)
# ---------------------------------------------------------------------------
# The part catalog has adjective+noun names. The query derives a
# deterministic "dirty" registry in-plan (every record's adjective
# loses one character at position 1 + partkey % len) and links it
# back to the clean catalog by the canonical ER recipe: block on the
# stable attribute (the noun), levenshtein-cap the noisy one (the
# adjective), keep the best match per record with a deterministic
# tie-break. Non-vacuous by construction: every record is corrupted
# (edit_distance >= 1), and distinct adjectives can tie at the cap.

_MAX_EDIT = 2

_Q86_ORACLE = f"""
    WITH p AS (
      SELECT p_partkey, p_name,
             split_part(p_name, ' ', 1) AS adj,
             split_part(p_name, ' ', 2) AS noun
      FROM part
    ), dirty AS (
      SELECT p_partkey, noun,
             concat(substr(adj, 1, CAST(p_partkey % length(adj) AS INT)),
                    substr(adj,
                           CAST(p_partkey % length(adj) AS INT) + 2,
                           length(adj))) AS dirty_adj
      FROM p
    ), dirty2 AS (
      SELECT p_partkey, noun, dirty_adj,
             concat(dirty_adj, ' ', noun) AS dirty_name
      FROM dirty
    ), registry AS (
      SELECT DISTINCT p_name AS clean_name,
             split_part(p_name, ' ', 1) AS clean_adj,
             split_part(p_name, ' ', 2) AS r_noun
      FROM part
    ), cand AS (
      SELECT d.p_partkey, d.dirty_name, r.clean_name,
             CAST(levenshtein(d.dirty_adj, r.clean_adj) AS BIGINT)
               AS edit_distance
      FROM dirty2 d JOIN registry r
        ON d.noun = r.r_noun
       AND levenshtein(d.dirty_adj, r.clean_adj) <= {_MAX_EDIT}
    )
    SELECT p_partkey, dirty_name, clean_name, edit_distance
    FROM cand
    QUALIFY row_number() OVER (
      PARTITION BY p_partkey ORDER BY edit_distance, clean_name) = 1
"""


@register(
    "q86_fuzzy_linkage",
    _Q86_ORACLE,
    doc="Fuzzy entity linkage with blocking: a deterministically "
    "corrupted registry (one char deleted from each name's "
    "adjective) links back to the clean catalog via a noun-block "
    "equi-join + levenshtein cap + best-match window. The ER shape "
    "that replaces O(n*m) all-pairs comparison with a plannable "
    "equi-join (broadcast registry / AQE-split blocks).",
)
def q86(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from model_presto_spark.operators.linkage import blocked_fuzzy_join

    part = _t(spark, sf_dir, "part")
    adj = F.split_part(F.col("p_name"), F.lit(" "), F.lit(1))
    noun = F.split_part(F.col("p_name"), F.lit(" "), F.lit(2))
    p = part.select(
        "p_partkey", "p_name", adj.alias("adj"), noun.alias("noun")
    )
    dirty = p.select(
        "p_partkey",
        "noun",
        F.concat(
            F.expr("substr(adj, 1, CAST(p_partkey % length(adj) AS INT))"),
            F.expr(
                "substr(adj, CAST(p_partkey % length(adj) AS INT) + 2,"
                " length(adj))"
            ),
        ).alias("dirty_adj"),
    ).withColumn(
        "dirty_name", F.concat_ws(" ", F.col("dirty_adj"), F.col("noun"))
    )
    registry = (
        p.select(
            F.col("p_name").alias("clean_name"),
            F.col("adj").alias("clean_adj"),
            F.col("noun").alias("r_noun"),
        )
        .distinct()
    )
    linked = blocked_fuzzy_join(
        dirty,
        registry,
        block_on=[("noun", "r_noun")],
        fuzzy_on=("dirty_adj", "clean_adj"),
        max_edit=_MAX_EDIT,
        left_key="p_partkey",
        tie_break="clean_name",
    )
    return linked.select(
        "p_partkey",
        "dirty_name",
        "clean_name",
        F.col("edit_distance").cast("bigint").alias("edit_distance"),
    )


# ---------------------------------------------------------------------------
# Q87 — PageRank (fixed-iteration power method) on a derived graph
# ---------------------------------------------------------------------------
# Graph: distinct (o_custkey % 60 -> o_orderkey % 60) edges from
# orders, self-loops removed — a reproducible directed graph with
# uneven degrees and (possibly) dangling nodes. Fixed 3 iterations so
# the whole computation restates as plain unrolled SQL; dangling mass
# is redistributed uniformly each round in BOTH engines. Ranks are
# rounded per the repo's cross-engine float convention
# (ROUND(x + 5e-12, 6)).

_PR_ITER = 3
_PR_D = 0.85
_PR_MOD = 60


def _pr_oracle() -> str:
    head = f"""
    WITH e AS (
      SELECT DISTINCT CAST(o_custkey % {_PR_MOD} AS BIGINT) AS src,
                      CAST(o_orderkey % {_PR_MOD} AS BIGINT) AS dst
      FROM orders
      WHERE o_custkey % {_PR_MOD} <> o_orderkey % {_PR_MOD}
    ), nodes AS (
      SELECT src AS node FROM e UNION SELECT dst AS node FROM e
    ), deg AS (
      SELECT src AS node, COUNT(*) AS out_deg FROM e GROUP BY 1
    ), nn AS (
      SELECT COUNT(*) AS n FROM nodes
    ), r0 AS (
      SELECT node, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS rank
      FROM nodes
    )"""
    steps = []
    for i in range(_PR_ITER):
        steps.append(f""", c{i} AS (
      SELECT e.dst AS node, SUM(r.rank / deg.out_deg) AS contrib
      FROM r{i} r JOIN e ON r.node = e.src JOIN deg ON deg.node = r.node
      GROUP BY 1
    ), dg{i} AS (
      SELECT COALESCE(SUM(r.rank), CAST(0 AS DOUBLE)) AS dang
      FROM r{i} r LEFT JOIN deg ON deg.node = r.node
      WHERE deg.out_deg IS NULL
    ), r{i + 1} AS (
      SELECT n.node,
             (CAST(1 AS DOUBLE) - {_PR_D}) / (SELECT n FROM nn)
             + {_PR_D} * (COALESCE(c.contrib, CAST(0 AS DOUBLE))
                          + (SELECT dang FROM dg{i}) / (SELECT n FROM nn))
               AS rank
      FROM nodes n LEFT JOIN c{i} c ON c.node = n.node
    )""")
    tail = f"""
    SELECT node, ROUND(rank + 5e-12, 6) AS rank FROM r{_PR_ITER}"""
    return head + "".join(steps) + tail


@register(
    "q87_pagerank",
    _pr_oracle(),
    doc=f"PageRank, {_PR_ITER} power iterations (damping {_PR_D}) "
    "over a derived orders graph with dangling-mass redistribution. "
    "Per round: one edges-by-src join + one groupBy(dst) (the CC "
    "shape); dangling mass stays in-plan as a crossJoined one-row "
    "aggregate, never a driver collect.",
)
def q87(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from model_presto_spark.operators.graph import pagerank

    orders = _t(spark, sf_dir, "orders")
    e = (
        orders.select(
            (F.col("o_custkey") % _PR_MOD).cast("bigint").alias("src"),
            (F.col("o_orderkey") % _PR_MOD).cast("bigint").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    pr = pagerank(e, n_iter=_PR_ITER, damping=_PR_D)
    return pr.select(
        "node", F.round(F.col("rank") + F.lit(5e-12), 6).alias("rank")
    )


# ---------------------------------------------------------------------------
# Q88 — rolling z-score anomaly detection over per-user event series
# ---------------------------------------------------------------------------
# Trailing baseline of the 10 events strictly before each point
# (never the point itself), at least 5 required; anomaly = |z| >= 2.
# The flag is computed from the ROUNDED z in both engines so the
# boundary decision can never diverge on a last-ulp difference.

_ZW, _ZMIN, _ZTHR = 10, 5, 2.0

_Q88_ORACLE = f"""
    WITH w AS (
      SELECT event_id, user_id, value,
             AVG(value) OVER fr AS m,
             STDDEV_SAMP(value) OVER fr AS sd,
             COUNT(value) OVER fr AS c
      FROM events
      WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN {_ZW} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id,
           CASE WHEN c >= {_ZMIN} AND sd > 0
                THEN ROUND((value - m) / sd + 5e-12, 6) END AS z,
           COALESCE(abs(CASE WHEN c >= {_ZMIN} AND sd > 0
                THEN ROUND((value - m) / sd + 5e-12, 6) END) >= {_ZTHR},
                FALSE) AS is_anomaly
    FROM w
"""


@register(
    "q88_rolling_anomaly",
    _Q88_ORACLE,
    doc="Rolling z-score anomaly detection: each event scored "
    "against the mean/stddev of its own trailing 10-event history "
    "(strictly prior rows; min 5). One window stage per user key — "
    "a single shuffle; streaming-compatible baseline.",
)
def q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from model_presto_spark.operators.timeseries import rolling_zscore

    events = _t(spark, sf_dir, "events")
    scored = rolling_zscore(
        events,
        entity_col="user_id",
        order_cols=["ts", "event_id"],
        value_col="value",
        window=_ZW,
        min_periods=_ZMIN,
        threshold=_ZTHR,
    )
    zr = F.round(F.col("z") + F.lit(5e-12), 6)
    return scored.select(
        "event_id",
        "user_id",
        zr.alias("z"),
        F.coalesce(F.abs(zr) >= _ZTHR, F.lit(False)).alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# Q89 — k-anonymity suppression over quasi-identifiers
# ---------------------------------------------------------------------------
# QI = (c_nationkey, c_mktsegment); class sizes at sf0.01 range
# 5..21, so k=8 makes both outcomes real (some classes suppressed,
# most pass). Suppression nulls the QI columns of every member of an
# undersized equivalence class.

_KA = 8

_Q89_ORACLE = f"""
    WITH sizes AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS class_size
      FROM customer GROUP BY 1, 2
    )
    SELECT c.c_custkey,
           CASE WHEN s.class_size < {_KA} THEN NULL
                ELSE c.c_nationkey END AS c_nationkey,
           CASE WHEN s.class_size < {_KA} THEN NULL
                ELSE c.c_mktsegment END AS c_mktsegment,
           s.class_size < {_KA} AS suppressed
    FROM customer c
    JOIN sizes s ON c.c_nationkey = s.c_nationkey
               AND c.c_mktsegment = s.c_mktsegment
"""


@register(
    "q89_k_anonymity",
    _Q89_ORACLE,
    doc=f"k-anonymity (k={_KA}) over QI (nation, segment): classes "
    "smaller than k have their quasi-identifiers suppressed. One "
    "groupBy on the QI tuple + one co-partitioned join back — two "
    "shuffles at any scale.",
)
def q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from model_presto_spark.operators.privacy import k_anonymize

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    return k_anonymize(cust, ["c_nationkey", "c_mktsegment"], k=_KA)


# ---------------------------------------------------------------------------
# Q90 — snapshot diff (added / removed / changed / unchanged)
# ---------------------------------------------------------------------------
# Old snapshot derived in-plan from documents: 10% of docs missing
# (doc_id % 10 = 0 -> 'added' in new), every 7th doc's text edited
# ('changed'), plus phantom ids not in new ('removed'). The operator
# ships only (key, 60-bit fingerprint) into the full-outer join.

_Q90_ORACLE = """
    WITH old_snap AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' EDITED'
                  ELSE text END AS text
      FROM documents WHERE doc_id % 10 <> 0
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text
      FROM documents WHERE doc_id % 13 = 0
    ), o AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS fp_old
      FROM old_snap
    ), n AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS fp_new
      FROM documents
    )
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.fp_old IS NULL THEN 'added'
                WHEN n.fp_new IS NULL THEN 'removed'
                WHEN o.fp_old <> n.fp_new THEN 'changed'
                ELSE 'unchanged' END AS change
    FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
"""


@register(
    "q90_snapshot_diff",
    _Q90_ORACLE,
    doc="Corpus snapshot diff: one full outer join on the key over "
    "(key, 60-bit fingerprint) relations — bodies never shuffle. "
    "added/removed/changed/unchanged per doc; the record-level twin "
    "of the PSI distribution drift alarm.",
)
def q90(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from model_presto_spark.operators.privacy import diff_snapshots

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    old = (
        docs.where(F.col("doc_id") % 10 != 0)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" EDITED"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionAll(
            docs.where(F.col("doc_id") % 13 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
        )
    )
    return diff_snapshots(old, docs, "doc_id", ["text"], fast_hash=False)


# ---------------------------------------------------------------------------
# Q91 — BM25 retrieval: top-5 docs per query over the posting list
# ---------------------------------------------------------------------------
_BM25_QUERIES = [
    (1, "spark table scan"),
    (2, "fast merge batch"),
    (3, "key value hash"),
    (4, "window sort line"),
    (5, "slow row agg"),
]
_BM25_K1, _BM25_B, _BM25_TOPK = 1.2, 0.75, 5

_Q91_ORACLE = f"""
    WITH q(query_id, qtext) AS (VALUES
      {", ".join(f"({i}, '{t}')" for i, t in _BM25_QUERIES)}
    ), t AS (
      SELECT doc_id, {DD_TOKENS.format(t='text')} AS toks FROM documents
    ), dtc AS (
      SELECT doc_id, token, COUNT(*) AS cnt
      FROM (SELECT doc_id, unnest(toks) AS token FROM t)
      GROUP BY 1, 2
    ), dlen AS (
      SELECT doc_id, SUM(cnt) AS dl FROM dtc GROUP BY 1
    ), dfreq AS (
      SELECT token, COUNT(*) AS dfq FROM dtc GROUP BY 1
    ), stats AS (
      SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dlen
    ), qt AS (
      SELECT DISTINCT query_id, token FROM (
        SELECT query_id,
               unnest({DD_TOKENS.format(t='qtext')}) AS token
        FROM q)
    ), per_term AS (
      SELECT qt.query_id, dtc.doc_id,
             ln(1 + (stats.n_docs - dfreq.dfq + 0.5) / (dfreq.dfq + 0.5))
             * (CAST(dtc.cnt AS DOUBLE) * ({_BM25_K1} + 1.0))
             / (CAST(dtc.cnt AS DOUBLE)
                + {_BM25_K1} * (1.0 - {_BM25_B}
                   + {_BM25_B} * CAST(dlen.dl AS DOUBLE) / stats.avgdl))
               AS s
      FROM qt
      JOIN dtc USING (token)
      JOIN dlen ON dlen.doc_id = dtc.doc_id
      CROSS JOIN stats
      JOIN dfreq ON dfreq.token = qt.token
    ), scored AS (
      SELECT query_id, doc_id, SUM(s) AS score
      FROM per_term GROUP BY 1, 2
    ), rounded AS (
      SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
             ROUND(score + 5e-12, 6) AS score
      FROM scored
    )
    SELECT query_id, doc_id, score,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY score DESC, doc_id) AS BIGINT)
             AS rank
    FROM rounded
    QUALIFY rank <= {_BM25_TOPK}
"""


@register(
    "q91_bm25",
    _Q91_ORACLE,
    doc="Okapi BM25 top-5 retrieval per query (Lucene non-negative "
    "idf): query terms broadcast onto the token-keyed posting list; "
    "the corpus shuffles only by token. Ranked on the rounded score "
    "with doc-id tie-break (deterministic frontier).",
)
def q91(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from model_presto_spark.operators.lm import bm25_scores

    docs = _t(spark, sf_dir, "documents")
    qdf = spark.createDataFrame(
        _BM25_QUERIES, "query_id bigint, qtext string"
    )
    out = bm25_scores(
        docs, qdf, k1=_BM25_K1, b=_BM25_B, top_k=_BM25_TOPK
    )
    return out.select(
        "query_id",
        "doc_id",
        "score",
        F.col("rank").cast("bigint").alias("rank"),
    )


# ---------------------------------------------------------------------------
# Q92 — model calibration: reliability bins + expected calibration
# error. Pseudo-scores derived from the cents digits of event values
# (FLOOR in both engines — DuckDB CAST rounds, Spark truncates);
# pseudo-labels from the engagement event types. The synthetic model
# is deliberately uncalibrated (flat ~0.6 accuracy across bins), so
# ECE is far from zero and every bin contributes.
# ---------------------------------------------------------------------------

_Q92_ORACLE = """
    WITH scored AS (
      SELECT (floor(value * 100) % 100) / 100.0 AS p,
             CASE WHEN event_type IN ('click', 'purchase', 'signup')
                  THEN 1.0 ELSE 0.0 END AS y
      FROM events
    ), bins AS (
      SELECT CAST(floor(p * 10) AS BIGINT) AS bin,
             COUNT(*) AS n_bin,
             AVG(p) AS avg_conf,
             AVG(y) AS frac_pos
      FROM scored GROUP BY 1
    )
    SELECT bin, CAST(n_bin AS BIGINT) AS n_bin,
           ROUND(avg_conf + 5e-12, 6) AS avg_conf,
           ROUND(frac_pos + 5e-12, 6) AS frac_pos,
           ROUND(abs(frac_pos - avg_conf) + 5e-12, 6) AS abs_gap,
           ROUND(SUM(abs(frac_pos - avg_conf) * n_bin) OVER ()
                 / SUM(n_bin) OVER () + 5e-12, 6) AS ece
    FROM bins
"""


@register(
    "q92_calibration",
    _Q92_ORACLE,
    doc="Reliability diagram + ECE over pseudo-scores: one "
    "aggregation over the scored stream into 10 confidence bins, "
    "then the scalar ECE computed on the 10-row bin relation. The "
    "eval-side calibration check of a quality-classifier pipeline.",
)
def q92(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from model_presto_spark.ml.metrics import calibration_bins

    ev = _t(spark, sf_dir, "events").select(
        ((F.floor(F.col("value") * 100) % 100) / 100.0).alias("p"),
        F.col("event_type")
        .isin("click", "purchase", "signup")
        .cast("double")
        .alias("y"),
    )
    out = calibration_bins(ev, "p", "y", n_bins=10)
    r = lambda c: F.round(F.col(c) + F.lit(5e-12), 6).alias(c)  # noqa: E731
    return out.select(
        "bin", "n_bin", r("avg_conf"), r("frac_pos"), r("abs_gap"), r("ece")
    )


# ---------------------------------------------------------------------------
# Q93 — daily cohort retention matrix over the event stream
# ---------------------------------------------------------------------------

_Q93_ORACLE = """
    WITH act AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS period
      FROM events
    ), first AS (
      SELECT user_id, MIN(period) AS cohort FROM act GROUP BY 1
    )
    SELECT f.cohort, a.period - f.cohort AS "offset",
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM act a JOIN first f ON a.user_id = f.user_id
    GROUP BY 1, 2
"""


@register(
    "q93_cohort_retention",
    _Q93_ORACLE,
    doc="Daily cohort retention: users grouped by first-activity "
    "day, counted on every later active day. (user, day) dedup -> "
    "first-day join-back -> one groupBy over (cohort, offset); all "
    "three stages key on the user, so one shuffle does the work.",
)
def q93(spark: SparkSession, sf_dir: str) -> DataFrame:
    from model_presto_spark.operators.temporal import cohort_retention

    ev = _t(spark, sf_dir, "events")
    return cohort_retention(ev, "user_id", "ts", granularity="day")


# ---------------------------------------------------------------------------
# Q94 — A/B readout: two-proportion z-test on per-user conversion
# ---------------------------------------------------------------------------
# Groups by user-id parity (deterministic assignment), success =
# heavy purchaser (>= 14 purchase events; median is 13, so both
# outcomes are populated). The parity assignment is null by
# construction, so the readout exercises real arithmetic on the
# not-significant branch.

_Q94_ORACLE = """
    WITH units AS (
      SELECT user_id, user_id % 2 AS grp,
             CASE WHEN COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                       >= 14 THEN 1.0 ELSE 0.0 END AS converted
      FROM events GROUP BY 1, 2
    ), agg AS (
      SELECT COUNT(CASE WHEN grp = 0 THEN 1 END) AS n_a,
             COUNT(CASE WHEN grp = 1 THEN 1 END) AS n_b,
             SUM(CASE WHEN grp = 0 THEN converted ELSE 0.0 END) AS s_a,
             SUM(CASE WHEN grp = 1 THEN converted ELSE 0.0 END) AS s_b
      FROM units
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           ROUND(s_a / n_a + 5e-12, 6) AS conv_a,
           ROUND(s_b / n_b + 5e-12, 6) AS conv_b,
           ROUND(s_a / n_a - s_b / n_b + 5e-12, 6) AS lift,
           ROUND((s_a / n_a - s_b / n_b)
                 / sqrt((s_a + s_b) / (n_a + n_b)
                        * (1.0 - (s_a + s_b) / (n_a + n_b))
                        * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)) + 5e-12, 6) AS z,
           abs(ROUND((s_a / n_a - s_b / n_b)
                 / sqrt((s_a + s_b) / (n_a + n_b)
                        * (1.0 - (s_a + s_b) / (n_a + n_b))
                        * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)) + 5e-12, 6)) >= 1.96
             AS significant
    FROM agg
"""


@register(
    "q94_ab_test",
    _Q94_ORACLE,
    doc="Two-proportion z-test A/B readout on per-user conversion: "
    "one aggregation builds both groups (conditional agg, no "
    "pivot/collect); pooled z on the one-row relation; significance "
    "decided on the rounded statistic in both engines.",
)
def q94(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from model_presto_spark.ml.metrics import ab_test

    ev = _t(spark, sf_dir, "events")
    units = ev.groupBy(
        "user_id", (F.col("user_id") % 2).alias("grp")
    ).agg(
        (
            F.count(F.when(F.col("event_type") == "purchase", 1)) >= 14
        )
        .cast("double")
        .alias("converted")
    )
    return ab_test(units, "grp", "converted")


# ---------------------------------------------------------------------------
# Q95 — event-type co-occurrence PMI within user-day contexts
# ---------------------------------------------------------------------------

_Q95_ORACLE = """
    WITH post AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d, event_type
      FROM events
    ), nctx AS (
      SELECT COUNT(*) AS n FROM (SELECT DISTINCT user_id, d FROM post)
    ), marg AS (
      SELECT event_type, COUNT(*) AS n_i FROM post GROUP BY 1
    ), pairs AS (
      SELECT a.event_type AS item_a, b.event_type AS item_b,
             COUNT(*) AS n_ab
      FROM post a JOIN post b
        ON a.user_id = b.user_id AND a.d = b.d
       AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT item_a, item_b, CAST(n_ab AS BIGINT) AS n_ab,
           ROUND(ln(CAST(n_ab AS DOUBLE) * CAST((SELECT n FROM nctx) AS DOUBLE)
                    / (CAST(ma.n_i AS DOUBLE) * CAST(mb.n_i AS DOUBLE)))
                 + 5e-12, 6) AS pmi
    FROM pairs
    JOIN marg ma ON ma.event_type = item_a
    JOIN marg mb ON mb.event_type = item_b
"""


@register(
    "q95_cooccurrence_pmi",
    _Q95_ORACLE,
    doc="PMI association over (user, day) contexts: inverted-index "
    "pair generation inside each context (never across), marginals "
    "broadcast back. The market-basket / co-occurrence shape with "
    "the d-squared context-size guard available.",
)
def q95(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from model_presto_spark.operators.assoc import cooccurrence_pmi

    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d"), "event_type"
    )
    out = cooccurrence_pmi(ev, ["user_id", "d"], "event_type")
    return out.select(
        "item_a",
        "item_b",
        "n_ab",
        F.round(F.col("pmi") + F.lit(5e-12), 6).alias("pmi"),
    )


# ---------------------------------------------------------------------------
# Q96 — robust (MAD) outlier detection per user over event values
# ---------------------------------------------------------------------------
# Iglewicz-Hoberg modified z-score: 0.6745 * (x - median) / MAD.
# The flag is decided on the ROUNDED score in both engines.

_MADT = 3.5

_Q96_ORACLE = f"""
    WITH med AS (
      SELECT user_id, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY 1
    ), mad AS (
      SELECT e.user_id, quantile_cont(abs(e.value - m.med), 0.5) AS mad
      FROM events e JOIN med m ON e.user_id = m.user_id
      GROUP BY 1
    )
    SELECT e.event_id, e.user_id,
           CASE WHEN d.mad > 0
                THEN ROUND(0.6745 * (e.value - m.med) / d.mad + 5e-12, 6)
           END AS modified_z,
           COALESCE(abs(CASE WHEN d.mad > 0
                THEN ROUND(0.6745 * (e.value - m.med) / d.mad + 5e-12, 6)
           END) >= {_MADT}, FALSE) AS is_outlier
    FROM events e
    JOIN med m ON e.user_id = m.user_id
    JOIN mad d ON e.user_id = d.user_id
"""


@register(
    "q96_mad_outliers",
    _Q96_ORACLE,
    doc="Robust per-user outlier flags (modified z-score on the "
    "median absolute deviation): the baseline cannot be dragged by "
    "the outliers it hunts. Two grouped exact medians on the entity "
    "key, broadcast back; flag decided on the rounded score.",
)
def q96(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from model_presto_spark.operators.timeseries import mad_outliers

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    out = mad_outliers(ev, "user_id", "value", threshold=_MADT)
    zr = F.round(F.col("modified_z") + F.lit(5e-12), 6)
    return out.select(
        "event_id",
        "user_id",
        zr.alias("modified_z"),
        F.coalesce(F.abs(zr) >= _MADT, F.lit(False)).alias("is_outlier"),
    )


# ---------------------------------------------------------------------------
# Q97 — CUSUM drift statistics per user (closed-form window algebra)
# ---------------------------------------------------------------------------
_CU_TGT, _CU_K, _CU_H = 245.0, 50.0, 1500.0

_Q97_ORACLE = f"""
    WITH acc AS (
      SELECT event_id, user_id, ts,
             SUM(value - {_CU_TGT + _CU_K}) OVER w AS au,
             SUM({_CU_TGT - _CU_K} - value) OVER w AS an
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), mins AS (
      SELECT event_id, user_id, au, an,
             MIN(au) OVER w AS mau,
             MIN(an) OVER w AS man
      FROM acc
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id,
           ROUND(au - least(mau, 0.0) + 5e-12, 6) AS cusum_up,
           ROUND(an - least(man, 0.0) + 5e-12, 6) AS cusum_down,
           (ROUND(au - least(mau, 0.0) + 5e-12, 6) >= {_CU_H}
            OR ROUND(an - least(man, 0.0) + 5e-12, 6) >= {_CU_H}) AS drift
    FROM mins
"""


@register(
    "q97_cusum_drift",
    _Q97_ORACLE,
    doc="One-sided CUSUM drift statistics per user via the "
    "closed-form S_t = A_t - min(A_<=t, 0): running sum + running "
    "min windows sharing one sort — a single shuffle per entity, no "
    "sequential recursion. Flags decided on rounded statistics.",
)
def q97(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from model_presto_spark.operators.timeseries import cusum

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    out = cusum(
        ev, "user_id", ["ts", "event_id"], "value",
        target=_CU_TGT, slack=_CU_K, threshold=_CU_H,
    )
    ru = F.round(F.col("cusum_up") + F.lit(5e-12), 6)
    rd = F.round(F.col("cusum_down") + F.lit(5e-12), 6)
    return out.select(
        "event_id",
        "user_id",
        ru.alias("cusum_up"),
        rd.alias("cusum_down"),
        ((ru >= _CU_H) | (rd >= _CU_H)).alias("drift"),
    )


# ---------------------------------------------------------------------------
# Q98 — triangle census of the derived orders graph
# ---------------------------------------------------------------------------

_Q98_ORACLE = f"""
    WITH raw AS (
      SELECT DISTINCT
             CAST(least(o_custkey % {_PR_MOD}, o_orderkey % {_PR_MOD})
                  AS BIGINT) AS a,
             CAST(greatest(o_custkey % {_PR_MOD}, o_orderkey % {_PR_MOD})
                  AS BIGINT) AS b
      FROM orders
      WHERE o_custkey % {_PR_MOD} <> o_orderkey % {_PR_MOD}
    ), deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT a AS node FROM raw UNION ALL SELECT b AS node FROM raw)
      GROUP BY 1
    ), tri AS (
      SELECT COUNT(*) AS t
      FROM raw e1
      JOIN raw e2 ON e2.a = e1.b
      JOIN raw e3 ON e3.a = e1.a AND e3.b = e2.b
    ), agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges
      FROM deg
    )
    SELECT n_nodes,
           CAST((SELECT COUNT(*) FROM raw) AS BIGINT) AS n_edges,
           n_wedges,
           CAST(t AS BIGINT) AS n_triangles,
           ROUND(CASE WHEN n_wedges > 0
                      THEN CAST(3 AS DOUBLE) * t / CAST(n_wedges AS DOUBLE)
                      ELSE 0.0 END + 5e-12, 6) AS global_clustering
    FROM agg CROSS JOIN tri
"""


@register(
    "q98_triangles",
    _Q98_ORACLE,
    doc="Exact triangle census + global clustering coefficient via "
    "degree-ordered node iteration: edges direct from their "
    "(degree, id)-smaller endpoint so hub wedge joins stay "
    "O(sqrt(m)) per node; wedges close against the directed edge "
    "list in one equi-join, each triangle produced once.",
)
def q98(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from model_presto_spark.operators.graph import triangle_stats

    orders = _t(spark, sf_dir, "orders")
    e = orders.select(
        (F.col("o_custkey") % _PR_MOD).cast("bigint").alias("src"),
        (F.col("o_orderkey") % _PR_MOD).cast("bigint").alias("dst"),
    )
    out = triangle_stats(e)
    return out.select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.round(F.col("global_clustering") + F.lit(5e-12), 6).alias(
            "global_clustering"
        ),
    )


# ---------------------------------------------------------------------------
# Q99 — Adamic-Adar link prediction on a sparser derived graph
# ---------------------------------------------------------------------------
_AA_MOD = 200

_Q99_ORACLE = f"""
    WITH e AS (
      SELECT DISTINCT
             CAST(least(o_custkey % {_AA_MOD}, o_orderkey % {_AA_MOD})
                  AS BIGINT) AS a,
             CAST(greatest(o_custkey % {_AA_MOD}, o_orderkey % {_AA_MOD})
                  AS BIGINT) AS b
      FROM orders
      WHERE o_custkey % {_AA_MOD} <> o_orderkey % {_AA_MOD}
    ), sym AS (
      SELECT a AS w, b AS n FROM e
      UNION ALL
      SELECT b AS w, a AS n FROM e
    ), deg AS (
      SELECT w, COUNT(*) AS deg FROM sym GROUP BY 1
    ), adj AS (
      SELECT s.w, s.n, d.deg FROM sym s JOIN deg d ON d.w = s.w
    ), wedges AS (
      SELECT n1.n AS u, n2.n AS v, n1.deg
      FROM adj n1 JOIN adj n2 ON n1.w = n2.w AND n1.n < n2.n
    ), scored AS (
      SELECT u, v, CAST(COUNT(*) AS BIGINT) AS common_neighbors,
             SUM(CASE WHEN deg > 1
                      THEN CAST(1 AS DOUBLE) / ln(CAST(deg AS DOUBLE))
                      ELSE 0.0 END) AS aa_score
      FROM wedges GROUP BY 1, 2
    )
    SELECT s.u, s.v, s.common_neighbors,
           ROUND(s.aa_score + 5e-12, 6) AS aa_score
    FROM scored s
    LEFT JOIN e ON e.a = s.u AND e.b = s.v
    WHERE e.a IS NULL AND s.common_neighbors >= 3
"""


@register(
    "q99_link_prediction",
    _Q99_ORACLE,
    doc="Adamic-Adar link prediction: wedges through each shared "
    "neighbor (inverted-index shape, 1/ln(deg) hub discount), one "
    "groupBy of evidence, one anti-join to drop existing edges; "
    "pairs with >= 3 common neighbors.",
)
def q99(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from model_presto_spark.operators.graph import adamic_adar

    orders = _t(spark, sf_dir, "orders")
    e = orders.select(
        (F.col("o_custkey") % _AA_MOD).cast("bigint").alias("src"),
        (F.col("o_orderkey") % _AA_MOD).cast("bigint").alias("dst"),
    )
    out = adamic_adar(e, min_common=3)
    return out.select(
        "u",
        "v",
        "common_neighbors",
        F.round(F.col("aa_score") + F.lit(5e-12), 6).alias("aa_score"),
    )


# ---------------------------------------------------------------------------
# Q100 — Markov transition matrix of event types per user stream
# ---------------------------------------------------------------------------

_Q100_ORACLE = """
    WITH bi AS (
      SELECT event_type AS from_state,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_state
      FROM events
    ), counts AS (
      SELECT from_state, to_state, COUNT(*) AS n
      FROM bi WHERE to_state IS NOT NULL
      GROUP BY 1, 2
    ), totals AS (
      SELECT from_state, SUM(n) AS tot FROM counts GROUP BY 1
    )
    SELECT c.from_state, c.to_state, CAST(c.n AS BIGINT) AS n,
           ROUND(CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE) + 5e-12, 6)
             AS p
    FROM counts c JOIN totals t ON t.from_state = c.from_state
"""


@register(
    "q100_markov_transitions",
    _Q100_ORACLE,
    doc="First-order Markov transition matrix over per-user event "
    "sequences: one lag window (single shuffle on the entity key) "
    "builds bigrams, one groupBy counts, per-source normalizers "
    "broadcast back. The behavioral-model shape of product "
    "analytics and synthetic-sequence QA.",
)
def q100(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from model_presto_spark.operators.temporal import transition_matrix

    ev = _t(spark, sf_dir, "events")
    out = transition_matrix(ev, "user_id", ["ts", "event_id"], "event_type")
    return out.select(
        "from_state",
        "to_state",
        "n",
        F.round(F.col("p") + F.lit(5e-12), 6).alias("p"),
    )


# ---------------------------------------------------------------------------
# Q101 — BFS shortest-path levels from a source set (bounded hops)
# ---------------------------------------------------------------------------
_BFS_SOURCES = [0, 7]
_BFS_HOPS = 3


def _bfs_oracle() -> str:
    srcs = ", ".join(f"({s})" for s in _BFS_SOURCES)
    head = f"""
    WITH e AS (
      SELECT DISTINCT
             CAST(least(o_custkey % {_AA_MOD}, o_orderkey % {_AA_MOD})
                  AS BIGINT) AS a,
             CAST(greatest(o_custkey % {_AA_MOD}, o_orderkey % {_AA_MOD})
                  AS BIGINT) AS b
      FROM orders
      WHERE o_custkey % {_AA_MOD} <> o_orderkey % {_AA_MOD}
    ), sym AS (
      SELECT a AS u, b AS v FROM e UNION SELECT b AS u, a AS v FROM e
    ), d0(node, dist) AS (
      SELECT CAST(s.node AS BIGINT), 0 FROM (VALUES {srcs}) s(node)
    )"""
    steps = []
    for i in range(_BFS_HOPS):
        steps.append(f""", d{i + 1} AS (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM d{i}
        UNION ALL
        SELECT sym.v AS node, d{i}.dist + 1 AS dist
        FROM sym JOIN d{i} ON sym.u = d{i}.node
      ) GROUP BY 1
    )""")
    tail = f"""
    SELECT node, CAST(dist AS INT) AS dist FROM d{_BFS_HOPS}"""
    return head + "".join(steps) + tail


@register(
    "q101_bfs_levels",
    _bfs_oracle(),
    doc=f"Level-synchronous BFS from sources {_BFS_SOURCES} "
    f"({_BFS_HOPS} hops): one edge-relaxation join + min-groupBy per "
    "round with eager checkpoint lineage truncation — the CC/"
    "PageRank iterative shape applied to reachability/distance.",
)
def q101(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from model_presto_spark.operators.graph import bfs_levels

    orders = _t(spark, sf_dir, "orders")
    e = orders.select(
        (F.col("o_custkey") % _AA_MOD).cast("bigint").alias("src"),
        (F.col("o_orderkey") % _AA_MOD).cast("bigint").alias("dst"),
    )
    return bfs_levels(e, _BFS_SOURCES, max_hops=_BFS_HOPS).select(
        "node", F.col("dist").cast("int").alias("dist")
    )


# ---------------------------------------------------------------------------
# Q102 — Apriori frequent itemsets over user-day event baskets
# ---------------------------------------------------------------------------
# min_count 210 sits inside the triple-support range (193..221 at
# sf0.01), so the deepest level has REAL pruning while levels 1-2
# pass whole — every Apriori stage is exercised non-vacuously.
_FI_MIN = 210

_Q102_ORACLE = f"""
    WITH b AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d, event_type
      FROM events
    ), l1 AS (
      SELECT event_type, COUNT(*) AS support FROM b GROUP BY 1
      HAVING COUNT(*) >= {_FI_MIN}
    ), fb AS (
      SELECT b.* FROM b JOIN l1 ON l1.event_type = b.event_type
    ), l2 AS (
      SELECT b1.event_type AS i1, b2.event_type AS i2,
             COUNT(*) AS support
      FROM fb b1 JOIN fb b2
        ON b1.user_id = b2.user_id AND b1.d = b2.d
       AND b1.event_type < b2.event_type
      GROUP BY 1, 2 HAVING COUNT(*) >= {_FI_MIN}
    ), p2 AS (
      -- the pair relation materializes FIRST: writing l3 as a
      -- 3-way fb join leaves b2-b3 connected only through the
      -- inequality, and DuckDB's join-order search can pick the
      -- b2 x b3 cross product (6.4B rows / 80 GB spill at sf0.1).
      -- Joining the pair subquery to b3 on the basket keys pins
      -- every join to an equality.
      SELECT b1.user_id, b1.d, b1.event_type AS i1, b2.event_type AS i2
      FROM fb b1
      JOIN fb b2 ON b1.user_id = b2.user_id AND b1.d = b2.d
                AND b1.event_type < b2.event_type
    ), l3 AS (
      SELECT p2.i1, p2.i2, b3.event_type AS i3, COUNT(*) AS support
      FROM p2
      JOIN fb b3 ON p2.user_id = b3.user_id AND p2.d = b3.d
                AND p2.i2 < b3.event_type
      GROUP BY 1, 2, 3 HAVING COUNT(*) >= {_FI_MIN}
    )
    SELECT event_type AS item1, CAST(NULL AS VARCHAR) AS item2,
           CAST(NULL AS VARCHAR) AS item3, 1 AS set_size,
           CAST(support AS BIGINT) AS support
    FROM l1
    UNION ALL
    SELECT i1, i2, CAST(NULL AS VARCHAR), 2, CAST(support AS BIGINT)
    FROM l2
    UNION ALL
    SELECT i1, i2, i3, 3, CAST(support AS BIGINT) FROM l3
"""


@register(
    "q102_frequent_itemsets",
    _Q102_ORACLE,
    doc=f"Apriori frequent itemsets (sizes 1-3, min support "
    f"{_FI_MIN} baskets) over user-day event baskets: level-1 prune "
    "restricts every upward candidate join; within-context ordered "
    "self-joins, never cross-basket pair enumeration.",
)
def q102(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from model_presto_spark.operators.assoc import frequent_itemsets

    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d"), "event_type"
    )
    out = frequent_itemsets(
        ev, ["user_id", "d"], "event_type", min_count=_FI_MIN
    )
    return out.select(
        "item1", "item2", "item3",
        F.col("set_size").cast("int").alias("set_size"),
        "support",
    )

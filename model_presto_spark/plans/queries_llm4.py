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

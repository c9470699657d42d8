"""Change-data-capture apply: MERGE/upsert semantics as one join.

The reference pipeline re-materializes monthly table snapshots by key
(presto-tolbi/presto/dataops/dataset.py idempotence keys decide
whether a shard is rewritten); the general form every warehouse
needs is applying a CDC batch — inserts / updates / deletes keyed by
sequence number — onto a snapshot. Spark-first shape: ONE bounded
aggregation collapses the change feed to its latest op per key
(max_by on the sequence — associative, map-side combined), then ONE
full-outer join applies it. No iteration, no driver state; at 100 TB
both sides shuffle once on the key, and AQE handles the usual
hot-key skew in change feeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC batch to a snapshot (upsert semantics).

    ``changes`` rows carry ``op`` in {'U','D'} (an upsert of an
    unseen key is an insert) plus the new ``value_cols``. When a key
    appears multiple times in the batch, the row with the highest
    ``seq_col`` wins — collapsed with one max_by aggregation before
    the join, so the join sees exactly one change per key."""
    latest = (
        changes.groupBy(*key_cols)
        .agg(
            F.max(
                F.struct(
                    F.col(seq_col).alias("__seq"),
                    F.col(op_col).alias("__op"),
                    *[F.col(c).alias(c) for c in value_cols],
                )
            ).alias("__c")
        )
        .select(
            *key_cols,
            F.col("__c.__op").alias("__op"),
            *[F.col(f"__c.{c}").alias(f"__new_{c}") for c in value_cols],
        )
    )
    return (
        snapshot.join(latest, key_cols, "full")
        .where(F.col("__op").isNull() | (F.col("__op") != "D"))
        .select(
            *key_cols,
            *[
                F.when(F.col("__op").isNotNull(), F.col(f"__new_{c}"))
                .otherwise(F.col(c))
                .alias(c)
                for c in value_cols
            ],
        )
    )

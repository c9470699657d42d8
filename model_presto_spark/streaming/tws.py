"""Arbitrary-stateful streaming operators on the Spark 4
``transformWithStateInPandas`` API (the successor of
``applyInPandasWithState``: typed per-key state variables, optional
TTL, timers).

``dedup_stream_ttl`` is the unbounded-corpus dedup shape that
watermarked ``dropDuplicates`` cannot express: the seen-set is keyed
*processing-time* state with a TTL, so (a) duplicates are collapsed
across micro-batches forever while the key stays in state — no
event-time column required at all — and (b) state size is bounded by
the TTL window rather than growing with the corpus. With
``ttl_ms=None`` the ledger is permanent (the streaming twin of
streaming/incremental_dedup.py's anti-join ledger, held in the state
store instead of a parquet side table).

Requires the RocksDB state store provider (bundled with Spark 4) —
session config is applied by the caller/test harness.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle


class _FirstSeen(StatefulProcessor):
    """Emit the first row ever seen per key; count the rest into
    per-key state (exposed for observability via n_dropped on the
    emitted row)."""

    def __init__(self, ttl_ms: int | None):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getValueState(
            "seen", "n bigint", ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        first = None
        n = 0
        for pdf in rows:
            if first is None and len(pdf):
                first = pdf.iloc[:1]
            n += len(pdf)
        already = self._seen.exists()
        prev = (self._seen.get() or (0,))[0] if already else 0
        self._seen.update((int(prev + n),))
        if not already and first is not None:
            yield first.drop(columns=[c for c in first.columns if c.startswith("__")])

    def close(self) -> None:
        pass


def dedup_stream_ttl(
    stream: DataFrame,
    key_cols: list[str],
    ttl_ms: int | None = None,
) -> DataFrame:
    """Exactly-once-per-key pass-through of a stream: the first
    arrival of each key is emitted, every later arrival (same or any
    later micro-batch, any event time) is dropped while the key's
    state lives. ``ttl_ms`` bounds state for unbounded key spaces;
    None keeps the ledger forever (use when the key space itself is
    bounded or externally compacted)."""
    out_schema = stream.schema
    # TTL state requires processing-time semantics; without TTL the
    # operator needs no clock at all.
    time_mode = "ProcessingTime" if ttl_ms is not None else "None"
    return stream.groupBy(*key_cols).transformWithStateInPandas(
        statefulProcessor=_FirstSeen(ttl_ms),
        outputStructType=out_schema,
        outputMode="Append",
        timeMode=time_mode,
    )

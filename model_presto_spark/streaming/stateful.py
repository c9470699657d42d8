"""Custom stateful streaming operators (applyInPandasWithState).

The built-in streaming surface (streaming/pipeline.py) covers
watermarked windows, dropDuplicates dedup, and exactly-once file
conversion. What it can't express is *cross-batch mutable state with
user logic* — the per-group token-budget sampler below is the
canonical LLM-ingest example: each source contributes documents to a
training mix until its token budget is exhausted, and the cutoff must
hold across micro-batches and restarts (state lives in the streaming
checkpoint).

Arrow-batched ``applyInPandasWithState``: one GroupState per source
holding a single running token count — O(1) state per group, so state
store size is O(#sources), not O(#docs), which is what lets this run
over a 100 TB backlog with thousands of micro-batches. Rows within a
batch are processed in a deterministic order (sorted by the id
column) so replays produce identical keep/drop decisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def token_budget_sample(
    stream: DataFrame,
    group_col: str,
    token_col: str,
    id_col: str,
    budget: int,
) -> DataFrame:
    """Keep rows per ``group_col`` until the group's cumulative
    ``token_col`` exceeds ``budget``; drop the rest — across ALL
    micro-batches (state persists in the checkpoint).

    Output: (group, id, tokens, cum_tokens) for kept rows, where
    ``cum_tokens`` is the running post-row total. Prefix-truncation
    semantics: rows are consumed in id order and the group keeps the
    longest prefix whose total fits the budget (token counts are
    non-negative, so the fit mask is a prefix and the whole decision
    vectorizes to one cumsum per batch).
    """
    out_schema = (
        f"{group_col} string, {id_col} bigint, "
        f"{token_col} bigint, cum_tokens bigint"
    )
    state_schema = "used bigint"

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        used = state.get[0] if state.exists else 0
        # Concatenate the micro-batch's Arrow chunks BEFORE sorting:
        # chunks arrive in arbitrary order, and per-chunk truncation
        # would make keep/drop decisions depend on chunk boundaries
        # (breaking both the id-order contract and replay
        # determinism). One batch per group is bounded by the
        # micro-batch size; state stays O(1).
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values(id_col)
            cum = used + pdf[token_col].astype("int64").cumsum()
            kept = pdf[cum <= budget]
            if len(kept):
                used = int(cum[cum <= budget].iloc[-1])
                yield pd.DataFrame(
                    {
                        group_col: kept[group_col],
                        id_col: kept[id_col].astype("int64"),
                        token_col: kept[token_col].astype("int64"),
                        "cum_tokens": cum[cum <= budget].astype("int64"),
                    }
                )
        state.update((used,))

    return (
        stream.select(group_col, id_col, token_col)
        .groupBy(group_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def rolling_anomaly_stream(
    stream: DataFrame,
    entity_col: str,
    order_col: str,
    value_col: str,
    id_col: str,
    window: int = 10,
    min_periods: int = 5,
    threshold: float = 3.0,
) -> DataFrame:
    """Streaming twin of ``timeseries.rolling_zscore``: each arriving
    point is scored against the last ``window`` values of its OWN
    entity, across micro-batches and restarts.

    State per entity is the trailing value ring — O(window) doubles,
    so the state store is O(#entities x window), independent of
    stream length. Rows inside a batch are processed in
    (order_col, id_col) order, matching the batch operator's window
    ORDER BY, so a replayed batch reproduces identical scores, and
    the streaming output over a fully-landed dataset equals the
    batch ``rolling_zscore`` (parity-tested).

    Output: (entity, id, value, z, is_anomaly); z is null until
    ``min_periods`` history exists or when the baseline is constant.
    """
    out_schema = (
        f"{entity_col} bigint, {id_col} bigint, {value_col} double, "
        "z double, is_anomaly boolean"
    )
    state_schema = "vals array<double>"

    def fn(key, pdfs, state: GroupState):
        import math

        import pandas as pd

        buf = list(state.get[0]) if state.exists else []
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            # reset_index after the sort: the output DataFrame mixes
            # pdf-backed Series with positional lists, and pandas
            # aligns by index label — a permuted index would attach
            # scores to the wrong rows
            pdf = pdf.sort_values([order_col, id_col]).reset_index(drop=True)
            zs, flags = [], []
            for v in pdf[value_col].astype("float64"):
                tail = buf[-window:]
                z = None
                # len >= 2 guard: sample variance of one point is
                # undefined (the batch twin's stddev_samp is null)
                if len(tail) >= min_periods and len(tail) >= 2:
                    m = sum(tail) / len(tail)
                    var = sum((x - m) ** 2 for x in tail) / (len(tail) - 1)
                    sd = math.sqrt(var)
                    if sd > 0:
                        z = (v - m) / sd
                zs.append(z)
                flags.append(bool(z is not None and abs(z) >= threshold))
                buf.append(float(v))
                buf = buf[-window:]
            yield pd.DataFrame(
                {
                    entity_col: pdf[entity_col].astype("int64"),
                    id_col: pdf[id_col].astype("int64"),
                    value_col: pdf[value_col].astype("float64"),
                    "z": pd.Series(zs, dtype="float64"),
                    "is_anomaly": flags,
                }
            )
        state.update((buf,))

    return (
        stream.select(entity_col, order_col, id_col, value_col)
        .groupBy(entity_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

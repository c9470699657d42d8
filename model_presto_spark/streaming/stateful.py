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

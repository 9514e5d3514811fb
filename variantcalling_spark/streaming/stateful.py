"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's ordered stateful kernels are spatial (genome position,
SURVEY.md §2.9); this is their temporal sibling on the engine's
streaming surface: a per-user running aggregate with arbitrary
path-dependent logic that ``groupBy().agg()`` cannot express —
first-seen time, running max gap between consecutive events, and a
monotone event counter — maintained incrementally across micro-batches
in GroupState, emitting one updated row per user per batch.

The same kernel runs in batch through ``applyInPandas`` (identical
per-group pandas code path), which is what the stream==batch test pins.

Semantics note: ``max_gap_us`` is the max gap between consecutive events
in arrival order within the watermark — exact when micro-batches arrive
time-ordered (the watermarked-stream assumption); late data past the
last-seen timestamp contributes no negative gaps.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "first_us long, last_us long, n long, max_gap_us long"
OUTPUT_SCHEMA = "user_id long, first_us long, last_us long, n long, max_gap_us long"


def _fold(state: tuple[int, int, int, int] | None, ts_sorted: list[int]):
    """Pure fold of sorted event times into (first, last, n, max_gap)."""
    if state is None:
        first, last, n, max_gap = ts_sorted[0], ts_sorted[0], 0, 0
        rest = ts_sorted
        n0 = 0
    else:
        first, last, n0, max_gap = state
        rest = ts_sorted
    n = n0
    for t in rest:
        if n > 0 or state is not None:
            gap = t - last
            if gap > max_gap:
                max_gap = gap
        last = max(last, t)
        n += 1
    return first, last, n, max_gap


def user_activity_stateful(df: DataFrame, ts_us_col: str = "ts_us") -> DataFrame:
    """Streaming per-user activity state (applyInPandasWithState)."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        ts: list[int] = []
        for pdf in pdfs:
            ts.extend(int(v) for v in pdf[ts_us_col])
        ts.sort()
        prev = state.get if state.exists else None
        first, last, n, max_gap = _fold(prev, ts)
        state.update((first, last, n, max_gap))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "first_us": [first],
                "last_us": [last],
                "n": [n],
                "max_gap_us": [max_gap],
            }
        )

    return df.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def user_activity_batch(df: DataFrame, ts_us_col: str = "ts_us") -> DataFrame:
    """The same kernel on a batch frame (applyInPandas): one state fold
    over each user's full history — the ground truth the streaming
    operator must converge to after processing all input."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        ts = sorted(int(v) for v in pdf[ts_us_col])
        first, last, n, max_gap = _fold(None, ts)
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "first_us": [first],
                "last_us": [last],
                "n": [n],
                "max_gap_us": [max_gap],
            }
        )

    return df.groupBy("user_id").applyInPandas(fn, schema=OUTPUT_SCHEMA)


from variantcalling_spark._serde import register_module_by_value

register_module_by_value(__name__)

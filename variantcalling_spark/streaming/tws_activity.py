"""The user-activity kernel on Spark 4's ``transformWithStateInPandas``.

``streaming/stateful.py`` implements per-user activity state on the
classic ``applyInPandasWithState`` (GroupState) API; this module is the
SAME kernel — same ``_fold``, same output contract — on the next-gen
arbitrary-state API (StatefulProcessor + typed state handles, SPARK
4.0's ``transformWithState``). What the port buys at 100 TB:

- **Typed, composable state**: per-key state lives in named handles
  (``ValueState`` here; ``ListState``/``MapState``/timers for richer
  operators) instead of one monolithic GroupState tuple — new state
  fields land as NEW handles without migrating the old ones.
- **RocksDB-native**: the API targets the RocksDB state store provider
  (``session.streaming_state_configs``), so per-key state is spilled
  and changelog-checkpointed instead of resident on the JVM heap —
  the difference between 10^6 and 10^9 tracked keys per executor.
- **Initial state & schema evolution** are first-class (the old API
  has neither): a warehouse-scale deployment can bootstrap the
  operator from a batch snapshot.

The equality contract is pinned in tests/test_streaming.py (tws
output == the batch ``applyInPandas`` fold, which the classic
operator's own pin ties to applyInPandasWithState) — ENV-GATED:
transformWithState's Python state server imports ``google.protobuf``,
which pyspark declares only under the optional ``[connect]`` extra and
this environment does not ship. The operator is complete against the
public API and the pin activates when protobuf is present.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from variantcalling_spark.streaming.stateful import (
    OUTPUT_SCHEMA,
    STATE_SCHEMA,
    _fold,
)


class UserActivityProcessor(StatefulProcessor):
    """Per-user (first_us, last_us, n, max_gap_us) in a ValueState."""

    def __init__(self, ts_us_col: str = "ts_us") -> None:
        self._ts_us_col = ts_us_col

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("activity", STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple[Any, ...], rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        ts: list[int] = []
        for pdf in rows:
            ts.extend(int(v) for v in pdf[self._ts_us_col])
        ts.sort()
        prev = tuple(self._state.get()) if self._state.exists() else None
        first, last, n, max_gap = _fold(prev, ts)
        self._state.update((first, last, n, max_gap))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "first_us": [first],
                "last_us": [last],
                "n": [n],
                "max_gap_us": [max_gap],
            }
        )

    def close(self) -> None:
        pass


def user_activity_tws(df: DataFrame, ts_us_col: str = "ts_us") -> DataFrame:
    """Streaming per-user activity state on ``transformWithStateInPandas``
    (requires the RocksDB state store provider — apply
    ``session.streaming_state_configs`` before starting the query)."""
    return df.groupBy("user_id").transformWithStateInPandas(
        UserActivityProcessor(ts_us_col),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


from variantcalling_spark._serde import register_module_by_value

register_module_by_value(__name__)

"""Streaming PAGE-HINKLEY drift monitor via ``applyInPandasWithState``
(q382's streaming face, and the repo's second custom-stateful exemplar
beside ``stateful.py``): the PH recursion is path-dependent ACROSS
micro-batches — running count/sum (for the running mean), the PH
statistic m_t, and its running minimum all carry over — exactly the
shape ``foreachBatch`` cannot express without an external state store
and GroupState maintains for free.

Per batch each series folds its (time-ordered) new observations into
GroupState with the IDENTICAL recurrence the q382 kernel runs
(cum += x; mu = cum/n; m += x - mu - delta; mmin = min(mmin, m)), and
emits one updated row (series, n, ph_m, excess, alarm). After all
input is processed the state equals the batch kernel's final row —
the stream==batch pin. Exact when micro-batches arrive time-ordered
(the watermarked-stream assumption, as stateful.py notes).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PH_DELTA = 0.1
PH_LAMBDA = 10.0

STATE_SCHEMA = "n long, cum double, ph_m double, ph_min double"
OUTPUT_SCHEMA = (
    "series string, n long, ph_m double, excess double, alarm boolean"
)


def _fold(state, rows, delta: float = PH_DELTA):
    """Pure PH fold of (t-sorted) observations onto prior state —
    the q382 kernel recurrence verbatim."""
    n, cum, m, mmin = state if state is not None else (0, 0.0, 0.0, 0.0)
    for x in rows:
        n += 1
        cum = cum + x
        mu = cum / n
        m = m + (x - mu - delta)
        mmin = min(mmin, m)
    return n, cum, m, mmin


def ph_monitor_stateful(df: DataFrame, val_col: str = "m") -> DataFrame:
    """Streaming per-series Page-Hinkley state (applyInPandasWithState)."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in pdfs:
            rows.extend(zip((int(t) for t in pdf["t"]), (float(v) for v in pdf[val_col])))
        rows.sort()
        prev = state.get if state.exists else None
        n, cum, m, mmin = _fold(prev, [x for _t, x in rows])
        state.update((n, cum, m, mmin))
        yield pd.DataFrame(
            {
                "series": [key[0]],
                "n": [n],
                "ph_m": [m],
                "excess": [m - mmin],
                "alarm": [bool(m - mmin > PH_LAMBDA)],
            }
        )

    return df.groupBy("series").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ph_monitor_batch(df: DataFrame, val_col: str = "m") -> DataFrame:
    """The same fold over each series' full history in one batch pass —
    the ground truth the streaming state converges to."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t", kind="mergesort")
        n, cum, m, mmin = _fold(None, [float(v) for v in pdf[val_col]])
        return pd.DataFrame(
            {
                "series": [pdf["series"].iloc[0]],
                "n": [n],
                "ph_m": [m],
                "excess": [m - mmin],
                "alarm": [bool(m - mmin > PH_LAMBDA)],
            }
        )

    return df.groupBy("series").applyInPandas(fn, schema=OUTPUT_SCHEMA)


from variantcalling_spark._serde import register_module_by_value

register_module_by_value(__name__)

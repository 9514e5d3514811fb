"""Streaming heavy-changers monitor: q447's "what moved" readout
between CONSECUTIVE micro-batches (the r8 ROADMAP lead — the anomaly
feed a traffic/abuse pipeline alerts on while the data streams in).

Per batch: fold the arriving events to per-key counts (the monitored
key projection — here user_id % 100, the q447 domain), full-outer join
against the PREVIOUS batch's counts, rank by |delta|, append the top-k
changers to the monitoring sink, then the current counts become the
carried state.

Cross-batch state is the per-key count relation — bounded by the KEY
DOMAIN, not the stream length (production swaps exact counts for the
q228 count-min sketch when the key space is unbounded). The state's
lineage is truncated every batch with an eager ``localCheckpoint`` —
the coverage-selector lesson applied from day one: a persist-only chain
would recompute through expired micro-batch sources on eviction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOP_K = 5


def key_counts(batch: DataFrame) -> DataFrame:
    """(key, n) for one batch under the monitored key projection —
    ONE map-side-combinable aggregate; shared by the stream face and
    the q472 replay face."""
    return (
        batch.select((F.col("user_id") % 100).cast("bigint").alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def top_changers(
    cur: DataFrame, prev: DataFrame | None, k: int = TOP_K
) -> list[tuple]:
    """Top-k |delta| keys of cur-vs-prev counts as bounded driver rows
    ``(rnk, key, n_prev, n_cur, abs_change, rel_change)`` — a full-outer
    join over the bounded key domain + a TakeOrdered head. ``prev`` of
    None (the first batch) diffs against an all-zero baseline."""
    if prev is None:
        joined = cur.select(
            "key", F.lit(0).cast("bigint").alias("n_prev"), F.col("n").alias("n_cur")
        )
    else:
        joined = (
            cur.withColumnRenamed("n", "n_cur")
            .join(prev.withColumnRenamed("n", "n_prev"), "key", "full_outer")
            .select(
                "key",
                F.coalesce("n_prev", F.lit(0)).cast("bigint").alias("n_prev"),
                F.coalesce("n_cur", F.lit(0)).cast("bigint").alias("n_cur"),
            )
        )
    scored = joined.select(
        "key",
        "n_prev",
        "n_cur",
        F.abs(F.col("n_cur") - F.col("n_prev")).cast("bigint").alias("abs_change"),
        (
            F.round((F.col("n_cur") - F.col("n_prev")) / (F.col("n_prev") + 1.0), 6)
            + 0.0
        ).alias("rel_change"),
    )
    rows = (
        scored.orderBy(F.col("abs_change").desc(), "key")
        .limit(k)
        .collect()
    )
    return [
        (i + 1, int(r.key), int(r.n_prev), int(r.n_cur), int(r.abs_change),
         float(r.rel_change))
        for i, r in enumerate(rows)
    ]


class HeavyChangersMonitor:
    """Cross-batch state for ``monitor_stream``: the previous batch's
    per-key counts (bounded by the key domain) and the alert ledger."""

    def __init__(self, k: int = TOP_K):
        self.k = k
        self.prev: DataFrame | None = None
        self.alerts: list[tuple] = []

    def step(self, batch: DataFrame, batch_id: int) -> None:
        cur = key_counts(batch).localCheckpoint(eager=True)
        for row in top_changers(cur, self.prev, k=self.k):
            self.alerts.append((int(batch_id), *row))
        self.prev = cur


def monitor_stream(stream_events: DataFrame, k: int = TOP_K):
    """Attach the heavy-changers monitor to an event stream. Returns
    (StreamingQuery, HeavyChangersMonitor) — the monitor's ``alerts``
    ledger fills as micro-batches arrive with rows
    ``(batch_id, rnk, key, n_prev, n_cur, abs_change, rel_change)``."""
    state = HeavyChangersMonitor(k=k)

    def step(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        state.step(batch, batch_id)

    q = (
        stream_events.writeStream.outputMode("append")
        .foreachBatch(step)
        .start()
    )
    return q, state

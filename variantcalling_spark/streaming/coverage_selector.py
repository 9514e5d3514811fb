"""Streaming max-coverage selector: the q396 set-cover greedy run at
INGEST time over an arriving document stream (the r7 ROADMAP lead
"streaming max-coverage selector (q396 + foreachBatch)").

Production shape: a curation pipeline that must build a
vocabulary-covering eval/training subset WHILE the corpus streams in
cannot replay the offline greedy over everything seen so far at every
batch. The streaming rule here is the standard budgeted sieve: per
micro-batch, accept up to ``per_batch`` documents in greedy order, each
required to add at least ``min_gain`` NEW (uncovered) bigrams; the
covered-vocabulary state carries across batches as a persisted
DataFrame (the q122 stored-index pattern — distributed state, never a
driver-side set).

``foreachBatch`` is right for the same reason as the PSI/conformal
monitors: each batch's selection is a short driver-bounded loop of
batch plans (anti-join against covered + map-side-combinable gain count
+ TakeOrdered argmax), and the only cross-batch state is the covered
relation, which grows by selection only (bounded by the total pick
budget, NOT by stream length).

Determinism: greedy order within a batch is (gain DESC, doc_id ASC);
batch boundaries are part of the contract (the same documents split the
same way give the same picks) — the stream==batch equality pin in
tests/test_streaming.py feeds identical file-per-batch splits, and the
q422 batch face replays fixed doc_id-range chunks against an unrolled
SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, w) distinct bigram incidence — the q396 set system
    (queries/dedup.py::q396_max_coverage_selection), factored so the
    stream and batch faces derive it identically."""
    ws = docs.select("doc_id", F.split("text", " ").alias("ws")).where(
        F.size("ws") >= 2
    )
    return ws.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(ws, 1, size(ws) - 1),"
                " (x, i) -> concat(x, ' ', element_at(ws, i + 2)))"
            )
        ).alias("w"),
    ).distinct()


def select_from_batch(
    batch_inc: DataFrame,
    covered: DataFrame | None,
    per_batch: int = 2,
    min_gain: int = 1,
):
    """Budgeted greedy over ONE batch's (doc_id, w) incidence against
    the carried covered set: up to ``per_batch`` picks, each with
    marginal gain >= ``min_gain``, ties on doc_id.

    Returns (picks, covered') where picks is a list of
    (slot, doc_id, new_covered, total_covered) tuples (bounded driver
    scalars — the q396 argmax-collect pattern) and covered' is the
    updated persisted covered relation."""
    from variantcalling_spark.queries._helpers import managed_persist

    picks = []
    for slot in range(1, per_batch + 1):
        cand = (
            batch_inc
            if covered is None
            else batch_inc.join(covered, "w", "left_anti")
        )
        gains = cand.groupBy("doc_id").agg(F.count(F.lit(1)).alias("gain"))
        top = (
            gains.where(F.col("gain") >= min_gain)
            .orderBy(F.col("gain").desc(), "doc_id")
            .limit(1)
            .collect()
        )
        if not top:
            break
        sel = top[0]
        new_cov = batch_inc.where(F.col("doc_id") == sel.doc_id).select("w")
        covered = (
            new_cov if covered is None else covered.union(new_cov).distinct()
        ).transform(managed_persist)
        total = covered.count()
        picks.append((slot, int(sel.doc_id), int(sel.gain), int(total)))
    return picks, covered


class CoverageSelector:
    """Cross-batch selection state for ``select_stream``: the covered
    relation (distributed), the accepted ledger, and the budget."""

    def __init__(self, per_batch: int = 2, min_gain: int = 1):
        self.per_batch = per_batch
        self.min_gain = min_gain
        self.covered: DataFrame | None = None
        self.selected: list[tuple[int, int, int, int, int]] = []

    def step(self, batch_docs: DataFrame, batch_id: int) -> None:
        inc = doc_bigrams(batch_docs)
        picks, covered = select_from_batch(
            inc, self.covered, per_batch=self.per_batch, min_gain=self.min_gain
        )
        # Truncate the cross-batch state's lineage every batch: a
        # persist-only chain stays rooted in earlier micro-batch
        # DataFrames, so a cache eviction (memory pressure, or the
        # managed_persist ring cycling after ~24 batches) would
        # recompute through EXPIRED micro-batch sources — and the
        # union().distinct() plan deepens with every pick. An eager
        # localCheckpoint materializes covered as a fresh leaf; a
        # production deployment writes it to a catalog table instead
        # (same contract, durable storage).
        if covered is not None and picks:
            covered = covered.localCheckpoint(eager=True)
        self.covered = covered
        for slot, doc_id, gain, total in picks:
            self.selected.append((int(batch_id), slot, doc_id, gain, total))


def select_stream(
    stream_docs: DataFrame, per_batch: int = 2, min_gain: int = 1
):
    """Attach the selector to a document stream. Returns
    (StreamingQuery, CoverageSelector) — the selector's ``selected``
    ledger fills as micro-batches arrive; a production deployment
    writes it to a catalog table instead."""
    state = CoverageSelector(per_batch=per_batch, min_gain=min_gain)

    def step(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        state.step(batch, batch_id)

    q = (
        stream_docs.writeStream.outputMode("append")
        .foreachBatch(step)
        .start()
    )
    return q, state

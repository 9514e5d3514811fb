"""Streaming sample-ratio-mismatch gate: q457's per-day chi-square run
at INGEST time over an arriving event stream (the r8 ROADMAP lead
"streaming SRM monitor" — per-batch independent, so ``foreachBatch``
with NO carried state is the whole design).

Production shape: an experimentation pipeline must kill a skewed
assignment the moment it appears, not at readout time (Fabijan et al.
report SRM in ~6% of experiments). Each micro-batch folds to ONE
conditional aggregate — control/treatment counts under the designed
split — and the 1-df chi-square plus the alpha=0.05 flag is appended to
a monitoring sink. Batches are independent by construction: a mid-
experiment assignment bug shows up in ITS batch instead of being
averaged away by history (the same argument as q457's per-day grain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 1-df chi-square critical value at alpha=0.05, inlined like q457 so
# the gate is a pure expression on both engines.
CHI2_CRIT = 3.841459


def batch_srm(batch: DataFrame, ratio: float = 0.5) -> tuple:
    """One micro-batch's SRM readout as bounded driver scalars:
    ``(n_control, n_treat, chi2, flag)`` for the user_id-parity
    assignment against the designed ``ratio`` (control share). ONE
    map-side-combinable aggregate; runs as a plain batch plan so the
    stream face and the q471 replay face share it verbatim."""
    counts = batch.agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_control"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_treat"),
    )
    # chi-square computed IN the plan (F.round == SQL ROUND half-up;
    # Python's round() is banker's rounding — a cross-engine hash
    # mismatch class this repo has already paid for once)
    n = F.col("n_control") + F.col("n_treat")
    ec, et = n * ratio, n * (1.0 - ratio)
    chi2 = (
        F.pow(F.col("n_control") - ec, 2) / ec
        + F.pow(F.col("n_treat") - et, 2) / et
    )
    row = counts.select(
        "n_control",
        "n_treat",
        F.round(chi2, 6).alias("chi2"),
        F.when(chi2 > CHI2_CRIT, 1).otherwise(0).alias("flag"),
    ).collect()[0]
    nc, nt = int(row.n_control or 0), int(row.n_treat or 0)
    if nc + nt == 0:
        return 0, 0, 0.0, 0
    return nc, nt, float(row.chi2), int(row.flag)


def monitor_stream(stream_events: DataFrame, sink: list, ratio: float = 0.5):
    """Attach the SRM gate to an event stream: every non-empty
    micro-batch appends ``(batch_id, n_control, n_treat, chi2, flag)``
    to ``sink`` (a list here; production writes a monitoring table).
    Returns the started StreamingQuery."""

    def step(batch: DataFrame, batch_id: int) -> None:
        nc, nt, chi2, flag = batch_srm(batch, ratio=ratio)
        if nc + nt:
            sink.append((int(batch_id), nc, nt, chi2, flag))

    return (
        stream_events.writeStream.outputMode("append")
        .foreachBatch(step)
        .start()
    )

"""Skew-aware join helper: explicit key salting.

AQE's skew-join split (enabled in `session.py`) handles most skew at
runtime; explicit salting is the deterministic fallback for *known* hot
keys (a hyper-duplicated position, an empty-text fingerprint, a null-ish
sentinel chromosome) where the planner cannot see the skew until the
shuffle has already materialized it.

`salted_join` replicates the build side ``n_salts`` times and sprays the
probe side across salts, so one hot key spreads over ``n_salts``
reducers. The salt a probe row lands on is arbitrary BY DESIGN — every
salt of a key has the full build side for that key, so join output is
identical for any salt assignment (including under task retry).
Semantics are exactly an inner/left equi-join; correctness vs the
unsalted join is pinned in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salted keys: ``left`` (large, skewed) sprayed over
    ``n_salts`` sub-keys; ``right`` (smaller) replicated per salt.

    Shuffle keys become (on..., __salt), so a single hot key occupies
    ``n_salts`` reducers instead of one straggler.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in on], F.monotonically_increasing_id()), F.lit(n_salts))
    l_s = left.withColumn("__salt", salt.cast("int"))
    r_s = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = l_s.join(r_s, on + ["__salt"], how)
    return out.drop("__salt")

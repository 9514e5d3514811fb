"""Math scalar functions (SURVEY.md §2.8 math family).

Re-expresses `ugvc/utils/math_utils.py` (phred/unphred/safe_divide,
pinned by `test/unit/utils/test_math_utils.py:10-23`) as native Column
expressions — JVM-side, codegen'd, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def phred(p: Column) -> Column:
    """Error probability -> Phred scale: -10 * log10(p)
    (`math_utils.py:31-48`)."""
    return -10.0 * F.log10(p)


def unphred(q: Column) -> Column:
    """Phred -> probability: 10 ** (-q / 10) (`math_utils.py:66-85`)."""
    return F.pow(F.lit(10.0), -q / 10.0)


def safe_divide(numerator: Column, denominator: Column, default: float = 0.0) -> Column:
    """Division defaulting on zero denominator (`math_utils.py:9-28`)."""
    return F.when(denominator != 0, numerator / denominator).otherwise(F.lit(default))


def phred_encode(quals: Column) -> Column:
    """Pack an int-array of quals into a Phred+33 string
    (`math_utils.py:50-64`): transform to chars, concat."""
    return F.array_join(F.transform(quals, lambda q: F.char(q + 33)), "")


def phred_decode(s: Column) -> Column:
    """Unpack a Phred+33 string into an int array (`math_utils.py:87-101`)."""
    return F.transform(F.split(s, ""), lambda c: F.ascii(c) - 33)

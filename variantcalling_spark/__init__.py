"""variantcalling_spark — a PySpark-native analytics engine.

A brand-new engine providing the query / data-processing capabilities of
Ultimagen/VariantCalling (``ugvc``), re-expressed Spark-first:

- DataFrame / Spark SQL declarative plans (Catalyst optimizes: pushdown,
  pruning, join selection, AQE).
- ``ArrayType`` columns for genotype tuples (GT / PL / AD / VAF) with
  higher-order functions instead of Python tuple cells.
- Interval (range) joins via broadcast or bucketed equi-join prefilter.
- The two irreducibly sequential genomic kernels (gVCF block merge,
  overlap-buffer filter) as ``applyInPandas`` over contig-partitioned,
  position-sorted groups.
- Large-scale training-data operators (dedup, similarity search, text
  analysis, multimodal column plumbing) as first-class components.

Subpackages:
    sources    canonical table readers / catalog
    functions  scalar / array function library (phred, revcomp, text, ...)
    operators  relational + genomic + dedup/similarity operators
    pipelines  reference pipelines composed from operators
    streaming  Structured Streaming surface (events)
"""

__version__ = "0.1.0"

from variantcalling_spark.session import get_spark  # noqa: F401

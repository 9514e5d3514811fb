from variantcalling_spark.functions.math import phred, safe_divide, unphred  # noqa: F401
from variantcalling_spark.functions.dna import hmer_run_length, revcomp  # noqa: F401
